"""Benchmark decontamination for training corpora.

Standard practice before training (GPT-3 §C / PaLM / Llama data cards):
drop or flag training documents that share long token n-grams with an
evaluation/benchmark set. The benchmark side is tiny relative to the
corpus, so the scale-correct plan is the broadcast semi-join the build
brief prescribes: build the benchmark's distinct n-gram set once (a
distributed map + driver fold over the *small* side only), `ray.put` it
into the object store, and have every corpus task probe it zero-copy via
a per-actor lookup — the 100 TB side never shuffles.

The n-gram width defaults to 3 here because the synthetic docs are a few
dozen tokens; production decontamination uses 8-13-gram windows — the
plumbing is width-agnostic.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

import ray


def _doc_ngrams(text: str, n: int) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def benchmark_ngram_set(bench: "ray.data.Dataset", n: int = 3) -> frozenset[str]:
    """Distinct token n-grams of the (small) benchmark set. Each task
    emits its batch-local distinct set; the driver folds |batches| small
    sets — never the corpus."""

    def batch_ngrams(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column("text").to_pylist():
            grams |= _doc_ngrams(t, n)
        return pa.table({"ngram": pa.array(sorted(grams), pa.string())})

    out: set[str] = set()
    for b in bench.map_batches(batch_ngrams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(b.column("ngram").to_pylist())
    return frozenset(out)


class ContaminationFlagger:
    """Actor-pool `map_batches` stage: probes the broadcast benchmark
    n-gram set. The object-store ref is resolved ONCE per actor in
    __init__ (zero-copy plasma read), not per batch."""

    def __init__(self, ngram_ref, n: int = 3):
        self.ngrams: frozenset[str] = ray.get(ngram_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits = [
            len(_doc_ngrams(t, self.n) & self.ngrams)
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_contaminated": pa.array(hits, pa.int64()),
                "contaminated": pa.array(
                    [1 if h else 0 for h in hits], pa.int64()
                ),
            }
        )


def decontaminate(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    n: int = 3,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """(doc_id, n_contaminated, contaminated) for every corpus doc:
    n_contaminated = count of the doc's distinct n-grams that appear in
    the benchmark set. Filtering (`contaminated == 0`) is a downstream
    projection so the flag table stays auditable."""
    ref = ray.put(benchmark_ngram_set(bench, n))
    return corpus.map_batches(
        ContaminationFlagger,
        fn_constructor_args=(ref, n),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def benchmark_bloom(bench: "ray.data.Dataset", n: int = 3,
                    capacity: int = 1 << 20, error_rate: float = 0.001):
    """Mergeable Bloom build over the benchmark's gram hashes: every batch
    task fills a same-sized filter (word-array OR is the merge), the
    driver folds |batches| bit arrays — for a benchmark side too big to
    broadcast as exact strings (10^9 grams ≈ 30 GB of text; the bloom is
    ~180 MB at these parameters) but whose BITS still fit every worker."""
    import numpy as np

    from ..functions.hashing import hash64
    from ..state.bloom import BloomFilter

    def batch_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, error_rate)
        grams: set[str] = set()
        for t in batch.column("text").to_pylist():
            grams |= _doc_ngrams(t, n)
        if grams:
            bf.add_hashes(hash64(sorted(grams)))
        return pa.table({"bloom": pa.array([bf.words.tobytes()], pa.binary())})

    acc = BloomFilter(capacity, error_rate)
    for b in bench.map_batches(batch_bloom, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for payload in b.column("bloom").to_pylist():
            acc.words |= np.frombuffer(payload, dtype=np.uint64)
    return acc


def decontaminate_bloom(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    n: int = 3,
    num_buckets: int = 32,
    capacity: int = 1 << 20,
    error_rate: float = 0.001,
) -> "ray.data.Dataset":
    """EXACT decontamination via bloom-semijoin + bucketed verify — the
    scale path for when the benchmark gram set outgrows exact broadcast:

    1. Broadcast the benchmark's BLOOM (mergeable bit-array build above);
       corpus tasks probe their distinct grams vectorized and emit only
       bloom-POSITIVE (bucket=hash(gram)%P, gram, doc_id) candidate rows —
       the false-positive-rate-bounded trickle, not the corpus.
    2. ONE groupby(bucket) over candidates ∪ tagged benchmark grams:
       per bucket, exact set membership kills the bloom's false
       positives (verify-in-place, no Dataset.join — the dedup verify
       pattern).
    3. groupby(doc_id).sum over per-bucket hit counts, unioned with a
       zero row per doc so uncontaminated docs still appear.

    Output (doc_id, n_contaminated, contaminated) — identical semantics
    to ``decontaminate`` (same oracle), different scale regime."""
    import numpy as np
    from ..functions.hashing import hash64

    bloom = benchmark_bloom(bench, n=n, capacity=capacity, error_rate=error_rate)
    bloom_ref = ray.put(bloom.to_bytes())

    def bench_rows(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column("text").to_pylist():
            grams |= _doc_ngrams(t, n)
        gl = sorted(grams)
        h = hash64(gl) if gl else np.zeros(0, np.uint64)
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
                "gram": pa.array(gl, pa.string()),
                "doc_id": pa.array([0] * len(gl), pa.int64()),
                # explicit side flag, NOT an in-band doc_id sentinel —
                # corpus ids may legitimately be negative (review finding)
                "is_bench": pa.array([1] * len(gl), pa.int64()),
            }
        )

    class BloomProbe:
        def __init__(self, ref):
            from ..state.bloom import BloomFilter

            self.bloom = BloomFilter.from_bytes(ray.get(ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_out, g_out, d_out = [], [], []
            for did, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                gl = sorted(_doc_ngrams(t, n))
                if not gl:
                    continue
                h = hash64(gl)
                # uint64 % python-int promotes to float64 in numpy and
                # garbles the bucket — keep the modulo in uint64
                buckets = (h % np.uint64(num_buckets)).astype(np.int64)
                pos = self.bloom.contains_hashes(h)
                for g, bk, p in zip(gl, buckets, pos):
                    if p:
                        b_out.append(int(bk))
                        g_out.append(g)
                        d_out.append(did)
            return pa.table(
                {
                    "bucket": pa.array(b_out, pa.int64()),
                    "gram": pa.array(g_out, pa.string()),
                    "doc_id": pa.array(d_out, pa.int64()),
                    "is_bench": pa.array([0] * len(d_out), pa.int64()),
                }
            )

    def verify(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sorted-bench membership + bincount fold
        is_bench = g.column("is_bench").to_numpy(zero_copy_only=False) == 1
        grams = np.asarray(g.column("gram").to_pylist(), dtype=object)
        bench_g = np.unique(grams[is_bench])
        cand_g = grams[~is_bench]
        dids = g.column("doc_id").to_numpy(zero_copy_only=False)[~is_bench]
        if len(bench_g) and len(cand_g):
            loc = np.searchsorted(bench_g, cand_g)
            safe = np.minimum(loc, len(bench_g) - 1)
            hit = bench_g[safe] == cand_g
        else:
            hit = np.zeros(len(cand_g), bool)
        hit_ids = dids[hit].astype(np.int64)
        ids, counts = (
            np.unique(hit_ids, return_counts=True)
            if len(hit_ids)
            else (np.zeros(0, np.int64), np.zeros(0, np.int64))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "hits": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    bench_grams = bench.map_batches(bench_rows, batch_format="pyarrow")
    cands = corpus.map_batches(
        BloomProbe, fn_constructor_args=(bloom_ref,),
        batch_format="pyarrow", concurrency=4,
    )
    hits = bench_grams.union(cands).groupby("bucket").map_groups(
        verify, batch_format="pyarrow"
    )

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "hits": pa.array([0] * batch.num_rows, pa.int64()),
            }
        )

    zeros = corpus.map_batches(zero_rows, batch_format="pyarrow")
    agg = zeros.union(hits).groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("hits", alias_name="n_contaminated")
    )

    def finish(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_contaminated").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_contaminated": pa.array(nc, pa.int64()),
                "contaminated": pa.array((nc > 0).astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def decontaminate_fuzzy(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    tau: float = 0.8,
    shingle: int = 3,
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_offset: int = 1 << 40,
) -> "ray.data.Dataset":
    """NEAR-duplicate (fuzzy) benchmark decontamination: flag every corpus
    doc whose ``shingle``-gram Jaccard against ANY benchmark doc is ≥ tau —
    the Llama/PaLM-style "near-duplicate of an eval example" rule, the
    fuzzy complement of the verbatim-n-gram ``decontaminate``.

    EXACT (not LSH-approximate), by reusing the prefix-filtered AllPairs
    candidate generator restricted to CROSS-side pairs:

    1. Benchmark ids are lifted into a disjoint id space
       (``id + bench_offset``; corpus ids must be < bench_offset) so side
       membership is a range test — no schema change to the shared
       postings shape.
    2. Both sides enter ``ngram_postings(prefix_tau=tau)``: candidate
       pairs can only arise from prefix postings (AllPairs both-prefix
       theorem, recall exact), and per gram-bucket only corpus×bench
       pairs are emitted — never corpus² (that is the dedup operator's
       job), so hot-gram cost is |corpus_run|·|bench_run|, with the
       bench side small by construction.
    3. Candidates are exactly verified by the sketch-carrying
       ``verify_pairs`` (Jaccard ≥ tau on full gram sets).
    4. Surviving per-corpus-doc match counts (bounded by the
       contamination volume) are folded small, broadcast via ``ray.put``,
       and every corpus doc is flagged map-side — the corpus never
       shuffles whole, mirroring ``decontaminate``'s plan shape.

    Output: (doc_id, n_fuzzy_matches, fuzzy_contaminated) for EVERY
    corpus doc.
    """
    import numpy as np
    from .dedup import ngram_postings, verify_pairs

    def lift(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= bench_offset:
            raise ValueError("bench ids collide with bench_offset")
        return pa.table(
            {
                id_col: pa.array(ids + bench_offset, pa.int64()),
                text_col: batch.column(text_col),
            }
        )

    both = corpus.select_columns([id_col, text_col]).union(
        bench.select_columns([id_col, text_col]).map_batches(
            lift, batch_format="pyarrow"
        )
    )
    posted = ngram_postings(
        both, shingle=shingle, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets, prefix_tau=tau,
    )

    def cross_pairs(g: pa.Table) -> pa.Table:
        # arrow-native (r5): one sort + per-run numpy cross products
        g = g.sort_by([("gram", "ascending"), ("id", "ascending")])
        grams = np.asarray(g.column("gram").to_pylist(), dtype=object)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z})
        starts = np.flatnonzero(np.r_[True, grams[1:] != grams[:-1]])
        ends = np.r_[starts[1:], len(grams)]
        A, B = [], []
        for s, e in zip(starts, ends):
            run = ids[s:e]
            corp = run[run < bench_offset]
            ben = run[run >= bench_offset]
            if len(corp) == 0 or len(ben) == 0:
                continue
            A.append(np.repeat(corp, len(ben)))
            B.append(np.tile(ben, len(corp)))
        if not A:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z})
        return pa.table(
            {
                "a": pa.array(np.concatenate(A).astype(np.int64), pa.int64()),
                "b": pa.array(np.concatenate(B).astype(np.int64), pa.int64()),
            }
        )

    cands = (
        posted.groupby("bucket")
        .map_groups(cross_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )
    # a (corpus) < bench_offset <= b (bench): verify_pairs' a<b invariant
    # holds for every cross pair by construction
    verified = verify_pairs(
        cands, both, mode="jaccard", tau=tau, shingle=shingle,
        id_col=id_col, text_col=text_col,
    )

    counts: dict[int, int] = {}
    for t in verified.groupby("a").count().iter_batches(batch_format="pyarrow"):
        for a, n in zip(t.column("a").to_pylist(), t.column("count()").to_pylist()):
            counts[a] = int(n)
    counts_ref = ray.put(counts)

    class Flag:
        def __init__(self, ref):
            self.counts: dict[int, int] = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            n = [self.counts.get(i, 0) for i in ids]
            return pa.table(
                {
                    "doc_id": batch.column(id_col),
                    "n_fuzzy_matches": pa.array(n, pa.int64()),
                    "fuzzy_contaminated": pa.array(
                        [1 if x else 0 for x in n], pa.int64()
                    ),
                }
            )

    return corpus.map_batches(
        Flag, fn_constructor_args=(counts_ref,),
        batch_format="pyarrow", concurrency=4,
    )

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

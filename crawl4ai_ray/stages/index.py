"""Term-partitioned inverted-index storage: the text analogue of the
IVF-bucketed embedding layout (``ann.py partition_embeddings``) and the
crawl corpus's bucketed point lookup (``api.RayWebCrawler.run``).

A 100 TB corpus's postings list does not fit one machine, and a term
lookup that scans the whole postings table is wrong at any scale. The
layout writes postings PARTITIONED by ``hash(term) % P`` (one parquet
directory per partition); a lookup hashes the term, reads ONLY its
partition (with a parquet row filter on the term hash), and reports
bytes-scanned telemetry so the pruning is auditable — the same
read-pruning discipline the build brief demands of every storage layout.

Postings carry the term hash (uint64, pinned hash64 spec), not the term
string — 8 bytes/posting fixed, strings stay in the corpus. Lookups
verify by hash only (2^-64 per-term collision odds; carry strings with
``keep_terms=True`` where byte-exactness is required)."""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import hash64


def build_term_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    num_partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_terms: bool = False,
    keep_dl: bool = False,
) -> str:
    """One-time layout: (term_hash, doc_id, tf) postings partitioned by
    ``part = term_hash % num_partitions``. Sorted by partition before the
    write so each partition lands in O(1) files.

    ``keep_dl=True`` denormalizes each doc's token length onto its
    postings (the classic search-index layout: BM25's length norm then
    needs NO doc-table join at query time) and records the collection
    stats (n_docs, sum_dl) in ``_META`` for avgdl."""

    def postings(batch: pa.Table) -> pa.Table:
        h_out, d_out, tf_out, t_out, dl_out = [], [], [], [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            toks = (text or "").lower().split()
            if not toks:
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            h_out.append(hash64([str(t) for t in uniq]))
            d_out.extend([did] * len(uniq))
            tf_out.extend(counts.tolist())
            if keep_terms:
                t_out.extend([str(t) for t in uniq])
            if keep_dl:
                dl_out.extend([len(toks)] * len(uniq))
        h = np.concatenate(h_out) if h_out else np.zeros(0, np.uint64)
        cols = {
            "part": pa.array(
                (h % np.uint64(num_partitions)).astype(np.int64), pa.int64()
            ),
            "term_hash": pa.array(h, pa.uint64()),
            id_col: pa.array(d_out, pa.int64()),
            "tf": pa.array(tf_out, pa.int64()),
        }
        if keep_terms:
            cols["term"] = pa.array(t_out, pa.string())
        if keep_dl:
            cols["dl"] = pa.array(dl_out, pa.int64())
        t = pa.table(cols)
        if keep_dl:
            # one SENTINEL stat row per batch (part = -1, never a real
            # partition): (n_docs, sum_dl) ride the same tokenize pass —
            # the old separate counting aggregate re-read and re-tokenized
            # the whole corpus (review finding), doubling build cost
            texts = batch.column(text_col).to_pylist()
            dls = [len((x or "").lower().split()) for x in texts]
            stat_cols = {
                "part": pa.array([-1], pa.int64()),
                "term_hash": pa.array([0], pa.uint64()),
                id_col: pa.array([len(dls)], pa.int64()),
                "tf": pa.array([int(sum(dls))], pa.int64()),
            }
            if keep_terms:
                stat_cols["term"] = pa.array([""], pa.string())
            stat_cols["dl"] = pa.array([0], pa.int64())
            t = pa.concat_tables([t, pa.table(stat_cols)])
        return t

    os.makedirs(out_dir, exist_ok=True)
    stats = {"n_docs": 0, "sum_dl": 0}
    combined = docs.select_columns([id_col, text_col]).map_batches(
        postings, batch_format="pyarrow"
    )
    if keep_dl:
        # materialize ONE tokenize pass; the stat and write consumers then
        # read the postings, not the corpus
        combined = combined.materialize()

        def stat_rows(batch: pa.Table) -> pa.Table:
            m = pa.compute.equal(batch.column("part"), pa.scalar(-1))
            t = batch.filter(m)
            return pa.table(
                {
                    "n": t.column(id_col),
                    "s": t.column("tf"),
                }
            )

        agg = combined.map_batches(stat_rows, batch_format="pyarrow")
        stats["n_docs"] = agg.sum("n")
        stats["sum_dl"] = agg.sum("s")

    def real_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.compute.greater_equal(batch.column("part"), pa.scalar(0))
        )

    (
        combined.map_batches(real_rows, batch_format="pyarrow")
        .sort("part")
        .write_parquet(out_dir, partition_cols=["part"])
    )
    with open(os.path.join(out_dir, "_META"), "w") as f:
        f.write(f"num_partitions={num_partitions}\n")
        if keep_dl:
            f.write(f"n_docs={stats['n_docs']}\n")
            f.write(f"sum_dl={stats['sum_dl']}\n")
    return out_dir


def term_lookup(
    index_dir: str, term: str, id_col: str = "doc_id"
) -> "tuple[ray.data.Dataset, dict]":
    """Postings for one term: hashes it, reads ONLY partition
    ``hash % P`` with a parquet filter on term_hash. Returns
    (postings dataset, telemetry incl. bytes scanned vs total)."""
    with open(os.path.join(index_dir, "_META")) as f:
        num_partitions = int(f.read().strip().split("=")[1])
    h = int(hash64([term.lower()])[0])
    part = h % num_partitions
    files = sorted(_glob.glob(os.path.join(index_dir, f"part={part}", "*.parquet")))
    all_files = _glob.glob(os.path.join(index_dir, "part=*", "*.parquet"))
    telemetry = {
        "partitions_read": 1,
        "partitions_total": num_partitions,
        "bytes_scanned": sum(os.path.getsize(f) for f in files),
        "bytes_total": sum(os.path.getsize(f) for f in all_files),
    }
    import pyarrow.dataset as pds

    ds = ray.data.read_parquet(
        files, filter=pds.field("term_hash") == pa.scalar(h, pa.uint64())
    )

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch.column(id_col), "tf": batch.column("tf")}
        )

    return ds.map_batches(strip, batch_format="pyarrow"), telemetry


def build_positional_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    num_partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Positional variant of the term layout: (term_hash, doc_id,
    positions list<int32>) partitioned by ``hash(term) % P`` — what
    phrase/proximity queries need. Positions are 0-based token offsets
    under the same whitespace tokenization as build_term_index."""

    def postings(batch: pa.Table) -> pa.Table:
        h_out, d_out, p_out = [], [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            toks = (text or "").lower().split()
            if not toks:
                continue
            by_term: dict[str, list[int]] = {}
            for i, t in enumerate(toks):
                by_term.setdefault(t, []).append(i)
            terms = sorted(by_term)
            h_out.append(hash64(terms))
            d_out.extend([did] * len(terms))
            p_out.extend(by_term[t] for t in terms)
        h = np.concatenate(h_out) if h_out else np.zeros(0, np.uint64)
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int64), pa.int64()
                ),
                "term_hash": pa.array(h, pa.uint64()),
                id_col: pa.array(d_out, pa.int64()),
                "positions": pa.array(p_out, pa.list_(pa.int32())),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    (
        docs.select_columns([id_col, text_col])
        .map_batches(postings, batch_format="pyarrow")
        .sort("part")
        .write_parquet(out_dir, partition_cols=["part"])
    )
    with open(os.path.join(out_dir, "_META"), "w") as f:
        f.write(f"num_partitions={num_partitions}\n")
    return out_dir


def phrase_lookup(
    index_dir: str,
    phrase: str,
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> "tuple[ray.data.Dataset, dict]":
    """Exact phrase search over the positional layout: reads ONLY the
    phrase terms' partitions (parquet row filter on their hashes, bytes
    telemetry), then intersects position lists per doc — token k of the
    phrase must sit at first_pos + k. One bounded shuffle of the
    phrase-term postings (tiny vs the corpus); returns
    (doc_id, n_matches, first_pos) for docs containing the phrase,
    first_pos = 0-based offset of the first occurrence."""
    import pyarrow.dataset as pds

    with open(os.path.join(index_dir, "_META")) as f:
        num_partitions = int(f.read().strip().split("=")[1])
    words = phrase.lower().split()
    if not words:
        raise ValueError("empty phrase")
    hashes = [int(h) for h in hash64(words)]
    parts = sorted({h % num_partitions for h in hashes})
    files = [
        f
        for p in parts
        for f in sorted(_glob.glob(os.path.join(index_dir, f"part={p}", "*.parquet")))
    ]
    all_files = _glob.glob(os.path.join(index_dir, "part=*", "*.parquet"))
    telemetry = {
        "partitions_read": len(parts),
        "partitions_total": num_partitions,
        "bytes_scanned": sum(os.path.getsize(f) for f in files),
        "bytes_total": sum(os.path.getsize(f) for f in all_files),
    }
    hset = pa.array(np.array(hashes, np.uint64), pa.uint64())
    ds = ray.data.read_parquet(
        files, filter=pds.field("term_hash").isin(hset)
    )
    # k-th phrase slot per hash (a repeated word occupies several slots)
    slots: dict[int, list[int]] = {}
    for k, h in enumerate(hashes):
        slots.setdefault(h, []).append(k)
    slots_ref = ray.put(slots)
    n_words = len(words)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (ids.astype(np.uint64) % np.uint64(num_buckets)).astype(
                        np.int64
                    )
                ),
                id_col: batch.column(id_col),
                "term_hash": batch.column("term_hash"),
                "positions": batch.column("positions"),
            }
        )

    def intersect(g: pa.Table) -> pa.Table:
        # arrow-in (r5): doc runs over a sorted view; the per-doc slot
        # intersection stays a (tiny) set fold — it is the kernel
        sl = ray.get(slots_ref)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        ths = g.column("term_hash").to_pylist()
        poss = g.column("positions").to_pylist()
        order = np.argsort(ids, kind="stable")
        out_d, out_n, out_f = [], [], []
        i = 0
        while i < len(order):
            j = i
            did = ids[order[i]]
            anchor: "set[int] | None" = None
            seen_slots = 0
            while j < len(order) and ids[order[j]] == did:
                r = order[j]
                for k in sl[int(ths[r])]:
                    cand = {int(p) - k for p in poss[r]}
                    anchor = cand if anchor is None else (anchor & cand)
                    seen_slots += 1
                j += 1
            i = j
            if seen_slots < n_words or not anchor:
                continue
            out_d.append(int(did))
            out_n.append(len(anchor))
            out_f.append(min(anchor))
        return pa.table(
            {
                id_col: pa.array(out_d, pa.int64()),
                "n_matches": pa.array(out_n, pa.int64()),
                "first_pos": pa.array(out_f, pa.int64()),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(intersect, batch_format="pyarrow")
    )
    return out, telemetry


def trigrams_of(literal: str) -> "list[str]":
    """Distinct character trigrams of a literal string (pg_trgm-style,
    no padding), sorted for determinism."""
    s = literal.lower()
    return sorted({s[i : i + 3] for i in range(len(s) - 2)})


def build_trigram_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    num_partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Trigram layout for regex/substring search at scale (the pg_trgm
    trick): (tri_hash, doc_id) postings over each doc's DISTINCT
    lowercase character trigrams, partitioned by hash % P. The index is
    large relative to text (that's inherent to trigram indexes); what
    it buys is that a regex with any literal run ≥ 3 chars prunes to
    the docs containing ALL the literal's trigrams before a single
    regex executes."""

    def postings(batch: pa.Table) -> pa.Table:
        h_out, d_out = [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            tris = trigrams_of(text or "")
            if not tris:
                continue
            h_out.append(hash64(tris))
            d_out.extend([did] * len(tris))
        h = np.concatenate(h_out) if h_out else np.zeros(0, np.uint64)
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(num_partitions)).astype(np.int64), pa.int64()
                ),
                "tri_hash": pa.array(h, pa.uint64()),
                id_col: pa.array(d_out, pa.int64()),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    (
        docs.select_columns([id_col, text_col])
        .map_batches(postings, batch_format="pyarrow")
        .sort("part")
        .write_parquet(out_dir, partition_cols=["part"])
    )
    with open(os.path.join(out_dir, "_META"), "w") as f:
        f.write(f"num_partitions={num_partitions}\n")
    return out_dir


def regex_search_trigram(
    index_dir: str,
    sf_docs_path: str,
    pattern: str,
    literals: "list[str]",
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> "tuple[ray.data.Dataset, dict]":
    """Regex search with trigram pruning: candidate docs = those whose
    trigram postings contain ALL trigrams of every literal run the
    caller names (a SUPERSET of true matches — any text matching the
    regex contains its literal runs verbatim), then the real regex runs
    ONLY on candidates, point-read from the doc store with a parquet
    row filter on id. Exact: prune is superset, verify is the regex
    itself. Returns ((doc_id, n_matches) for matching docs, telemetry
    with index bytes read and candidate counts)."""
    import re as _re

    import pyarrow.dataset as pds

    with open(os.path.join(index_dir, "_META")) as f:
        num_partitions = int(f.read().strip().split("=")[1])
    tris = sorted({t for lit in literals for t in trigrams_of(lit)})
    if not tris:
        raise ValueError("literals must yield at least one trigram")
    hashes = [int(h) for h in hash64(tris)]
    parts = sorted({h % num_partitions for h in hashes})
    files = [
        f
        for p in parts
        for f in sorted(_glob.glob(os.path.join(index_dir, f"part={p}", "*.parquet")))
    ]
    all_files = _glob.glob(os.path.join(index_dir, "part=*", "*.parquet"))
    telemetry = {
        "trigrams": len(tris),
        "partitions_read": len(parts),
        "partitions_total": num_partitions,
        "bytes_scanned": sum(os.path.getsize(f) for f in files),
        "bytes_total": sum(os.path.getsize(f) for f in all_files),
    }
    hset = pa.array(np.array(hashes, np.uint64), pa.uint64())
    post = ray.data.read_parquet(files, filter=pds.field("tri_hash").isin(hset))
    n_tris = len(tris)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (ids.astype(np.uint64) % np.uint64(num_buckets)).astype(
                        np.int64
                    )
                ),
                id_col: batch.column(id_col),
            }
        )

    def all_present(g: pa.Table) -> pa.Table:
        # arrow-native (r5): np.unique count fold
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, counts = np.unique(ids, return_counts=True)
        return pa.table(
            {id_col: pa.array(uniq[counts == n_tris], pa.int64())}
        )

    cand = (
        post.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(all_present, batch_format="pyarrow")
        .take_all()
    )
    cand_ids = sorted(int(r[id_col]) for r in cand)
    telemetry["candidates"] = len(cand_ids)
    if not cand_ids:
        return (
            ray.data.from_arrow(
                pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "n_matches": pa.array([], pa.int64()),
                    }
                )
            ),
            telemetry,
        )
    docs = ray.data.read_parquet(
        sf_docs_path,
        filter=pds.field(id_col).isin(pa.array(cand_ids, pa.int64())),
    )
    rx = _re.compile(pattern)

    def verify(batch: pa.Table) -> pa.Table:
        ids_out, n_out = [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column("text").to_pylist()
        ):
            n = len(rx.findall((text or "").lower()))
            if n:
                ids_out.append(did)
                n_out.append(n)
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "n_matches": pa.array(n_out, pa.int64()),
            }
        )

    return docs.map_batches(verify, batch_format="pyarrow"), telemetry


def bm25_lookup(
    index_dir: str,
    terms: "list[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> "tuple[ray.data.Dataset, dict]":
    """BM25 top-k over the persisted term index — the search-engine
    query path: reads ONLY the query terms' partitions (bytes
    telemetry), df per term = that term's postings count, dl rides the
    postings (keep_dl layout), avgdl/N from ``_META``. The per-doc
    score is the IDENTICAL float expression the full-scan
    `_bm25_scored` evaluates, term contributions accumulated in query
    order with absent terms contributing exactly 0.0 — so the indexed
    top-k equals the scan top-k whenever ≥k docs score positive (docs
    containing no query term never enter the index path; they score
    0.0 in the scan and lose anyway). Robertson idf (+1 inside the
    log) keeps every present-term contribution positive."""
    import math

    import pyarrow.dataset as pds

    meta: dict[str, int] = {}
    with open(os.path.join(index_dir, "_META")) as f:
        for line in f:
            kk, _, v = line.strip().partition("=")
            meta[kk] = int(v)
    if "n_docs" not in meta:
        raise ValueError("bm25_lookup needs a keep_dl index (stats in _META)")
    num_partitions = meta["num_partitions"]
    n_docs, sum_dl = meta["n_docs"], meta["sum_dl"]
    avgdl = float(sum_dl) / float(n_docs)

    raw_terms = [t.lower() for t in terms]
    # unique terms with multiplicity: a repeated query term contributes its
    # slot expression once PER OCCURRENCE in the scan path, accumulated in
    # original slot order below (review finding: the old hash->slot dict
    # silently collapsed duplicates to one contribution)
    qterms = sorted(set(raw_terms), key=raw_terms.index)
    hashes = [int(h) for h in hash64(qterms)]
    parts = sorted({h % num_partitions for h in hashes})
    files = [
        f
        for p in parts
        for f in sorted(_glob.glob(os.path.join(index_dir, f"part={p}", "*.parquet")))
    ]
    all_files = _glob.glob(os.path.join(index_dir, "part=*", "*.parquet"))
    telemetry = {
        "partitions_read": len(parts),
        "partitions_total": num_partitions,
        "bytes_scanned": sum(os.path.getsize(f) for f in files),
        "bytes_total": sum(os.path.getsize(f) for f in all_files),
    }
    hset = pa.array(np.array(hashes, np.uint64), pa.uint64())
    post = ray.data.read_parquet(
        files, filter=pds.field("term_hash").isin(hset)
    ).materialize()  # consumed by the df aggregate AND the scoring pass

    if post.count() == 0:
        # none of the query terms exist in the index: the scan path scores
        # every doc 0.0, so the top-k is empty (review finding: the df
        # aggregate over an empty dataset returned None and crashed)
        empty = ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
        return empty, telemetry

    # df per term from the pruned postings (exact: one row per (term, doc))
    def df_part(batch: pa.Table) -> pa.Table:
        th = batch.column("term_hash").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                f"df{i}": pa.array(
                    [int((th == np.uint64(h)).sum())], pa.int64()
                )
                for i, h in enumerate(hashes)
            }
        )

    df_row = post.map_batches(df_part, batch_format="pyarrow").aggregate(
        *[
            ray.data.aggregate.Sum(f"df{i}", alias_name=f"df{i}")
            for i in range(len(hashes))
        ]
    )
    dfs = [int(df_row[f"df{i}"]) for i in range(len(hashes))]
    # libm log — same last-ulp discipline as the scan path
    idfs = [math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]
    slot_of = {h: i for i, h in enumerate(hashes)}
    slots_ref = ray.put(slot_of)
    idfs_ref = ray.put(idfs)

    def tag(batch: pa.Table) -> pa.Table:
        sl = ray.get(slots_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        th = batch.column("term_hash").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (ids.astype(np.uint64) % np.uint64(num_buckets)).astype(
                        np.int64
                    )
                ),
                id_col: batch.column(id_col),
                "slot": pa.array(
                    np.fromiter((sl[int(x)] for x in th), np.int64, len(th)),
                    pa.int64(),
                ),
                "tf": batch.column("tf"),
                "dl": batch.column("dl"),
            }
        )

    n_terms = len(qterms)
    uniq_index = {t: i for i, t in enumerate(qterms)}
    term_order = [uniq_index[t] for t in raw_terms]

    def score_bucket(g: pa.Table) -> pa.Table:
        # arrow-native scatter pivot (r5): (id, slot) unique by
        # construction, so a 2-D scatter replaces pivot_table
        idf = ray.get(idfs_ref)
        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        slots = g.column("slot").to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = g.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dls = g.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        uids, inv = np.unique(ids, return_inverse=True)
        piv = np.zeros((len(uids), n_terms), np.float64)
        piv[inv, slots] = tfs
        dl = np.zeros(len(uids), np.float64)
        dl[inv] = dls  # every row of a doc carries the same dl
        s = np.zeros(len(uids), np.float64)
        for ui in term_order:  # original slot order incl. duplicates
            tf = piv[:, ui]
            s += idf[ui] * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
        return pa.table(
            {
                id_col: pa.array(uids, pa.int64()),
                "score": pa.array(np.round(s, 8), pa.float64()),
            }
        )

    scored = (
        post.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score_bucket, batch_format="pyarrow")
    )
    out = scored.sort(["score", id_col], descending=[True, False]).limit(k)
    return out, telemetry


def merge_term_indexes(
    index_dirs: "list[str]",
    out_dir: str,
    delete_ids: "set[int] | None" = None,
    id_col: str = "doc_id",
) -> str:
    """Index compaction — the incremental-indexing lifecycle step: a
    crawl produces per-segment indexes; compaction unions their
    postings, applies tombstone DELETES (recrawled/retracted docs), and
    rewrites one partitioned layout with merged collection stats.
    Inputs must share num_partitions (the partition function is the
    identity being preserved; asserted). Stats: Σ input (n_docs,
    sum_dl) minus the (1, dl) of each deleted doc as evidenced by its
    postings — a doc with NO postings (empty text) cannot be deleted
    through the index (documented contract; its n_docs contribution
    would be unobservable here).

    The defining property (test- and oracle-pinned): BM25 over the
    compacted index ≡ BM25 over a fresh index of the surviving docs."""
    import pyarrow.dataset as pds  # noqa: F401  (parity with siblings)

    metas = []
    for d in index_dirs:
        meta: dict[str, int] = {}
        with open(os.path.join(d, "_META")) as f:
            for line in f:
                k, _, v = line.strip().partition("=")
                meta[k] = int(v)
        if "n_docs" not in meta:
            raise ValueError(f"{d}: merge needs keep_dl indexes (stats in _META)")
        metas.append(meta)
    P = metas[0]["num_partitions"]
    if any(m["num_partitions"] != P for m in metas):
        raise ValueError("all inputs must share num_partitions")
    n_docs = sum(m["n_docs"] for m in metas)
    sum_dl = sum(m["sum_dl"] for m in metas)

    dele = frozenset(int(x) for x in (delete_ids or ()))
    del_ref = ray.put(dele)

    all_files = [
        f
        for d in index_dirs
        for f in _glob.glob(os.path.join(d, "part=*", "*.parquet"))
    ]
    post = ray.data.read_parquet(all_files)

    # PRECONDITION (review finding): segments must be doc-disjoint — a
    # recrawled doc indexed in two segments would double-count in n_docs,
    # duplicate its postings, and skew avgdl/idf, silently breaking the
    # merged ≡ fresh-build property. Validated on the observable part:
    # the union's distinct doc count must equal the sum of per-segment
    # distinct counts (one tiny aggregate per segment over data the
    # compaction reads anyway). Recrawl updates must tombstone the old
    # doc in its own segment FIRST.
    def _distinct_docs(files):
        ds_ = ray.data.read_parquet(files)
        if ds_.count() == 0:
            return 0
        return ds_.groupby(id_col).count().count()

    per_seg = [
        _distinct_docs(_glob.glob(os.path.join(d, "part=*", "*.parquet")))
        for d in index_dirs
    ]
    union_distinct = _distinct_docs(all_files)
    if union_distinct != sum(per_seg):
        raise ValueError(
            f"segments overlap on {sum(per_seg) - union_distinct} doc_id(s); "
            "merge_term_indexes requires doc-disjoint segments — tombstone "
            "the superseded doc in its own segment before compacting"
        )

    # deleted docs' (1, dl) contributions, observed from their postings:
    # each deleted doc contributes its dl ONCE (any of its postings rows
    # carries it) — emit per-batch partial (doc, dl) distinct, then one
    # tiny distinct aggregate
    if dele:
        def del_rows(batch: pa.Table) -> pa.Table:
            ds_ = ray.get(del_ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            mask = np.fromiter((int(i) in ds_ for i in ids), bool, len(ids))
            t = batch.filter(pa.array(mask))
            import polars as pl

            u = (
                pl.from_arrow(t.select([id_col, "dl"]))
                .unique(subset=[id_col])
                .to_arrow()
            )
            return u.cast(
                pa.schema([(id_col, pa.int64()), ("dl", pa.int64())])
            )

        removed = (
            post.map_batches(del_rows, batch_format="pyarrow")
            .groupby(id_col)
            .min("dl")
            .take_all()
        )
        n_docs -= len(removed)
        sum_dl -= sum(int(r["min(dl)"]) for r in removed)

    def keep(batch: pa.Table) -> pa.Table:
        ds_ = ray.get(del_ref)
        if not ds_:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) not in ds_ for i in ids), bool, len(ids))
        return batch.filter(pa.array(mask))

    os.makedirs(out_dir, exist_ok=True)
    # hive partition column comes back from the path on read; re-derive
    # part from term_hash so the writer has it as a real column
    def repart(batch: pa.Table) -> pa.Table:
        h = batch.column("term_hash").to_numpy(zero_copy_only=False)
        cols = {c: batch.column(c) for c in batch.column_names if c != "part"}
        cols["part"] = pa.array(
            (h % np.uint64(P)).astype(np.int64), pa.int64()
        )
        return pa.table(cols)

    (
        post.map_batches(keep, batch_format="pyarrow")
        .map_batches(repart, batch_format="pyarrow")
        .sort("part")
        .write_parquet(out_dir, partition_cols=["part"])
    )
    with open(os.path.join(out_dir, "_META"), "w") as f:
        f.write(f"num_partitions={P}\n")
        f.write(f"n_docs={n_docs}\n")
        f.write(f"sum_dl={sum_dl}\n")
    return out_dir

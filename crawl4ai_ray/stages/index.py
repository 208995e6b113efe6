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
) -> str:
    """One-time layout: (term_hash, doc_id, tf) postings partitioned by
    ``part = term_hash % num_partitions``. Sorted by partition before the
    write so each partition lands in O(1) files."""

    def postings(batch: pa.Table) -> pa.Table:
        h_out, d_out, tf_out, t_out = [], [], [], []
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
        return pa.table(cols)

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

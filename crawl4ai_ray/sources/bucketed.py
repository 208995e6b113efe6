"""Hash-bucketed corpus layout — the frontier-scale fetch-join path.

The default fetch (stages/frontier.FetchFromCorpus) broadcasts the wave's
frontier as a dict and scans the whole corpus per wave. That is right when
waves are budget-bounded (≤ ~1e6 urls) and the corpus scan is cheap; at a
10^10-URL frontier the corpus must be laid out ONCE by hash(url) so each
wave only reads the buckets its frontier touches:

    partition_corpus(pages, out_dir, P)     # one-time shuffle-by-hash
    fetch_bucketed(out_dir, frontier_urls)  # reads only hit buckets, and
                                            # filters rows vectorized

Bucket pruning composes with Parquet row-group pruning; a frontier that
touches b of P buckets costs b/P of the scan. The same layout serves every
wave of every crawl over the corpus (amortized once).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import hash64


def bucket_of(urls, num_buckets: int) -> np.ndarray:
    return (hash64(list(urls)) % np.uint64(num_buckets)).astype(np.int64)


def partition_corpus(
    pages: "ray.data.Dataset", out_dir: str, num_buckets: int = 64
) -> str:
    """One-time hash(url) partitioning of the corpus into bucket=NN/ dirs
    (the only all-to-all this corpus ever needs)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column("url").to_pylist(), num_buckets)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    pages.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, "_BUCKETS"), "w") as f:
        f.write(str(num_buckets))
    return out_dir


def fetch_bucketed(
    corpus_dir: str, frontier: dict[str, tuple]
) -> "ray.data.Dataset":
    """frontier ⋉ bucketed corpus: read only the buckets the frontier
    hashes into, then filter + annotate rows (same output schema as
    FetchFromCorpus)."""
    with open(os.path.join(corpus_dir, "_BUCKETS")) as f:
        num_buckets = int(f.read())
    urls = list(frontier)
    hit = sorted(set(bucket_of(urls, num_buckets).tolist()))
    import glob as _glob

    files = [
        f
        for b in hit
        for f in sorted(
            _glob.glob(os.path.join(corpus_dir, f"bucket={b}", "*.parquet"))
        )
    ]
    if not files:
        empty = pa.schema(
            [
                ("url", pa.string()),
                ("html", pa.binary()),
                ("depth", pa.int32()),
                ("parent_url", pa.string()),
                ("score", pa.float64()),
            ]
        ).empty_table()
        return ray.data.from_arrow(empty)
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    fref = ray.put(frontier)

    class Filter:
        def __init__(self):
            self.frontier = ray.get(fref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            keep = [i for i, u in enumerate(urls) if u in self.frontier]
            sub = batch.take(pa.array(keep, pa.int64()))
            meta = [self.frontier[urls[i]] for i in keep]
            return (
                sub.append_column(
                    "depth", pa.array([m[0] for m in meta], pa.int32())
                )
                .append_column(
                    "parent_url", pa.array([m[1] for m in meta], pa.string())
                )
                .append_column(
                    "score", pa.array([m[2] for m in meta], pa.float64())
                )
            )

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))

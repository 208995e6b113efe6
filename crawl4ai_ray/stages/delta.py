"""Crawl snapshot delta — the diff step of an incremental recrawl pipeline.

Given two crawl snapshots (url/id, content_hash) — the previous run and the
current one — classify every url:

    new        only in the current snapshot
    gone       only in the previous snapshot
    changed    in both, content hash differs
    unchanged  in both, content hash equal

This feeds recrawl scheduling (`recrawl_priority`), sink compaction
(`snapshot_latest`) and incremental downstream refresh (only `new|changed`
re-enter extraction/dedup).

Shape: a full-outer-join on the id. Implemented as ONE bucketed shuffle —
both sides tagged and unioned, grouped by hash(id)%P (P scheduling units,
not |urls| groups), and classified with a vectorized pandas merge inside
each bucket. Only (id, 16-byte hash, side) rows move; page bodies never
enter the shuffle. Partitioning assumption: one bucket's rows (~2·|urls|/P)
fit in a worker heap — size P to the snapshot, as everywhere else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_MULT = np.uint64(0x9E3779B97F4A7C15)


def snapshot_delta(
    prev: "ray.data.Dataset",
    curr: "ray.data.Dataset",
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """→ (id_col, status) for the union of both snapshots' ids.
    Each side must hold at most one row per id (a snapshot; enforce with
    `snapshot_latest`-style compaction upstream if needed — duplicated ids
    raise inside the bucket rather than silently mis-classifying)."""
    import pandas as pd

    P = np.uint64(num_buckets)

    def tag(side: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = (ids.view(np.uint64) * _MULT % P).astype(np.int64)
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "h": batch.column(hash_col).cast(pa.string()),
                    "is_curr": pa.array(np.full(len(ids), side), pa.bool_()),
                    "b": pa.array(b, pa.int64()),
                }
            )

        return fn

    both = prev.select_columns([id_col, hash_col]).map_batches(
        tag(False), batch_format="pyarrow"
    ).union(
        curr.select_columns([id_col, hash_col]).map_batches(
            tag(True), batch_format="pyarrow"
        )
    )

    def classify(g: pd.DataFrame) -> pa.Table:
        a = g[~g["is_curr"]]
        bside = g[g["is_curr"]]
        if a[id_col].duplicated().any() or bside[id_col].duplicated().any():
            raise ValueError("snapshot_delta: a side has duplicate ids — not a snapshot")
        m = a[[id_col, "h"]].merge(
            bside[[id_col, "h"]], on=id_col, how="outer",
            suffixes=("_prev", "_curr"), indicator=True,
        )
        status = np.where(
            m["_merge"] == "left_only",
            "gone",
            np.where(
                m["_merge"] == "right_only",
                "new",
                np.where(m["h_prev"] == m["h_curr"], "unchanged", "changed"),
            ),
        )
        return pa.table(
            {
                id_col: pa.array(m[id_col].to_numpy().astype(np.int64), pa.int64()),
                "status": pa.array(status, pa.string()),
            }
        )

    return both.groupby("b").map_groups(classify, batch_format="pandas")

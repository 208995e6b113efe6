"""Shuffle-lean aggregation helpers.

``partial_count`` implements the pre-aggregate-before-groupby pattern the
100 TB design relies on (and the north rule's salted-host guidance): each
block collapses to (key, partial_count) rows inside ``map_batches`` —
vectorized, zero extra shuffle — so the following ``groupby(key).sum``
exchanges at most (distinct keys × blocks) tiny rows instead of every
input row. For skewed keys (one host owning ~16% of the corpus, as in the
synthetic heavy-hitter) the map-side combine IS the salt: the hot key's
rows never concentrate on one reducer as raw rows, only as per-block
partials.
"""

from __future__ import annotations

import pyarrow as pa

import ray


def partial_count(
    ds: "ray.data.Dataset", key: str, out_col: str = "n"
) -> "ray.data.Dataset":
    """groupby(key).count() with a map-side combine."""

    def combine(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([key]))
        out = df.group_by(key).len(name=out_col)
        return out.to_arrow().cast(
            pa.schema([(key, batch.schema.field(key).type), (out_col, pa.uint32())])
        )

    partials = ds.map_batches(combine, batch_format="pyarrow")
    out = partials.groupby(key).sum(out_col)
    return out.map_batches(
        lambda b: pa.table(
            {
                key: b.column(key),
                out_col: b.column(f"sum({out_col})").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def grouped_topk(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    k: int = 3,
    extra_cols: tuple = (),
    tie_col: str | None = None,
    num_buckets: int = 32,
    rank_col: str = "rank",
) -> "ray.data.Dataset":
    """Top-k rows per group by ``value`` DESC — the window-function
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY value DESC)`` <= k that
    Ray Data has no native operator for.

    Two-level, shuffle-lean:

    1. map-side partial top-k: each batch keeps at most k rows per key it
       contains (vectorized polars head-k) — rows beyond k can never make
       the global top-k, so the shuffle carries ≤ k·|keys-per-batch| rows.
    2. ONE groupby on ``hash(key) % num_buckets`` (never one scheduling
       unit per key), then a per-bucket exact top-k with ranks.

    Ties break on ``tie_col`` ASC (required for deterministic output —
    defaults to the first extra col). Output columns:
    (key, *extra_cols, value, rank).
    """
    import numpy as np
    import polars as pl

    tie = tie_col or (extra_cols[0] if extra_cols else None)
    if tie is None:
        raise ValueError("grouped_topk needs tie_col or extra_cols for determinism")
    cols = [key, *extra_cols, value]

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(cols))
        out = (
            df.sort([value, tie], descending=[True, False])
            .group_by(key, maintain_order=True)
            .head(k)
        )
        tbl = out.to_arrow()
        keyvals = tbl.column(key).to_numpy(zero_copy_only=False)
        bucket = (keyvals.astype(np.uint64) % num_buckets).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket))

    def per_bucket(g):
        import pandas as pd

        g = g.sort_values([key, value, tie], ascending=[True, False, True],
                          kind="mergesort")
        ranks = g.groupby(key, sort=False).cumcount() + 1
        g = g.assign(**{rank_col: ranks})
        g = g[g[rank_col] <= k]
        return g[cols + [rank_col]].reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def partial_sum(
    ds: "ray.data.Dataset", key: str, value: str, out_col: str = "total"
) -> "ray.data.Dataset":
    """groupby(key).sum(value) with a map-side combine."""

    def combine(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([key, value]))
        out = df.group_by(key).agg(pl.col(value).sum().alias(out_col))
        return out.to_arrow()

    partials = ds.map_batches(combine, batch_format="pyarrow")
    out = partials.groupby(key).sum(out_col)
    return out.map_batches(
        lambda b: pa.table(
            {key: b.column(key), out_col: b.column(f"sum({out_col})")}
        ),
        batch_format="pyarrow",
    )


def exact_percentiles(
    ds: "ray.data.Dataset",
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> "pa.Table":
    """Exact discrete percentiles (percentile_disc semantics: the value at
    1-indexed rank ceil(p·N) of the sorted column) of an integer-valued
    column, without a distributed sort: map-side value counts → ONE
    groupby on the value → the driver folds only the HISTOGRAM, whose
    size is the number of distinct values — bounded for the counters this
    is meant for (token/char counts, status codes, depths), not a
    general-purpose quantile of unbounded doubles. A 100 TB corpus with a
    vocabulary of 10^5 distinct lengths folds 10^5 rows on the driver.
    Returns a small in-memory Arrow table (pct, value)."""
    import numpy as np

    def combine(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([value_col]))
        out = df.group_by(value_col).len().rename({"len": "n"})
        return out.with_columns(pl.col("n").cast(pl.Int64)).to_arrow()

    hist_ds = ds.map_batches(combine, batch_format="pyarrow").groupby(value_col).sum("n")
    vals, counts = [], []
    for b in hist_ds.iter_batches(batch_format="pyarrow"):
        vals.extend(b.column(value_col).to_pylist())
        counts.extend(b.column("sum(n)").to_pylist())
    order = np.argsort(np.asarray(vals))
    v = np.asarray(vals)[order]
    c = np.asarray(counts)[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in percentiles:
        rank = max(1, int(np.ceil(p * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_p.append(float(p))
        out_v.append(int(v[idx]))
    return pa.table(
        {"pct": pa.array(out_p, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )

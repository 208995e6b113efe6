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

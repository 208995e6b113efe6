"""Distributed global ranking (sort + zipWithIndex) over an arbitrary
string key — the TeraSort composition, packaged as a reusable stage.

Ray Data's ``sort`` orders blocks but exposes no global row index, and a
driver-side ``take_all`` would materialize the corpus. The classic fix:

1. **Boundary sample** (map-only + tiny driver sort): a deterministic
   1-in-``sample_rate`` subset of keys (selected by ``id % sample_rate``,
   never an RNG) is collected, sorted on the driver, and ``num_buckets-1``
   quantile boundaries are broadcast.
2. **Range bucketing** (map-only): every row lands in the bucket whose
   key range contains it (``np.searchsorted`` against the broadcast
   boundaries). Bucket order == key order across buckets by construction.
3. **Two-level scan**: per-bucket counts → driver prefix fold (one row
   per bucket — bounded, tiny) → per-bucket local sort rebased on the
   bucket's global offset. Output rows carry ``rank`` (0-based, dense,
   the exact ``row_number() OVER (ORDER BY key, id) - 1``).

Determinism: the rank is a pure function of the data (ties broken by
``id``), independent of the sampled boundaries — boundaries only steer
the partitioning, never the order. Skewed key ranges cost balance, not
correctness.

Partitioning assumption: one bucket's rows fit in a worker's heap — size
``num_buckets`` to the data (the sample is cheap; at north-star scale use
num_buckets ≈ total_rows / 1e6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def ranked_by_key(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    num_buckets: int = 16,
    sample_rate: int = 17,
) -> "ray.data.Dataset":
    """→ the input rows + an int64 ``rank`` column: the row's 0-based
    position under the total order (key_col ASC, id_col ASC).

    Carries every input column through (the per-bucket pass reorders rows,
    nothing else)."""

    # --- stage 1: deterministic boundary sample -------------------------
    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids % sample_rate) == 0
        keys = batch.column(key_col).to_pylist()
        return pa.table(
            {"k": pa.array([k for k, m in zip(keys, keep) if m], pa.string())}
        )

    sampled = sorted(
        r["k"]
        for r in ds.map_batches(sample, batch_format="pyarrow").take_all()
    )
    if sampled and num_buckets > 1:
        idx = [
            (i * len(sampled)) // num_buckets for i in range(1, num_buckets)
        ]
        boundaries = sorted({sampled[i] for i in idx})
    else:
        boundaries = []
    bref = ray.put(np.array(boundaries, dtype=object))

    def bucketize(batch: pa.Table) -> pa.Table:
        bnd = ray.get(bref)
        keys = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        if len(bnd):
            b = np.searchsorted(bnd, keys, side="right").astype(np.int64)
        else:
            b = np.zeros(len(keys), np.int64)
        return batch.append_column("_rb", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    # --- stage 2: per-bucket counts → driver prefix fold ----------------
    totals = (
        bucketed.groupby("_rb")
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    totals.sort(key=lambda r: r["_rb"])
    bases: dict[int, int] = {}
    acc = 0
    for row in totals:
        bases[int(row["_rb"])] = acc
        acc += int(row["n"])
    bases_ref = ray.put(bases)

    # --- stage 3: per-bucket local sort + rebase (arrow-native, r5) -----
    def per_bucket(g: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)[int(g.column("_rb")[0].as_py())]
        g = g.sort_by(
            [(key_col, "ascending"), (id_col, "ascending")]
        ).drop_columns(["_rb"])
        return g.append_column(
            "rank",
            pa.array(base + np.arange(g.num_rows, dtype=np.int64), pa.int64()),
        )

    return bucketed.groupby("_rb").map_groups(per_bucket, batch_format="pyarrow")


def windowed_pairs(
    ranked: "ray.data.Dataset",
    window: int,
    id_col: str,
    carry_cols: list[str] | None = None,
    chunk: int = 1024,
) -> "ray.data.Dataset":
    """All pairs (a, b) with ``0 < rank_b - rank_a <= window`` over the
    output of :func:`ranked_by_key` — the sorted-neighborhood join,
    WITHOUT a self-join: each row is replicated into the (at most one)
    neighboring rank chunk its window reaches into, then one
    groupby(chunk) emits the in-window pairs vectorized.

    Output: (a, b, rank_dist) + ``<col>_a`` / ``<col>_b`` for each carry
    column. ``window`` must be < ``chunk``."""
    assert window < chunk
    carry = list(carry_cols or [])

    def replicate(batch: pa.Table) -> pa.Table:
        rank = batch.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
        cid = batch.column(id_col)
        cols = {
            "rank": rank,
            "id": cid.to_numpy(zero_copy_only=False).astype(np.int64),
        }
        carried = {c: np.asarray(batch.column(c).to_pylist(), dtype=object) for c in carry}
        home = rank // chunk
        spill = (rank % chunk) >= (chunk - window)  # window reaches next chunk
        out_ck = np.concatenate([home, home[spill] + 1])
        sel = np.concatenate([np.arange(len(rank)), np.nonzero(spill)[0]])
        tbl = {
            "_ck": pa.array(out_ck, pa.int64()),
            "rank": pa.array(cols["rank"][sel], pa.int64()),
            "id": pa.array(cols["id"][sel], pa.int64()),
        }
        for c in carry:
            tbl[c] = pa.array(list(carried[c][sel]))
        return pa.table(tbl)

    def pairs(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sort + index arithmetic + zero-copy take
        ck = int(g.column("_ck")[0].as_py())
        g = g.sort_by("rank")
        rank = g.column("rank").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        # ranks are globally dense (0..n-1) and the replication carries
        # every rank in [chunk_lo - window, chunk_hi], so within this
        # group rank[i] = rank[0] + i — pairs at offset d are pure index
        # arithmetic, no lookup structure
        lo = ck * chunk
        anchors = np.nonzero(rank >= lo)[0]  # a pair belongs to b's chunk
        a_parts, b_parts = [], []
        for d in range(1, window + 1):
            ok = anchors - d >= 0
            b_parts.append(anchors[ok])
            a_parts.append(anchors[ok] - d)
        a_idx = (
            np.concatenate(a_parts) if a_parts else np.zeros(0, np.int64)
        ).astype(np.int64)
        b_idx = (
            np.concatenate(b_parts) if b_parts else np.zeros(0, np.int64)
        ).astype(np.int64)
        out = {
            "a": pa.array(ids[a_idx] if len(a_idx) else [], pa.int64()),
            "b": pa.array(ids[b_idx] if len(b_idx) else [], pa.int64()),
            "rank_dist": pa.array(
                (rank[b_idx] - rank[a_idx]) if len(a_idx) else [], pa.int64()
            ),
        }
        for c in carry:
            col = g.column(c).combine_chunks()
            out[f"{c}_a"] = (
                col.take(pa.array(a_idx, pa.int64()))
                if len(a_idx)
                else pa.array([], col.type)
            )
            out[f"{c}_b"] = (
                col.take(pa.array(b_idx, pa.int64()))
                if len(b_idx)
                else pa.array([], col.type)
            )
        return pa.table(out)

    return ranked.map_batches(replicate, batch_format="pyarrow").groupby(
        "_ck"
    ).map_groups(pairs, batch_format="pyarrow")

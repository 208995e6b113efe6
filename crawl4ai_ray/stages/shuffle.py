"""Deterministic shuffle-for-training export.

The last stage of a real training-data pipeline: globally shuffle the
corpus and split it into K output shards so that training sees a
reproducible, seed-keyed random order. ``ray.data.Dataset.random_shuffle``
is non-deterministic across plans/cluster shapes, so the engine-independent
formulation is a KEYED shuffle: every doc gets a 64-bit mixed key

    key = (doc_id * A + seed) mod 2^64        (MCG/LCG-style multiplier)

and the shuffled order IS ascending (key, doc_id). Shard assignment is
``key % n_shards``; the position within a shard is the doc's rank among the
shard's keys. The rank is a global order statistic — computed distributed
with the same two-level scan as ``stages/packing.py``:

1. ``map_batches``: key/shard/range-bucket per doc, where the range bucket
   is the TOP BITS of the key (keys are uniform ⇒ buckets are balanced and
   bucket order == key order).
2. per-(shard, bucket) counts → driver folds the ~n_shards·n_buckets tiny
   rows into per-(shard,bucket) base offsets (O(K·B) scalar fold, bounded
   by construction).
3. ``groupby``: per-(shard,bucket) vectorized sort by (key, doc_id) +
   rebased arange → every doc's in-shard position.

Partitioning assumption: one (shard, range-bucket) group fits in a worker
heap — size ``bucket_bits`` so corpus/(K·2^bits) stays ≲1e7 rows.

Only (doc_id, key) pairs ever shuffle; text/binary payloads move once, in
``export_shards``'s final write, pruned to the export columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

# Fixed public mixing constants (Knuth/PCG multiplier + odd increment).
MULT = np.uint64(6364136223846793005)
INC = np.uint64(1442695040888963407)


def _mix_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """key = (doc_id * MULT + INC + seed) mod 2^64, all-uint64 arithmetic
    (numpy promotes uint64 % python-int to float — keep operands uint64)."""
    return ids.astype(np.uint64) * MULT + INC + np.uint64(seed)


def shuffle_assignments(
    ds: "ray.data.Dataset",
    n_shards: int = 16,
    seed: int = 0,
    id_col: str = "doc_id",
    bucket_bits: int = 6,
) -> "ray.data.Dataset":
    """→ (doc_id, shard, pos): the deterministic shuffled placement of every
    doc — shard = key % n_shards, pos = rank of (key, doc_id) within the
    shard. Same (seed, n_shards) ⇒ bit-identical placement on any cluster
    shape or block layout."""

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    nsh = np.uint64(n_shards)
    shift = np.uint64(64 - bucket_bits)
    n_buckets = 1 << bucket_bits

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key = _mix_keys(ids, seed)
        shard = (key % nsh).astype(np.int64)
        kb = (key >> shift).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                # int64 view of the uint64 key: order-preserving only per
                # bucket? No — we sort uint64 inside the group, so carry the
                # exact uint64 bits losslessly.
                "key": pa.array(key.view(np.int64), pa.int64()),
                "shard": pa.array(shard, pa.int64()),
                "gk": pa.array(shard * n_buckets + kb, pa.int64()),
            }
        )

    keyed_ds = ds.select_columns([id_col]).map_batches(keyed, batch_format="pyarrow")

    # Stage 2: tiny (shard, bucket) counts → per-group base offsets.
    totals = keyed_ds.groupby("gk").aggregate(
        ray.data.aggregate.Count(alias_name="n")
    ).take_all()
    totals.sort(key=lambda r: r["gk"])  # gk = shard*B + bucket ⇒ shard-major
    bases: dict[int, int] = {}
    acc = 0
    prev_shard = -1
    for row in totals:
        shard = row["gk"] // n_buckets
        if shard != prev_shard:
            acc = 0  # ranks restart per shard
            prev_shard = shard
        bases[row["gk"]] = acc
        acc += row["n"]
    bases_ref = ray.put(bases)

    def per_group(g: pa.Table) -> pa.Table:
        # arrow-native (r5): lexsort over numpy views, no pandas
        if g.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "shard": z, "pos": z})
        base = ray.get(bases_ref)[int(g.column("gk")[0].as_py())]
        key = g.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = (
            g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.lexsort((ids, key))
        pos = base + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "shard": pa.array(
                    g.column("shard")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[order],
                    pa.int64(),
                ),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return keyed_ds.groupby("gk").map_groups(per_group, batch_format="pyarrow")


def export_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_shards: int = 16,
    seed: int = 0,
    id_col: str = "doc_id",
    columns: list[str] | None = None,
    bucket_bits: int = 6,
) -> dict:
    """Write the corpus as ``out_dir/shard=NN/*.parquet`` in deterministic
    shuffled order: each shard's files carry a ``pos`` column giving the
    exact in-shard training order (readers sort-by-pos per shard — cheap,
    one shard at a time). Payload columns move through the shuffle exactly
    once. Returns a small manifest (rows per shard)."""
    assign = shuffle_assignments(
        ds, n_shards=n_shards, seed=seed, id_col=id_col, bucket_bits=bucket_bits
    )
    payload = ds if columns is None else ds.select_columns(
        list(dict.fromkeys([id_col, *columns]))
    )
    # Bucketed attach (union+groupby — no Dataset.join fixed overhead):
    # both sides tagged, grouped by hash(doc_id)%P, assignment glued on.
    joined = _attach(payload, assign, id_col)
    joined.write_parquet(out_dir, partition_cols=["shard"])
    counts = assign.groupby("shard").aggregate(
        ray.data.aggregate.Count(alias_name="n_rows")
    ).take_all()
    return {
        "n_shards": n_shards,
        "seed": seed,
        "rows_per_shard": {int(r["shard"]): int(r["n_rows"]) for r in counts},
    }


def _attach(payload: "ray.data.Dataset", assign: "ray.data.Dataset", id_col: str):
    """Glue (shard, pos) onto the payload rows by doc id via the bucketed
    union+groupby join form (NOTES: Dataset.join costs ~4 s fixed per call)."""

    P = 64

    def tag(is_assign: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col if not is_assign else "doc_id")
            ids64 = ids.to_numpy(zero_copy_only=False).astype(np.int64)
            b = (ids64.view(np.uint64) * MULT % np.uint64(P)).astype(np.int64)
            cols = {name: batch.column(name) for name in batch.column_names}
            cols["_b"] = pa.array(b, pa.int64())
            cols["_is_assign"] = pa.array(
                np.full(len(ids64), is_assign), pa.bool_()
            )
            return pa.table(cols)

        return fn

    left = payload.map_batches(tag(False), batch_format="pyarrow")
    right = assign.map_batches(tag(True), batch_format="pyarrow")
    # align schemas: union requires same columns — add missing as nulls
    lcols = set(left.schema().names)
    rcols = set(right.schema().names)

    def pad(missing, proto_types):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            for name in sorted(missing):
                batch = batch.append_column(
                    name, pa.nulls(n, proto_types[name])
                )
            return batch

        return fn

    ltypes = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    rtypes = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    left = left.map_batches(pad(rcols - lcols, rtypes), batch_format="pyarrow")
    right = right.map_batches(pad(lcols - rcols, ltypes), batch_format="pyarrow")

    # payload schema order (a set here would make column order vary per run)
    value_cols = [
        c for c in payload.schema().names if c not in ("_b", "_is_assign")
    ]

    def glue(g: pa.Table) -> pa.Table:
        # arrow-native inner join (r5): sorted assignment ids +
        # searchsorted probe, columns glued with zero-copy take
        is_a = g.column("_is_assign").to_numpy(zero_copy_only=False)
        a = g.filter(pa.array(is_a))
        p = g.filter(pa.array(~is_a))

        def empty() -> pa.Table:
            cols = {c: pa.array([], g.column(c).type) for c in value_cols}
            cols["shard"] = pa.array([], pa.int64())
            cols["pos"] = pa.array([], pa.int64())
            return pa.table(cols)

        if p.num_rows == 0 or a.num_rows == 0:
            return empty()
        aid = (
            a.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.argsort(aid, kind="stable")
        aid = aid[order]
        pid = p.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        loc = np.searchsorted(aid, pid)
        safe = np.minimum(loc, len(aid) - 1)
        hit = aid[safe] == pid
        if not hit.any():
            return empty()
        kept = p.filter(pa.array(hit))
        take = pa.array(order[safe[hit]], pa.int64())
        cols = {c: kept.column(c) for c in value_cols}
        cols["shard"] = a.column("shard").combine_chunks().take(take)
        cols["pos"] = a.column("pos").combine_chunks().take(take)
        return pa.table(cols)

    return left.union(right).groupby("_b").map_groups(glue, batch_format="pyarrow")

"""Dataset-integrity Merkle tree over per-row digests — distributed.

The corpus-versioning fingerprint: leaf_i = digest of row i in key order,
parents = md5(left || right) with an odd tail node promoted unchanged.
Two parties can prove corpus equality (or locate a differing subtree in
log n probes) without shipping data.

Distributed plan:
  1. **Rank assignment** (leaf index = dense rank of the key) without a
     global sort-collect: one tiny aggregate gets (min, max, count) of
     the key; keys are RANGE-bucketed by value (monotone in the key, so
     bucket order + in-bucket order = global order); per-bucket counts
     (≤ num_partitions rows) fold to prefix bases on the driver — the
     ``pack_sequences`` two-level prefix-scan shape; each bucket then
     sorts locally and emits ``i = base + local_index``.
  2. **Level folds**: ``levels`` rounds of ``groupby(i // 2)`` — each
     round's all-to-all carries ONE row per parent and halves the row
     count, so total shuffled volume is ≤ 2× the leaf digests.

The driver never holds more than ``num_partitions`` count rows plus the
final root. ``small_threshold``: a local collect-and-fold fast path with
the identical md5 arithmetic (bit-equal — the fold is deterministic);
dual-path parity is test-locked, pass 0 to force the distributed path.

Reference anchor: crawl4ai has no corpus-integrity operator (per-page
framework); the tree shape follows Certificate-Transparency-style binary
Merkle trees (RFC 6962 §2.1) with the odd-node-promotion variant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


def _fold_level_py(level: "list[str]") -> "list[str]":
    nxt = []
    for i in range(0, len(level), 2):
        if i + 1 < len(level):
            nxt.append(hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest())
        else:
            nxt.append(level[i])
    return nxt


def merkle_root(
    leaves: "ray.data.Dataset",
    key_col: str = "doc_id",
    hash_col: str = "h",
    levels: int = 12,
    num_partitions: int = 16,
    small_threshold: int = 200_000,
) -> "tuple[int, str]":
    """Binary Merkle root of ``leaves`` (key_col:int64, hash_col:string)
    in ascending key order, folded through exactly ``levels`` rounds
    (a no-op once a single row remains — size the levels to cover the
    corpus: 2^levels ≥ n). Returns ``(n_leaves, root_hex)``;
    the root of an empty dataset is the empty-string sentinel ''."""
    P = num_partitions
    n = leaves.count()
    if n == 0:
        return 0, ""

    if small_threshold and n <= small_threshold:
        rows = sorted(leaves.take_all(), key=lambda r: int(r[key_col]))
        level = [r[hash_col] for r in rows]
        for _ in range(levels):
            level = _fold_level_py(level)
        if len(level) != 1:
            raise ValueError(
                f"merkle_root: {len(level)} nodes remain after {levels} "
                f"levels — raise `levels` to cover {n} leaves"
            )
        return n, level[0]

    # --- rank assignment: range buckets + two-level prefix scan --------
    import ray.data.aggregate as agg_mod

    stats = leaves.aggregate(
        agg_mod.Min(key_col, alias_name="lo"), agg_mod.Max(key_col, alias_name="hi")
    )
    lo, hi = int(stats["lo"]), int(stats["hi"])
    span = hi - lo + 1

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # monotone-in-key bucket id → bucket order IS key order
        b = ((k - lo) * P // span).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(b),
                "k": pa.array(k),
                "h": batch.column(hash_col),
            }
        )

    tagged = leaves.map_batches(tag, batch_format="pyarrow").materialize()

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        ub, cnts = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(ub, pa.int64()), "n": pa.array(cnts, pa.int64())}
        )

    # ≤ P rows reach the driver — the bounded prefix fold
    totals = (
        tagged.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .take_all()
    )
    totals.sort(key=lambda r: r["bucket"])
    bases: dict[int, int] = {}
    acc = 0
    for row in totals:
        bases[row["bucket"]] = acc
        acc += int(row["sum(n)"])
    bases_ref = ray.put(bases)

    def rank_bucket(g: pa.Table) -> pa.Table:
        base_map = ray.get(bases_ref)
        k = g.column("k").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        base = base_map[int(g.column("bucket")[0].as_py())]
        return pa.table(
            {
                "i": pa.array(base + np.arange(len(k), dtype=np.int64)),
                "h": g.column("h").take(pa.array(order)),
            }
        )

    level = (
        tagged.groupby("bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
        .materialize()
    )

    # --- level folds: one halving groupby per level --------------------
    def to_parent(batch: pa.Table) -> pa.Table:
        i = batch.column("i").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p": pa.array(i // 2, pa.int64()),
                "pos": pa.array(i % 2, pa.int64()),
                "h": batch.column("h"),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        hs = g.column("h").to_pylist()
        if len(hs) == 2:
            left, right = (hs[0], hs[1]) if pos[0] == 0 else (hs[1], hs[0])
            out = hashlib.md5((left + right).encode()).hexdigest()
        else:  # odd tail node promoted unchanged
            out = hs[0]
        return pa.table(
            {
                "i": pa.array([int(g.column("p")[0].as_py())], pa.int64()),
                "h": pa.array([out], pa.string()),
            }
        )

    remaining = n
    for _ in range(levels):
        if remaining <= 1:
            break
        level = (
            level.map_batches(to_parent, batch_format="pyarrow")
            .groupby("p")
            .map_groups(combine, batch_format="pyarrow")
            .materialize()
        )
        remaining = (remaining + 1) // 2
    root_rows = level.take_all()
    # after `levels` folds a single root remains iff 2^levels ≥ n
    roots = {r["i"]: r["h"] for r in root_rows}
    if len(roots) != 1:
        raise ValueError(
            f"merkle_root: {len(roots)} nodes remain after {levels} levels "
            f"— raise `levels` to cover {n} leaves"
        )
    return n, roots[0]

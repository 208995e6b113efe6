"""Deterministic mergeable quantile sketch (KLL-style compactor
hierarchy) — the quantile member of the engine's sketch family
(HyperLogLog distinct counts and Misra–Gries heavy hitters live in
``agg.py``).

Structure per Karnin–Lang–Liberty (FOCS 2016): a ladder of capacity-``k``
buffers where level ``ℓ`` items carry weight ``2^ℓ``; an overflowing
buffer is sorted and HALVED — every other item is promoted one level at
doubled weight, the rest are discarded. KLL flips a coin for the halving
offset; this variant ALTERNATES the offset per level deterministically
(a per-level compaction counter), trading KLL's randomized error bound
for exact reproducibility — the property the oracle gate needs. The
deterministic alternation cancels adjacent-rank bias across successive
compactions; the worst-case rank error remains O(W·log(n/k)/k) in the
spirit of the Manku–Rajagopalan–Lindsay deterministic lineage, and tests
assert the empirical error on top.

Determinism contract: the sketch state is a pure function of the
INSERTION ORDER. Distributed callers must therefore impose an order:
``quantiles_per_key`` builds partials over ordered id-ranges (values
sorted within each range bucket) and folds the ≤B partial sketches in
bucket order — every run, every cluster layout, same bytes.

Memory: O(k · log(n/k)) items per sketch regardless of n — the reason a
100 TB column gets quantiles without a distributed sort (compare
``agg.exact_percentiles``, which is exact but needs a bounded value
domain to histogram)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class DQSketch:
    """Deterministic KLL-style quantile sketch over float64 values."""

    def __init__(self, k: int = 128):
        if k < 4:
            raise ValueError("k must be >= 4")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.compactions: list[int] = [0]  # per-level offset alternator
        self.count = 0  # total weight inserted

    # -- building ----------------------------------------------------------
    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.count += len(v)
        # insert in chunks of k so level-0 never grows unboundedly
        for i in range(0, len(v), self.k):
            self.levels[0] = np.concatenate([self.levels[0], v[i : i + self.k]])
            self._compress()

    def _compress(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            if len(self.levels[lvl]) <= self.k:
                lvl += 1
                continue
            buf = np.sort(self.levels[lvl], kind="stable")
            off = self.compactions[lvl] & 1
            self.compactions[lvl] += 1
            promoted = buf[off::2]
            self.levels[lvl] = np.empty(0, np.float64)
            if lvl + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.compactions.append(0)
            self.levels[lvl + 1] = np.concatenate(
                [self.levels[lvl + 1], promoted]
            )
            lvl += 1

    # -- merging -----------------------------------------------------------
    def merge(self, other: "DQSketch") -> "DQSketch":
        """Fold ``other`` into self (left fold — callers fix the order)."""
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self.compactions.append(0)
        for lvl, buf in enumerate(other.levels):
            if len(buf):
                self.levels[lvl] = np.concatenate([self.levels[lvl], buf])
        self.count += other.count
        self._compress()
        return self

    # -- querying ----------------------------------------------------------
    def quantiles(self, qs: list[float]) -> list[float]:
        """Lower-quantile semantics: smallest stored item whose cumulative
        weight reaches ``ceil(q * W)`` (W = total stored weight)."""
        items, weights = [], []
        for lvl, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << lvl, dtype=np.int64))
        if not items:
            return [float("nan")] * len(qs)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        it, wt = it[order], wt[order]
        cw = np.cumsum(wt)
        total = int(cw[-1])
        out = []
        for q in qs:
            target = max(1, int(np.ceil(q * total)))
            idx = int(np.searchsorted(cw, target, side="left"))
            out.append(float(it[min(idx, len(it) - 1)]))
        return out

    # -- persistence -------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = (
            b"DQS1"
            + self.k.to_bytes(4, "little")
            + self.count.to_bytes(8, "little")
            + len(self.levels).to_bytes(4, "little")
        )
        parts = [head]
        for buf, comp in zip(self.levels, self.compactions):
            parts.append(len(buf).to_bytes(4, "little"))
            parts.append(comp.to_bytes(4, "little"))
            parts.append(np.ascontiguousarray(buf).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "DQSketch":
        if data[:4] != b"DQS1":
            raise ValueError("not a DQSketch payload")
        k = int.from_bytes(data[4:8], "little")
        sk = cls(k)
        sk.count = int.from_bytes(data[8:16], "little")
        n_levels = int.from_bytes(data[16:20], "little")
        sk.levels, sk.compactions = [], []
        off = 20
        for _ in range(n_levels):
            n = int.from_bytes(data[off : off + 4], "little")
            comp = int.from_bytes(data[off + 4 : off + 8], "little")
            off += 8
            sk.levels.append(
                np.frombuffer(data[off : off + 8 * n], dtype=np.float64).copy()
            )
            sk.compactions.append(comp)
            off += 8 * n
        return sk


def quantiles_per_key(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    qs: list[float],
    k: int = 128,
    id_col: str = "doc_id",
    range_width: int = 64,
) -> "ray.data.Dataset":
    """Approximate per-key quantiles via deterministic sketches, without a
    distributed sort:

    1. ``map_batches``: tag each row with its ordered id-range bucket.
    2. ``groupby(key, bucket).map_groups``: build one partial sketch per
       (key, range) over values sorted by ``id_col`` — a deterministic
       insertion order independent of block layout. Only
       O(k log) bytes per partial cross the wire.
    3. ``groupby(key).map_groups``: fold partials in bucket order (left
       fold — merge order fixed), emit one row per (key, q).

    Output: (key, q, value) — q as float64, value the sketch's lower
    quantile."""
    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key: batch.column(key),
                "bucket": pa.array(ids // range_width, pa.int64()),
                "_id": pa.array(ids, pa.int64()),
                value: batch.column(value),
            }
        )

    def partial(g: pa.Table) -> pa.Table:
        # arrow-native (r5): one sort + vectorized sketch insert
        g = g.sort_by("_id")
        sk = DQSketch(k)
        sk.add_values(
            g.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table(
            {
                key: g.column(key).slice(0, 1),
                "bucket": g.column("bucket").slice(0, 1),
                "sketch": pa.array([sk.to_bytes()], pa.binary()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        # arrow-native (r5): bucket-ordered left fold of the partials
        g = g.sort_by("bucket")
        acc: DQSketch | None = None
        for payload in g.column("sketch").to_pylist():
            sk = DQSketch.from_bytes(payload)
            acc = sk if acc is None else acc.merge(sk)
        vals = acc.quantiles(qs)
        kv = g.column(key).slice(0, 1)
        return pa.table(
            {
                key: pa.concat_arrays(
                    [kv.combine_chunks()] * len(qs)
                ),
                "q": pa.array(np.asarray(qs, np.float64), pa.float64()),
                "value": pa.array(np.asarray(vals, np.float64), pa.float64()),
            }
        )

    tagged = (
        ds.select_columns([key, id_col, value])
        .map_batches(tag, batch_format="pyarrow")
    )
    partials = tagged.groupby([key, "bucket"]).map_groups(
        partial, batch_format="pyarrow"
    )
    return partials.groupby(key).map_groups(fold, batch_format="pyarrow")

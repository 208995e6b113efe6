"""Partial-key cuckoo filter: the deletable alternative to the Bloom filter.

The north rule calls for a "Bloom/cuckoo URL-seen" structure; `bloom.py`
covers the Bloom half, this module the cuckoo half (Fan, Andersen,
Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public paper; all formulas below are from it).

Layout: ``num_buckets`` (power of two) buckets × 4 slots of 16-bit
fingerprints (0 = empty sentinel). An item with 64-bit key hash ``h`` has

- fingerprint  ``f  = low16(splitmix64(h))``, remapped 0→1,
- bucket 1     ``i1 = h & (num_buckets-1)``,
- bucket 2     ``i2 = i1 XOR ((splitmix64(f) | 1) & (num_buckets-1))``,

so either bucket is recoverable from the other plus the fingerprint —
that partial-key property is what makes displacement (and deletion)
possible without storing keys. The ``| 1`` forces the XOR step odd so
``i2 != i1`` whenever the table has more than one bucket: without it,
a key whose step masks to 0 has effectively ONE bucket, and the kick
loop can stagnate inside that single full bucket (hypothesis found
exactly this at 4-bucket test sizes; at production sizes it is a
1/num_buckets-per-key soft spot). XOR with a fixed odd step is still an
involution, so partial-key recovery is unchanged. False-positive rate ≈ 2·4/2^16 ≈ 1.2e-4 at
full load; capacity is sized for a 0.95 target load factor, the paper's
practical ceiling for (4, 16-bit) tables.

Why have both filters: the Bloom is write-cheapest for the append-only
crawl frontier; the cuckoo supports DELETE (recrawl scheduling, TTL'd
politeness state, retracting a poisoned domain from the seen set) which a
Bloom fundamentally cannot, at a comparable memory footprint
(16 bits/key ÷ 0.95 ≈ 2.1 bytes/key vs the Bloom's ~1.2 bytes/key at 1%
fpp — but at ~80× lower fpp). `UrlSeenShard` accepts either via
``approx_filter=``.

Bulk insertion is two vectorized placement rounds (sort candidates by
bucket, rank within each equal-bucket run against the bucket's free-slot
count — intra-batch contention resolved by the rank, no per-item python
until a bucket actually overflows) + a python kick loop only for the
residue, which is empty until the table runs hot.
"""

from __future__ import annotations

import numpy as np

from .bloom import splitmix64

_MAX_KICKS = 500
_SLOTS = 4
_TARGET_LOAD = 0.95


class CuckooFilterFull(RuntimeError):
    """Raised when an insert cannot be placed after _MAX_KICKS displacements."""


class CuckooFilter:
    def __init__(self, capacity: int):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        need = int(np.ceil(capacity / (_SLOTS * _TARGET_LOAD)))
        nb = 1
        while nb < need:
            nb <<= 1
        self.num_buckets = nb
        self.capacity = capacity
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0

    # -- derived fields ----------------------------------------------------
    def _fingerprints(self, hashes: np.ndarray) -> np.ndarray:
        f = (splitmix64(hashes.astype(np.uint64)) & np.uint64(0xFFFF)).astype(np.uint16)
        f[f == 0] = 1  # 0 is the empty-slot sentinel
        return f

    def _alt_bucket(self, b: np.ndarray, f: np.ndarray) -> np.ndarray:
        mask = np.uint64(self.num_buckets - 1)
        # | 1 before masking: step is odd (nonzero) for any table with >1
        # bucket, so the alt bucket always differs from the primary
        step = (splitmix64(f.astype(np.uint64)) | np.uint64(1)) & mask
        return (b.astype(np.uint64) ^ step).astype(np.int64)

    def _buckets(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h = np.asarray(hashes, dtype=np.uint64)
        f = self._fingerprints(h)
        b1 = (h & np.uint64(self.num_buckets - 1)).astype(np.int64)
        return f, b1, self._alt_bucket(b1, f)

    # -- queries -----------------------------------------------------------
    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """(n,) uint64 → (n,) bool: True = possibly present."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        f, b1, b2 = self._buckets(hashes)
        fcol = f[:, None]
        return ((self.table[b1] == fcol).any(axis=1)
                | (self.table[b2] == fcol).any(axis=1))

    # -- insertion ---------------------------------------------------------
    def _place_round(self, f: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Vectorized placement attempt of fingerprints f into buckets b.
        Returns a bool mask of items that were placed. Items sharing a
        bucket are ranked within the run; only ranks below the bucket's
        free-slot count land this round."""
        order = np.argsort(b, kind="stable")
        bs = b[order]
        # rank within each equal-bucket run
        run_start = np.zeros(len(bs), dtype=np.int64)
        new_run = np.empty(len(bs), dtype=bool)
        new_run[0] = True
        new_run[1:] = bs[1:] != bs[:-1]
        run_start[new_run] = np.nonzero(new_run)[0]
        np.maximum.accumulate(run_start, out=run_start)
        rank = np.arange(len(bs)) - run_start
        free = (self.table[bs] == 0).sum(axis=1)
        fits = rank < free
        placed_idx = order[fits]
        # Occupied slots are always a left-packed prefix (inserts append at
        # the first empty, delete() re-packs), so the landing slot for the
        # item ranked r in its bucket run is occupancy + r.
        occ = _SLOTS - free[fits]
        self.table[b[placed_idx], occ + rank[fits]] = f[placed_idx]
        out = np.zeros(len(f), dtype=bool)
        out[placed_idx] = True
        self.count += len(placed_idx)
        return out

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Bulk insert. Raises CuckooFilterFull if the table cannot absorb
        an item after _MAX_KICKS displacements (caller should have sized
        capacity; the shard sizes for 0.95 load)."""
        if len(hashes) == 0:
            return
        f, b1, b2 = self._buckets(hashes)
        placed = self._place_round(f, b1)
        if not placed.all():
            rem = ~placed
            placed2 = self._place_round(f[rem], b2[rem])
            if not placed2.all():
                ridx = np.nonzero(rem)[0][~placed2]
                for i in ridx:
                    self._insert_with_kicks(int(f[i]), int(b1[i]))

    def _insert_with_kicks(self, f: int, b: int) -> None:
        rng_state = np.uint64(f) ^ np.uint64(b)
        for _ in range(_MAX_KICKS):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                self.table[b, empty[0]] = f
                self.count += 1
                return
            # evict a deterministic pseudo-random victim
            rng_state = splitmix64(np.array([rng_state], dtype=np.uint64))[0]
            victim = int(rng_state) % _SLOTS
            f, self.table[b, victim] = int(self.table[b, victim]), f
            b = int(self._alt_bucket(np.array([b]), np.array([f], dtype=np.uint16))[0])
        raise CuckooFilterFull(
            f"cuckoo filter over capacity ({self.count}/{self.capacity})"
        )

    # -- deletion ----------------------------------------------------------
    def delete_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one stored copy per present key. Returns (n,) bool of
        which keys were found. Buckets are re-left-packed so the
        occupancy-prefix invariant used by bulk placement holds."""
        out = np.zeros(len(hashes), dtype=bool)
        if len(hashes) == 0:
            return out
        f, b1, b2 = self._buckets(hashes)
        for i in range(len(hashes)):
            for b in (int(b1[i]), int(b2[i])):
                row = self.table[b]
                hit = np.nonzero(row == f[i])[0]
                if len(hit):
                    row[hit[0]] = 0
                    # left-pack the bucket
                    occ = row[row != 0]
                    row[: len(occ)] = occ
                    row[len(occ):] = 0
                    self.count -= 1
                    out[i] = True
                    break
        return out

    # -- metrics / persistence --------------------------------------------
    def load_factor(self) -> float:
        return self.count / (self.num_buckets * _SLOTS)

    def estimated_cardinality(self) -> float:
        """Exact for a cuckoo filter: stored fingerprints are counted."""
        return float(self.count)

    def to_bytes(self) -> bytes:
        # CKF2: CKF1 payloads were written under the unforced (possibly-
        # zero) XOR step, i.e. a different bucket mapping — loading one
        # under the v2 mapping would silently miss alt-bucket entries, so
        # the magic bump makes stale dumps fail loudly instead.
        header = (
            b"CKF2"
            + self.capacity.to_bytes(8, "little")
            + self.count.to_bytes(8, "little")
        )
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        if data[:4] != b"CKF2":
            if data[:3] == b"CKF":
                raise ValueError(
                    "cuckoo payload version mismatch (pre-CKF2 dumps used a "
                    "different alt-bucket mapping; rebuild the filter from "
                    "the exact store)"
                )
            raise ValueError("not a cuckoo filter payload")
        capacity = int.from_bytes(data[4:12], "little")
        cf = cls(capacity)
        cf.count = int.from_bytes(data[12:20], "little")
        table = np.frombuffer(data[20:], dtype=np.uint16)
        if len(table) != cf.table.size:
            raise ValueError("cuckoo payload size mismatch")
        cf.table = table.reshape(cf.num_buckets, _SLOTS).copy()
        return cf

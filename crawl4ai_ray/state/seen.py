"""Sharded URL-seen set: Bloom fast-path + exact arbitration.

The reference keeps one in-process ``visited: Set[str]`` per deep crawl
(bfs_strategy.py:105-121) and prototypes a Bloom filter for scale
(deep_crawling/crazy.py). Here the seen set is S hash-partitioned
``UrlSeenShard`` actors, each holding

- a BloomFilter over the shard's key hashes (answers "definitely new"
  without touching the exact store), and
- an exact key-hash set that arbitrates Bloom positives, so the final
  URL-seen SET is exact — the parity requirement of the north rule.

Keys are canonicalized urls (normalize_url_for_deep_crawl); all routing and
membership uses the shared 64-bit hash (functions/hashing.hash64), so a
shard stores uint64s, not strings (10^10 urls ≈ 80 GB of uint64s across the
cluster, spillable; the Bloom keeps the common probe cheap).

Calls from inside map_batches tasks are plain actor RPCs — this is the one
place the Dataset API can't express the semantics (shared mutable index),
per SURVEY.md §2.3.
"""

from __future__ import annotations

import numpy as np

import ray

from ..functions.hashing import hash64


@ray.remote(num_cpus=0)  # lightweight state actor: never reserve CPUs —
# reserving would deadlock placement on small sessions (probes are bursty
# and short; at cluster scale, shard count is sized to nodes, not cores)
class UrlSeenShard:
    """One partition of the URL-seen set.

    Doubles as the per-wave candidate-dedup partition: ``offer`` accumulates
    a wave's candidate links for this hash range; ``finalize_wave`` picks a
    deterministic canonical row per unique unseen url (max score, then min
    parent), marks them seen (the reference marks visited at discovery,
    before any capacity trim — bfs_strategy.py:113-122), and returns them.
    Routing by hash(url_norm) means the dedup "groupby" needs no extra
    shuffle: the seen-check and the dedup share one partitioning.
    """

    def __init__(self, capacity: int = 1_000_000, error_rate: float = 0.01):
        from .bloom import BloomFilter  # import inside actor

        self.bloom = BloomFilter(capacity, error_rate)
        self.exact: set[int] = set()
        # wave accumulation: key_hash -> (url_norm, host, depth, parent, score)
        self.wave: dict[int, tuple] = {}

    def offer(
        self, hashes, url_norms, hosts, depths, parents, scores
    ) -> int:
        """Accumulate wave candidates (already partially deduped per batch).
        Deterministic canonical pick regardless of arrival order."""
        for h, u, ho, d, p, s in zip(hashes, url_norms, hosts, depths, parents, scores):
            h = int(h)
            cur = self.wave.get(h)
            # canonical: higher score wins, then smaller depth, then smaller parent
            cand = (u, ho, int(d), p, float(s))
            if cur is None or (-cand[4], cand[2], cand[3]) < (-cur[4], cur[2], cur[3]):
                self.wave[h] = cand
        return len(self.wave)

    def finalize_wave(self):
        """Seen-anti-join the accumulated wave, mark new urls seen, return
        the canonical new candidates as arrays (sorted by url for
        determinism). Clears the accumulator."""
        import numpy as np  # noqa: F811

        if not self.wave:
            return None
        items = sorted(self.wave.items(), key=lambda kv: kv[1][0])  # by url_norm
        self.wave = {}
        hashes = np.fromiter((h for h, _ in items), dtype=np.uint64, count=len(items))
        seen = self.check(hashes)
        new_idx = np.nonzero(~seen)[0]
        if len(new_idx) == 0:
            return None
        new_hashes = hashes[new_idx]
        self.add(new_hashes)
        vals = [items[i][1] for i in new_idx]
        return {
            "url_norm": [v[0] for v in vals],
            "host": [v[1] for v in vals],
            "depth": [v[2] for v in vals],
            "parent_url": [v[3] for v in vals],
            "score": [v[4] for v in vals],
        }

    def check(self, hashes: np.ndarray) -> np.ndarray:
        """True where the key was already seen. Read-only."""
        maybe = self.bloom.contains_hashes(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        idx = np.nonzero(maybe)[0]
        for i in idx:  # bloom positives arbitrated exactly
            out[i] = int(hashes[i]) in self.exact
        return out

    def add(self, hashes: np.ndarray) -> int:
        """Mark keys seen; returns number newly added."""
        before = len(self.exact)
        self.bloom.add_hashes(hashes)
        self.exact.update(int(h) for h in hashes)
        return len(self.exact) - before

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        seen = self.check(hashes)
        new = hashes[~seen]
        if len(new):
            self.add(new)
        return seen

    def stats(self) -> dict:
        return {
            "exact_size": len(self.exact),
            "bloom_estimate": self.bloom.estimated_cardinality(),
            "bloom_bits": self.bloom.num_bits,
        }

    def dump(self) -> bytes:
        """Checkpoint payload: bloom bytes + sorted exact hashes."""
        arr = np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))
        arr.sort()
        bloom_b = self.bloom.to_bytes()
        return len(bloom_b).to_bytes(8, "little") + bloom_b + arr.tobytes()

    def load(self, data: bytes) -> int:
        from .bloom import BloomFilter

        n = int.from_bytes(data[0:8], "little")
        self.bloom = BloomFilter.from_bytes(data[8 : 8 + n])
        arr = np.frombuffer(data[8 + n :], dtype=np.uint64)
        self.exact = set(int(x) for x in arr)
        return len(self.exact)


class SeenSet:
    """Driver-side handle over the shard pool."""

    def __init__(self, num_shards: int = 16, capacity_per_shard: int = 1_000_000,
                 error_rate: float = 0.01):
        self.num_shards = num_shards
        self.shards = [
            UrlSeenShard.remote(capacity_per_shard, error_rate)
            for _ in range(num_shards)
        ]

    def _route(self, hashes: np.ndarray):
        shard_ids = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        return shard_ids

    def _scatter_gather(self, hashes: np.ndarray, method: str) -> np.ndarray:
        """Partition a hash batch by shard, issue one RPC per shard, and
        stitch results back into input order."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._route(hashes)
        refs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx) == 0:
                continue
            refs.append(getattr(self.shards[s], method).remote(hashes[idx]))
            idxs.append(idx)
        out = np.zeros(len(hashes), dtype=bool)
        for idx, res in zip(idxs, ray.get(refs)):
            if res is not None and not np.isscalar(res):
                out[idx] = res
        return out

    def check(self, keys_or_hashes) -> np.ndarray:
        return self._scatter_gather(self._as_hashes(keys_or_hashes), "check")

    def add(self, keys_or_hashes) -> None:
        h = self._as_hashes(keys_or_hashes)
        if len(h) == 0:
            return
        shard_ids = self._route(h)
        refs = []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                refs.append(self.shards[s].add.remote(h[idx]))
        ray.get(refs)

    def check_and_add(self, keys_or_hashes) -> np.ndarray:
        return self._scatter_gather(self._as_hashes(keys_or_hashes), "check_and_add")

    @staticmethod
    def _as_hashes(keys) -> np.ndarray:
        if isinstance(keys, np.ndarray) and keys.dtype == np.uint64:
            return keys
        return hash64(list(keys))

    def offer_candidates(self, url_norms, hosts, depths, parents, scores) -> None:
        """Partition one batch of candidates across shards (used inside
        map_batches tasks; blocks until the shards acked)."""
        h = hash64(list(url_norms))
        shard_ids = self._route(h)
        refs = []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx) == 0:
                continue
            refs.append(
                self.shards[s].offer.remote(
                    h[idx],
                    [url_norms[i] for i in idx],
                    [hosts[i] for i in idx],
                    [int(depths[i]) for i in idx],
                    [parents[i] for i in idx],
                    [float(scores[i]) for i in idx],
                )
            )
        ray.get(refs)

    def finalize_wave(self) -> list[dict]:
        """Gather each shard's canonical new candidates (marks them seen)."""
        res = ray.get([s.finalize_wave.remote() for s in self.shards])
        return [r for r in res if r is not None]

    def stats(self) -> dict:
        per = ray.get([s.stats.remote() for s in self.shards])
        return {
            "num_shards": self.num_shards,
            "exact_size": sum(p["exact_size"] for p in per),
            "bloom_estimate": sum(p["bloom_estimate"] for p in per),
        }

    def dump_all(self) -> list[bytes]:
        return ray.get([s.dump.remote() for s in self.shards])

    def load_all(self, payloads: list[bytes]) -> None:
        ray.get([s.load.remote(p) for s, p in zip(self.shards, payloads)])

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []

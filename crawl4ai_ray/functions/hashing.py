"""Stable, vectorized 64-bit hashing for partitioning / Bloom filters.

The reference prototypes its Bloom filter on mmh3 (deep_crawling/crazy.py:124);
mmh3 isn't available here, so we standardise on polars' xxhash64 (vectorized,
seeded, deterministic across processes for a fixed polars version) with a
blake2b fallback. All partitioning keys and Bloom probes in the engine go
through these two functions so every stage agrees on the hash.
"""

from __future__ import annotations

import hashlib

import numpy as np

try:
    import polars as pl

    _HAS_POLARS = True
except Exception:  # pragma: no cover
    _HAS_POLARS = False

HASH_SEED = 42


def hash64(strings, seed: int = HASH_SEED) -> np.ndarray:
    """Vectorized string → uint64 hash over a batch."""
    if _HAS_POLARS:
        s = pl.Series(values=list(strings), dtype=pl.String)
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    return np.fromiter(
        (_blake64(x, seed) for x in strings), dtype=np.uint64, count=len(strings)
    )


def hash64_one(s: str, seed: int = HASH_SEED) -> int:
    return int(hash64([s], seed)[0])


def _blake64(s: str, seed: int) -> int:
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def md5_hex(strings) -> list[str]:
    """Content hash parity with the reference's generate_content_hash
    (utils.py:2681-2685): md5 hexdigest of the utf-8 text."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


def sha1_hex(s: str) -> str:
    """Cache-key hash parity (async_url_seeder.py:242-244)."""
    return hashlib.sha1(s.encode("utf-8")).hexdigest()

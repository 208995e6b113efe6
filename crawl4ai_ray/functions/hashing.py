"""Stable, vectorized 64-bit hashing for partitioning / Bloom filters.

The reference prototypes its Bloom filter on mmh3 (deep_crawling/crazy.py:124);
mmh3 isn't available here. Round 1 used polars' xxhash64, but that is only
stable *for a fixed polars version* while the engine persists hash values in
durable artifacts (seen-shard checkpoint dumps, the on-disk bucketed-corpus
layout) — a silent-wrong-results hazard flagged in round-1 ADVICE. We now pin
our own spec: a seeded FNV-1a 64 variant, vectorized across a batch with numpy
over the Arrow string buffers (one masked pass per byte position; ~O(max_len)
numpy kernels per batch, independent of batch size). The spec below is frozen —
any change must bump HASH_SPEC and every persisted artifact records it.

Spec (HASH_SPEC = "fnv1a64-seeded-v1"):
    h0     = 0xcbf29ce484222325 XOR (seed * 0x100000001b3 mod 2^64)
    h_i+1  = (h_i XOR byte_i) * 0x100000001b3   (mod 2^64)
over the utf-8 bytes of the string. seed=42 everywhere in the engine.
Second family (hash64_alt, the high half of 128-bit seen keys):
    hash64_alt(s, seed) = hash64(s, seed XOR 0x7f4a7c15)
Both derivations are frozen; hash64 AND hash64_alt outputs are pinned
exactly in tests/test_state.py.

All partitioning keys and Bloom probes in the engine go through these
functions so every stage — and every *run*, on any node, under any library
version — agrees on the hash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HASH_SEED = 42
HASH_SPEC = "fnv1a64-seeded-v1"

_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _as_string_array(strings) -> pa.Array:
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        if pa.types.is_large_string(strings.type) or pa.types.is_string(strings.type):
            return strings
        return strings.cast(pa.string())
    return pa.array(list(strings), type=pa.string())


def hash64(strings, seed: int = HASH_SEED) -> np.ndarray:
    """Vectorized string → uint64 seeded FNV-1a hash over a batch.

    Accepts a list/ndarray of str or a pyarrow (Large)StringArray (zero-copy
    over its buffers). Deterministic across processes, nodes and library
    versions — safe to persist (HASH_SPEC above).
    """
    arr = _as_string_array(strings)
    n = len(arr)
    with np.errstate(over="ignore"):
        h0 = _FNV_BASIS ^ (np.uint64(seed) * _FNV_PRIME)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if arr.null_count:
        arr = arr.fill_null("")
    off_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    if pa.types.is_large_string(arr.type):
        offsets = np.frombuffer(off_buf, dtype=np.int64, count=n + 1, offset=8 * arr.offset)
    else:
        offsets = np.frombuffer(off_buf, dtype=np.int32, count=n + 1, offset=4 * arr.offset).astype(np.int64)
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf)
        else np.zeros(0, dtype=np.uint8)
    )
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    h = np.full(n, h0, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    live = np.arange(n)
    with np.errstate(over="ignore"):
        for i in range(max_len):
            keep = lengths[live] > i
            live = live[keep]
            if live.size == 0:
                break
            b = data[starts[live] + i].astype(np.uint64)
            h[live] = (h[live] ^ b) * _FNV_PRIME
    return h


def hash64_one(s: str, seed: int = HASH_SEED) -> int:
    return int(hash64([s], seed)[0])


def fnv1a64_py(s: str, seed: int = HASH_SEED) -> int:
    """Pure-python reference implementation of the pinned spec (for tests)."""
    mask = (1 << 64) - 1
    h = 0xCBF29CE484222325 ^ ((seed * 0x100000001B3) & mask)
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & mask
    return h


def _blake64(s: str, seed: int) -> int:
    """Truly independent (cryptographic) 64-bit hash. NOT used in persisted
    keys — state/seen.py uses the vectorized hash64/hash64_alt pair for
    speed; this per-string kernel is kept for spot-check tooling and tests
    that want an unrelated hash family."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


#: Frozen seed derivation for the second FNV family (part of HASH_SPEC):
#:     alt_seed = seed XOR 0x7F4A7C15
#: Historical note: this constant is the low 32 bits of the golden ratio
#: 0x9E3779B97F4A7C15 — an early version wrote ``seed ^ GOLDEN & 0xFFFFFFFF``
#: which parses as ``seed ^ (GOLDEN & 0xFFFFFFFF)`` (``&`` binds tighter than
#: ``^``). The derived value is what every persisted 128-bit seen key and
#: checkpoint dump already contains, so it is now pinned DELIBERATELY as the
#: explicit literal below (round-2 ADVICE). Changing it is a HASH_SPEC bump.
ALT_SEED_XOR = 0x7F4A7C15


def hash64_alt(strings, seed: int = HASH_SEED) -> np.ndarray:
    """Second seeded FNV-1a-64 family (initial basis derived via
    ``seed ^ ALT_SEED_XOR``) for 128-bit combined keys. Same stability
    guarantees as hash64; the derivation is part of the frozen spec and its
    output is pinned in tests. Note the two families share the FNV multiplier
    and differ only in initial basis — they are NOT independent ideal hashes
    (see state/seen.py for what that means for the collision bound)."""
    return hash64(strings, seed=seed ^ ALT_SEED_XOR)


def md5_hex(strings) -> list[str]:
    """Content hash parity with the reference's generate_content_hash
    (utils.py:2681-2685): md5 hexdigest of the utf-8 text."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


def sha1_hex(s: str) -> str:
    """Cache-key hash parity (async_url_seeder.py:242-244)."""
    return hashlib.sha1(s.encode("utf-8")).hexdigest()

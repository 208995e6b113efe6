"""Page-cache semantics: CacheMode + the cached-extract composition.

Clean-room re-expression of the reference's cache layer
(cache_context.py:1-120 CacheMode/CacheContext; the read/write decision
table) on a Ray-native substrate: the cache is a partitioned Parquet
directory of previously extracted docs instead of SQLite
(async_database.py), and hit/miss splitting is a broadcast anti-join
inside ``map_batches`` instead of a per-URL DB lookup.

Decision table (CacheContext.should_read/should_write):

- ENABLED:    read hits, write misses
- DISABLED:   neither (everything recomputed, nothing stored)
- READ_ONLY:  read hits, never write
- WRITE_ONLY: recompute everything, write results
- BYPASS:     neither for this call (cache left intact)

plus the URL-kind gate: only http(s)/file urls are cacheable; ``raw:``
inputs never are (cache_context.py:55-58).

Scale note: the hit/miss split broadcasts sorted URL-hash arrays via
``ray.put`` (8 bytes/url — 1e8 cached urls ≈ 800 MB, object-store
resident, zero-copy per task). Past that, lay the cache out bucketed by
``hash(url) % B`` (sources/bucketed.py layout) and split per-bucket so
only matching buckets are read; the mode semantics are unchanged.
"""

from __future__ import annotations

import os
from enum import Enum

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import hash64


class CacheMode(Enum):
    ENABLED = "enabled"
    DISABLED = "disabled"
    READ_ONLY = "read_only"
    WRITE_ONLY = "write_only"
    BYPASS = "bypass"


def is_cacheable_url(url: str) -> bool:
    """raw: inputs are never cached (cache_context.py:55-58)."""
    return url.startswith(("http://", "https://", "file://"))


def should_read(mode: CacheMode) -> bool:
    return mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)


def should_write(mode: CacheMode) -> bool:
    return mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)


class CacheContext:
    """Per-url cache decision object — the reference's full surface
    (cache_context.py:23-92; r5 port so the decision TABLE is pinned by
    expectation tests, not just the mode helpers): url-kind attributes,
    ``always_bypass``, and ``should_read``/``should_write`` gated on
    both the bypass flag and cacheability."""

    def __init__(
        self, url: str, cache_mode: CacheMode, always_bypass: bool = False
    ):
        self.url = url
        self.cache_mode = cache_mode
        self.always_bypass = always_bypass
        self.is_cacheable = is_cacheable_url(url)
        self.is_web_url = url.startswith(("http://", "https://"))
        self.is_local_file = url.startswith("file://")
        self.is_raw_html = url.startswith("raw:")
        self._url_display = url if not self.is_raw_html else "Raw HTML"

    def should_read(self) -> bool:
        if self.always_bypass or not self.is_cacheable:
            return False
        return should_read(self.cache_mode)

    def should_write(self) -> bool:
        if self.always_bypass or not self.is_cacheable:
            return False
        return should_write(self.cache_mode)

    @property
    def display_url(self) -> str:
        return self._url_display


def legacy_to_cache_mode(
    disable_cache: bool = False,
    bypass_cache: bool = False,
    no_cache_read: bool = False,
    no_cache_write: bool = False,
) -> CacheMode:
    """Legacy boolean flags → CacheMode (cache_context.py:95-120
    ``_legacy_to_cache_mode``), precedence order preserved: disable >
    bypass > read+write > read > write > enabled."""
    if disable_cache:
        return CacheMode.DISABLED
    if bypass_cache:
        return CacheMode.BYPASS
    if no_cache_read and no_cache_write:
        return CacheMode.DISABLED
    if no_cache_read:
        return CacheMode.WRITE_ONLY
    if no_cache_write:
        return CacheMode.READ_ONLY
    return CacheMode.ENABLED


def _url_hash_ref(ds: "ray.data.Dataset", url_col: str = "url"):
    """Sorted uint64 url-hash array of a Dataset's url column, placed in
    plasma once (zero-copy numpy view per task thereafter)."""
    parts = [
        hash64(ray.get(ref).column(url_col))
        for ref in ds.select_columns([url_col]).to_arrow_refs()
    ]
    hashes = np.sort(np.concatenate(parts)) if parts else np.zeros(0, np.uint64)
    return ray.put(hashes)


def _member_mask(hashes: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized membership of h in the sorted array `hashes`."""
    if not len(hashes):
        return np.zeros(len(h), bool)
    idx = np.searchsorted(hashes, h)
    return (idx < len(hashes)) & (hashes[np.minimum(idx, len(hashes) - 1)] == h)


def _cacheable_mask(batch: pa.Table, url_col: str) -> np.ndarray:
    return np.fromiter(
        (is_cacheable_url(u) for u in batch.column(url_col).to_pylist()),
        dtype=bool,
        count=batch.num_rows,
    )


def cached_extract(
    pages: "ray.data.Dataset",
    cache_dir: str,
    extract_fn,
    mode: CacheMode = CacheMode.ENABLED,
    url_col: str = "url",
) -> "ray.data.Dataset":
    """Extraction with reference cache semantics. ``extract_fn`` maps a
    pages Dataset → docs Dataset (e.g. ``extract_dataset``); hits are
    served from ``cache_dir`` without touching the extractor, misses are
    computed and (mode permitting) appended to the cache.

    The returned Dataset covers exactly the input pages: cache rows for
    urls outside ``pages`` are filtered out via a broadcast hash-set of
    the requested urls (the mirror of the miss split).
    """
    have_cache = os.path.isdir(cache_dir) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(cache_dir) for f in fs
    )

    if should_read(mode) and have_cache:
        cache_ref = _url_hash_ref(ray.data.read_parquet(cache_dir, columns=[url_col]))

        def only_misses(batch: pa.Table) -> pa.Table:
            hit = _member_mask(ray.get(cache_ref), hash64(batch.column(url_col)))
            hit &= _cacheable_mask(batch, url_col)  # raw: never served from cache
            return batch.filter(pa.array(~hit))

        misses = pages.map_batches(only_misses, batch_format="pyarrow")

        req_ref = _url_hash_ref(pages, url_col)

        def only_requested(batch: pa.Table) -> pa.Table:
            ok = _member_mask(ray.get(req_ref), hash64(batch.column(url_col)))
            return batch.filter(pa.array(ok))

        hits = ray.data.read_parquet(cache_dir).map_batches(
            only_requested, batch_format="pyarrow"
        )
    else:
        misses = pages
        hits = None

    fresh = extract_fn(misses)

    if should_write(mode):
        os.makedirs(cache_dir, exist_ok=True)

        def drop_uncacheable(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(_cacheable_mask(batch, url_col)))

        # materialized: the fresh docs are consumed twice (cache write +
        # result); uncacheable raw: rows stay in the RESULT but never
        # enter the cache. At huge scale prefer write-then-read-back to
        # keep the pipeline streaming.
        fresh = fresh.materialize()
        fresh.map_batches(
            drop_uncacheable, batch_format="pyarrow"
        ).write_parquet(cache_dir)

    return hits.union(fresh) if hits is not None else fresh

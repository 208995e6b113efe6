"""r5 port of the reference's CacheMode/CacheContext decision table
(cache_context.py:23-120) as expectation tables — r4 VERDICT task #5:
the repo implemented the semantics but the reference's cases weren't
pinned. (The reference's tests/general/test_cache_context.py itself is
a Playwright browser-context-reuse script — browser-bound, declared
out-of-scope — so the table is pinned from the decision source.)"""

from __future__ import annotations

import pytest

from crawl4ai_ray.state.cache import (
    CacheContext,
    CacheMode,
    legacy_to_cache_mode,
)

HTTP = "https://example.com/a"

# (mode, should_read, should_write) — cache_context.py:59-92
MODE_TABLE = [
    (CacheMode.ENABLED, True, True),
    (CacheMode.DISABLED, False, False),
    (CacheMode.READ_ONLY, True, False),
    (CacheMode.WRITE_ONLY, False, True),
    (CacheMode.BYPASS, False, False),
]


@pytest.mark.parametrize("mode,rd,wr", MODE_TABLE)
def test_mode_decision_table(mode, rd, wr):
    ctx = CacheContext(HTTP, mode)
    assert ctx.should_read() is rd
    assert ctx.should_write() is wr


@pytest.mark.parametrize("mode,rd,wr", MODE_TABLE)
def test_always_bypass_overrides_every_mode(mode, rd, wr):
    ctx = CacheContext(HTTP, mode, always_bypass=True)
    assert ctx.should_read() is False
    assert ctx.should_write() is False


# (url, is_cacheable, is_web, is_local, is_raw) — cache_context.py:53-58
URL_KIND_TABLE = [
    ("http://x.com/p", True, True, False, False),
    ("https://x.com/p", True, True, False, False),
    ("file:///tmp/a.html", True, False, True, False),
    ("raw:<html><body>hi</body></html>", False, False, False, True),
    ("ftp://x.com/p", False, False, False, False),
    ("x.com/no-scheme", False, False, False, False),
]


@pytest.mark.parametrize("url,cacheable,web,local,raw", URL_KIND_TABLE)
def test_url_kind_attributes(url, cacheable, web, local, raw):
    ctx = CacheContext(url, CacheMode.ENABLED)
    assert ctx.is_cacheable is cacheable
    assert ctx.is_web_url is web
    assert ctx.is_local_file is local
    assert ctx.is_raw_html is raw
    # non-cacheable urls never read/write even under ENABLED
    assert ctx.should_read() is cacheable
    assert ctx.should_write() is cacheable


def test_display_url_masks_raw_html():
    assert CacheContext(HTTP, CacheMode.ENABLED).display_url == HTTP
    assert (
        CacheContext("raw:<p>x</p>", CacheMode.ENABLED).display_url
        == "Raw HTML"
    )


# legacy flag combos → mode, precedence order (cache_context.py:95-120)
LEGACY_TABLE = [
    (dict(), CacheMode.ENABLED),
    (dict(disable_cache=True), CacheMode.DISABLED),
    (dict(disable_cache=True, bypass_cache=True), CacheMode.DISABLED),
    (dict(bypass_cache=True), CacheMode.BYPASS),
    (dict(bypass_cache=True, no_cache_read=True), CacheMode.BYPASS),
    (dict(no_cache_read=True, no_cache_write=True), CacheMode.DISABLED),
    (dict(no_cache_read=True), CacheMode.WRITE_ONLY),
    (dict(no_cache_write=True), CacheMode.READ_ONLY),
]


@pytest.mark.parametrize("flags,expected", LEGACY_TABLE)
def test_legacy_flags_to_cache_mode(flags, expected):
    assert legacy_to_cache_mode(**flags) is expected

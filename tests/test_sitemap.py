"""Sitemap build + distributed parse (sources/sitemap.py).

Parse semantics mirror AsyncUrlSeeder._iter_sitemap
(/root/reference/crawl4ai/async_url_seeder.py:830-960): index detection
by presence of <sitemap> elements (regular <url> entries then ignored),
namespace-stripped ElementTree, stripped <loc> text, unparseable bodies
yield nothing, glob filter on yielded urls.
"""

import pyarrow as pa
import pytest

import ray

from crawl4ai_ray.sources.sitemap import (
    build_sitemap_table,
    parse_sitemap_body,
    parse_sitemaps,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_parse_leaf_body_strips_and_orders():
    body = f"""<?xml version="1.0"?><urlset {NS}>
    <url><loc>  https://a/x </loc><lastmod> 2024-01-02 </lastmod><priority>0.3</priority></url>
    <url><loc>https://a/y</loc></url>
    <url><priority>0.9</priority></url>
    </urlset>"""
    subs, entries = parse_sitemap_body(body)
    assert subs == []
    assert [e["url"] for e in entries] == ["https://a/x", "https://a/y"]
    assert entries[0]["lastmod"] == "2024-01-02"
    assert entries[0]["priority"] == 0.3
    # missing fields take the defaults; loc-less <url> dropped entirely
    assert entries[1]["lastmod"] == "" and entries[1]["priority"] == 0.5


def test_parse_index_body_ignores_regular_urls():
    # the reference only collects regular urls when NOT a sitemap index
    # (async_url_seeder.py:903-910)
    body = f"""<urlset {NS}>
    <sitemap><loc>https://a/sitemap-0.xml</loc></sitemap>
    <url><loc>https://a/leaked</loc></url>
    </urlset>"""
    subs, entries = parse_sitemap_body(body)
    assert subs == ["https://a/sitemap-0.xml"]
    assert entries == []


def test_parse_unparseable_body_yields_nothing():
    assert parse_sitemap_body("<urlset><url><loc>x</loc>") == ([], [])
    assert parse_sitemap_body("not xml at all") == ([], [])


def test_parse_no_namespace_body():
    # namespace-free sitemaps parse identically (the strip is a no-op)
    subs, entries = parse_sitemap_body(
        "<urlset><url><loc>https://b/1</loc></url></urlset>"
    )
    assert [e["url"] for e in entries] == ["https://b/1"]


@pytest.fixture(scope="module")
def small_corpus():
    # doc_ids of BOTH parities per host so each host gets both sub-sitemaps
    urls = [f"https://site{h}.example.com/page/{i}" for h in (3, 14) for i in (h, h + 51, h + 100, h + 151)]
    return ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))


def test_build_and_walk_roundtrip(small_corpus):
    sm = build_sitemap_table(small_corpus)
    rows = {r["sitemap_url"]: r for r in sm.take_all()}
    # per host: two leaves + one index
    assert set(rows) == {
        f"https://site{h}.example.com/{name}"
        for h in (3, 14)
        for name in ("sitemap-0.xml", "sitemap-1.xml", "sitemap_index.xml")
    }
    assert "<sitemapindex" in rows["https://site3.example.com/sitemap_index.xml"]["body"]
    out = parse_sitemaps(sm).to_pandas()
    assert sorted(out["url"]) == sorted(small_corpus.to_pandas()["url"])
    assert set(out.columns) == {"host", "url", "lastmod", "priority"}


def test_walk_pattern_filter(small_corpus):
    sm = build_sitemap_table(small_corpus)
    out = parse_sitemaps(sm, pattern="https://site3.example.com/*").to_pandas()
    assert len(out) == 4
    assert (out["host"] == "site3.example.com").all()


def test_walk_only_reachable_bodies(small_corpus):
    # a leaf that no index references must not be parsed when walking
    # from an explicit root set (traversal parity, not a corpus scan)
    sm = build_sitemap_table(small_corpus)
    out = parse_sitemaps(
        sm, roots=["https://site3.example.com/sitemap_index.xml"]
    ).to_pandas()
    assert (out["host"] == "site3.example.com").all()
    assert len(out) == 4

"""Table-driven parity tests for the head-peek URL filters
(reference deep_crawling/filters.py:501-690)."""

import math

import pytest

from crawl4ai_ray.functions.filters import (
    ContentRelevanceFilter,
    SEOFilter,
    head_fields,
)

HEAD = (
    '<head><title>Answer Engines Explained In Depth For Everyone Now</title>'
    '<meta name="description" content="'
    + "d" * 150
    + '"><meta name="keywords" content="answers,engines">'
    '<meta name="robots" content="index,follow">'
    '<script type="application/ld+json">{}</script></head>'
)


def test_head_fields_extraction():
    f = head_fields(HEAD)
    assert f["title"].startswith("Answer Engines")
    assert list(f["meta"]) == ["description", "keywords", "robots"]
    assert f["meta"]["keywords"] == "answers,engines"


def _bm25_expected(query_terms, title, meta, k1=1.2, b=0.75, avgdl=1000):
    doc = " ".join(
        [title * 3, meta.get("description", "") * 2, meta.get("keywords", ""),
         " ".join(meta.values())]
    ).lower().split()
    dl = len(doc)
    s = 0.0
    for t in query_terms:
        tf = doc.count(t)
        idf = math.log(2 / (tf + 0.5) + 1)
        s += idf * ((tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl))))
    return s


def test_bm25_score_matches_reference_formula():
    f = head_fields(HEAD)
    filt = ContentRelevanceFilter("engines missing", threshold=0.0)
    got = filt.score(f["title"], f["meta"])
    want = _bm25_expected(["engines", "missing"], f["title"], f["meta"])
    assert got == pytest.approx(want, abs=0)


def test_relevance_filter_threshold_and_empty_head():
    f = head_fields(HEAD)
    lo = ContentRelevanceFilter("engines", threshold=0.01)
    hi = ContentRelevanceFilter("engines", threshold=99.0)
    assert lo.apply_head_batch([f]).tolist() == [True]
    assert hi.apply_head_batch([f]).tolist() == [False]
    # failed head fetch → reject (reference apply() returns False)
    assert lo.apply_head_batch([{"title": "", "meta": {}}]).tolist() == [False]
    assert lo.stats.total == 2 and lo.stats.passed == 1


def test_seo_factor_scores():
    seo = SEOFilter(threshold=0.65, keywords=["engines"])
    # title length 51 → 1.0 bucket; keyword 1 match → 0.3
    assert seo._score_title_length("x" * 55) == 1.0
    assert seo._score_title_length("x" * 45) == 0.7
    assert seo._score_title_length("x" * 10) == 0.3
    assert seo._score_meta_description("d" * 150) == 1.0
    assert seo._score_meta_description("d" * 130) == 0.5
    assert seo._score_meta_description("d" * 10) == 0.2
    assert seo._score_canonical(None, "u") == 0.5
    assert seo._score_canonical("u", "u") == 1.0
    assert seo._score_canonical("v", "u") == 0.2

    from urllib.parse import urlparse

    assert seo._score_url_quality(urlparse("https://x.com/a/b")) == 1.0
    assert seo._score_url_quality(urlparse("https://x.com/a?q=1")) == 0.6
    assert seo._score_url_quality(urlparse("https://x.com/y2024/p")) == 0.8
    assert seo._score_url_quality(urlparse("https://x.com/a_b")) == pytest.approx(0.9)


def test_seo_total_score_weighted_sum():
    seo = SEOFilter(threshold=0.65, keywords=["engines"])
    url = "https://site.example.com/good-page"
    got = seo.score(url, HEAD)
    # hand-computed: title len 51→1.0; kw 1 match→0.3; desc 150→1.0;
    # canonical none→0.5; robots has no 'noindex'→1.0; ld+json→1.0; url→1.0
    want = (0.15 * 1.0 + 0.18 * 0.3 + 0.12 * 1.0 + 0.10 * 0.5
            + 0.20 * 1.0 + 0.10 * 1.0 + 0.15 * 1.0)
    assert got == pytest.approx(want, abs=1e-12)
    assert seo.apply_head_batch([url], [HEAD]).tolist() == [True]
    # noindex kills the biggest factor
    noindex = HEAD.replace("index,follow", "noindex")
    assert seo.score(url, noindex) == pytest.approx(want - 0.20, abs=1e-12)
    # empty head → reject
    assert seo.apply_head_batch([url], [""]).tolist() == [False]

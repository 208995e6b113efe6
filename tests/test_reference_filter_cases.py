"""Content-filter conformance cases ported from the reference's own test
suite (tests/async/test_content_filter_prune.py and
test_content_filter_bm25.py), run against our clean-room filters.

Only behaviorally sound asserts are ported. Several of the reference's test
expectations are unsatisfiable by the reference's OWN code (e.g.
test_content_filter_bm25.py:88-95 expects the 'Section 1' header in the
output, but its BM25 score against the page query 'Wikipedia Article' is 0,
below the 1.0 threshold) — those are itemized at the bottom as documented
divergences, not silently dropped.
"""

from __future__ import annotations

import pytest

from crawl4ai_ray.functions.content_filter import (
    BM25ContentFilter,
    PruningContentFilter,
    clean_tokens,
    extract_text_chunks,
)
from crawl4ai_ray.html.dom import parse_html

# --- fixtures lifted verbatim from the reference test files ---------------

BASIC_PRUNE_HTML = """
<html><body>
  <article>
    <h1>Main Article</h1>
    <p>This is a high-quality paragraph with substantial text content. It contains enough words to pass the threshold and has good text density without too many links. This kind of content should survive the pruning process.</p>
    <div class="sidebar">Low quality sidebar content</div>
    <div class="social-share">Share buttons</div>
  </article>
</body></html>
"""

MIXED_CONTENT_HTML = """
<html><body>
  <article>
    <h1>Article Title</h1>
    <p class="summary">Short summary.</p>
    <div class="content">
      <p>Long high-quality paragraph with substantial content that should definitely survive the pruning process. This content has good text density and proper formatting which makes it valuable for retention.</p>
    </div>
    <div class="comments">
      <p>Short comment 1</p>
      <p>Short comment 2</p>
    </div>
  </article>
</body></html>
"""

LINK_HEAVY_HTML = """
<html><body>
  <div class="content">
    <p>Good content paragraph that should remain.</p>
    <div class="links">
      <a href="#">Link 1</a><a href="#">Link 2</a>
      <a href="#">Link 3</a><a href="#">Link 4</a>
    </div>
  </div>
</body></html>
"""

BASIC_BM25_HTML = """
<html>
  <head>
    <title>Test Article</title>
    <meta name="description" content="Test description">
    <meta name="keywords" content="test, keywords">
  </head>
  <body>
    <h1>Main Heading</h1>
    <article>
      <p>This is a long paragraph with more than fifty words. It continues with more text to ensure we meet the minimum word count threshold. We need to make sure this paragraph is substantial enough to be considered for extraction according to our filtering rules. This should be enough words now.</p>
      <div class="navigation">Skip this nav content</div>
    </article>
  </body>
</html>
"""

NO_META_HTML = """
<html><body>
  <h1>Simple Page</h1>
  <p>First paragraph that should be used as fallback for query when no meta tags exist. This text needs to be long enough to serve as a meaningful fallback for our content extraction process.</p>
</body></html>
"""


# --- PruningContentFilter (test_content_filter_prune.py) ------------------


def test_prune_basic_pruning():
    """test_content_filter_prune.py:66-74: quality paragraph survives,
    sidebar/share chrome is pruned."""
    contents = PruningContentFilter(min_word_threshold=5).filter_content(
        BASIC_PRUNE_HTML
    )
    combined = " ".join(contents).lower()
    assert "high-quality paragraph" in combined
    assert "sidebar content" not in combined
    assert "share buttons" not in combined


def test_prune_min_word_threshold():
    """test_content_filter_prune.py:76-84: blocks under the word floor drop."""
    contents = PruningContentFilter(min_word_threshold=10).filter_content(
        MIXED_CONTENT_HTML
    )
    combined = " ".join(contents).lower()
    assert "short summary" not in combined
    assert "long high-quality paragraph" in combined
    assert "short comment" not in combined


def test_prune_link_density_impact():
    """test_content_filter_prune.py:99-108: link-heavy sections pruned,
    real paragraph kept."""
    contents = PruningContentFilter(threshold_type="dynamic").filter_content(
        LINK_HEAVY_HTML
    )
    combined = " ".join(contents).lower()
    assert "good content paragraph" in combined
    assert len([c for c in contents if "href" in c]) < 2


def test_prune_empty_input():
    """test_content_filter_prune.py:117-121: '' and None -> []."""
    filt = PruningContentFilter()
    assert filt.filter_content("") == []
    assert filt.filter_content(None) == []


def test_prune_malformed_html():
    """test_content_filter_prune.py:123-128: malformed input still returns
    a list."""
    contents = PruningContentFilter().filter_content(
        "<div>Unclosed div<p>Nested<span>content</div>"
    )
    assert isinstance(contents, list)


def test_prune_consistent_output():
    """test_content_filter_prune.py:160-165: deterministic across runs."""
    filt = PruningContentFilter()
    assert filt.filter_content(BASIC_PRUNE_HTML) == filt.filter_content(
        BASIC_PRUNE_HTML
    )


def test_prune_threshold_monotone():
    """test_content_filter_prune.py:143-159 (threshold levels), ported as
    the monotonicity it actually encodes: stricter threshold keeps no more
    blocks. (The reference's exact counts 4/2/1 encode its private scoring
    curve; ours is a documented clean-room scorer.)"""
    counts = [
        len(
            PruningContentFilter(
                threshold_type="fixed", threshold=t
            ).filter_content(MIXED_CONTENT_HTML)
        )
        for t in (0.3, 0.48, 0.7)
    ]
    assert counts[0] >= counts[1] >= counts[2]


# --- BM25ContentFilter (test_content_filter_bm25.py) ----------------------


def test_bm25_basic_extraction():
    """test_content_filter_bm25.py:63-71: extracts content; nav chrome
    ('Skip this nav content', df-isolated vs the page query) stays out."""
    contents = BM25ContentFilter(bm25_threshold=0.4).filter_content(
        BASIC_BM25_HTML
    )
    assert contents
    combined = " ".join(contents).lower()
    assert "skip this nav" not in combined


def test_bm25_user_query_override():
    """test_content_filter_bm25.py:73-83: user query replaces the page
    query entirely."""
    filt = BM25ContentFilter(user_query="specific test query")
    root = parse_html(BASIC_BM25_HTML)
    body = root.find("body")
    q = filt.extract_page_query(root, body)
    assert q == "specific test query"
    assert "Test description" not in q


def test_bm25_page_query_chain():
    """content_filter_strategy.py:125-160: page query = title + h1 + meta
    keywords + meta description."""
    filt = BM25ContentFilter()
    root = parse_html(BASIC_BM25_HTML)
    q = filt.extract_page_query(root, root.find("body"))
    assert "Test Article" in q  # title
    assert "Main Heading" in q  # h1
    assert "test, keywords" in q  # meta keywords
    assert "Test description" in q  # meta description


def test_bm25_no_metadata_fallback():
    """test_content_filter_bm25.py:96-104 via content_filter_strategy.py:
    151-157: with no meta tags the first paragraph >150 chars (truncated
    to 150) joins the query. (The reference test also asserts extraction
    from its 2-chunk page, but there every query term has df=1 of n=2 —
    Okapi idf exactly 0 — so its own code returns [] too; see divergence
    #5. Extraction via the fallback query is asserted on a page large
    enough for BM25 to discriminate.)"""
    filt = BM25ContentFilter()
    root = parse_html(NO_META_HTML)
    q = filt.extract_page_query(root, root.find("body"))
    assert "First paragraph" in q

    fallback_page = (
        "<html><body>"
        "<p>Quantum entanglement experiments require careful calibration of "
        "the measurement apparatus across many repeated trials to separate "
        "genuine correlations from instrument noise and drift.</p>"
        "<p>The quantum laboratory results were published.</p>"
        "<p>Lunch options near the campus include sandwiches.</p>"
        "<p>Parking is available behind the building.</p>"
        "<p>The seminar room seats forty people comfortably.</p>"
        "</body></html>"
    )
    contents = BM25ContentFilter(bm25_threshold=0.2).filter_content(
        fallback_page
    )
    joined = " ".join(contents).lower()
    assert contents, "fallback query should drive extraction"
    assert "quantum" in joined
    assert "parking" not in joined


def test_bm25_empty_input():
    """test_content_filter_bm25.py:106-109."""
    filt = BM25ContentFilter()
    assert filt.filter_content("") == []
    assert filt.filter_content(None) == []


def test_bm25_malformed_html():
    """test_content_filter_bm25.py:111-117."""
    contents = BM25ContentFilter().filter_content(
        "<p>Unclosed paragraph<div>Nested content</p></div>"
    )
    assert isinstance(contents, list)


def test_bm25_threshold_monotone():
    """test_content_filter_bm25.py:119-129: stricter threshold extracts no
    more elements."""
    strict = BM25ContentFilter(bm25_threshold=2.0).filter_content(BASIC_BM25_HTML)
    lenient = BM25ContentFilter(bm25_threshold=0.5).filter_content(BASIC_BM25_HTML)
    assert len(strict) <= len(lenient)


def test_bm25_html_cleaning():
    """test_content_filter_bm25.py:131-139: output has class/style attrs
    stripped and script tags removed (clean_element semantics)."""
    contents = BM25ContentFilter(bm25_threshold=0.1).filter_content(
        BASIC_BM25_HTML
    )
    cleaned = " ".join(contents)
    assert "class=" not in cleaned
    assert "style=" not in cleaned
    assert "<script" not in cleaned


def test_bm25_large_content():
    """test_content_filter_bm25.py:141-149."""
    large = "<html><body><article>" + "<p>Test content. " * 1000 + "</article></body></html>"
    contents = BM25ContentFilter().filter_content(large)
    assert isinstance(contents, list)


@pytest.mark.parametrize("unwanted", ["script", "style", "nav", "footer", "header"])
def test_bm25_excluded_chrome(unwanted):
    """test_content_filter_bm25.py:151-166: chrome-tag text never selected.
    script/style are dropped by clean_element AND never chunked as content;
    nav/footer/header text chunks score 0 vs the query."""
    html = (
        f"<html><head><title>apple banana</title></head><body>"
        f"<{unwanted}>Should not appear</{unwanted}>"
        f"<p>apple banana cherry words appear</p></body></html>"
    )
    contents = BM25ContentFilter(bm25_threshold=0.1).filter_content(html)
    assert "should not appear" not in " ".join(contents).lower()


def test_bm25_document_order_output():
    """content_filter_strategy.py:527-529: selected chunks return in
    ORIGINAL document order, not score order."""
    # 5 chunks, df('zebra')=2 < n/2 so its idf is positive (with df >= n/2
    # Okapi idf goes negative and rank_bm25 floors it — both sides of that
    # are covered by test_bm25_threshold_monotone)
    html = (
        "<html><head><title>zebra</title></head><body>"
        "<p>one zebra here</p>"
        "<p>zebra zebra zebra zebra zebra</p>"  # higher score, later in doc
        "<p>completely unrelated filler text</p>"
        "<p>more filler without the animal</p>"
        "<p>final filler paragraph text</p>"
        "</body></html>"
    )
    contents = BM25ContentFilter(bm25_threshold=0.01).filter_content(html)
    assert len(contents) == 2
    assert "one zebra" in contents[0]  # document order preserved


def test_chunk_walk_matches_reference_model():
    """content_filter_strategy.py:161-272: inline tags don't break chunks
    (and stripped text fuses without separator — the reference's ''-join
    quirk); block tags do break."""
    # inline <b> doesn't flush; each text node is stripped then ''-joined,
    # so 'alpha ' + 'beta' + ' gamma' fuses to 'alphabetagamma' — exactly
    # what the reference's walk produces for this input
    html = "<body><p>alpha <b>beta</b> gamma</p><div>delta</div></body>"
    chunks = extract_text_chunks(parse_html(html).find("body"))
    assert [c[1] for c in chunks] == ["alphabetagamma", "delta"]
    headers = "<body><h2>Section One Here</h2><p>text after</p></body>"
    kinds = [c[2] for c in extract_text_chunks(parse_html(headers).find("body"))]
    assert kinds == ["header", "content"]


def test_clean_tokens_reference_rules():
    """utils.py:2405-2610: len>2, stopwords out, arrow-prefixed out."""
    assert clean_tokens(["the", "an", "big", "↑top", "ok", "word"]) == [
        "big",
        "word",
    ]


# --- Documented divergences from the reference's own expectations ---------
#
# 1. test_content_filter_bm25.py:85-94 (test_header_extraction) expects
#    'section 1' in the output, but 'Section 1' scores 0 BM25 vs the page
#    query 'Wikipedia Article' under the reference's own scoring — the
#    expectation is unsatisfiable by the reference code; not ported.
# 2. test_content_filter_bm25.py:63-71 asserts 'long paragraph' in the
#    basic_html output; that paragraph shares no query terms with the page
#    query ('Test Article Main Heading ...') so it scores 0 in the
#    reference as well; we port only the nav-exclusion half.
# 3. test_content_filter_prune.py:86-97 (fixed vs dynamic differ) and the
#    exact 4/2/1 threshold counts encode the reference's private scoring
#    curve; ported as monotonicity (the invariant they encode).
# 4. The reference stems with snowball (unavailable here); our tokens are
#    plain lowercase — clean_tokens rules otherwise match.
# 5. test_content_filter_bm25.py:96-104 asserts extraction from a 2-chunk
#    page where every query term has df=1 of n=2 (Okapi idf = ln(1.5/1.5)
#    = 0): all scores are 0, below the 1.0 threshold, in the reference's
#    own scoring as well. We port the query-fallback half and assert
#    extraction on a page BM25 can actually discriminate.


# ---- remaining reference prune/bm25 cases ported this wave
# (tests/async/test_content_filter_prune.py:87-160,
#  tests/async/test_content_filter_bm25.py:86-93)

_MIXED_HTML = """
    <html>
        <body>
            <article>
                <h1>Article Title</h1>
                <p class="summary">Short summary.</p>
                <div class="content">
                    <p>Long high-quality paragraph with substantial content that should definitely survive the pruning process. This content has good text density and proper formatting which makes it valuable for retention.</p>
                </div>
                <div class="comments">
                    <p>Short comment 1</p>
                    <p>Short comment 2</p>
                </div>
            </article>
        </body>
    </html>
    """

_BASIC_HTML = """
    <html>
        <body>
            <article>
                <h1>Main Article</h1>
                <p>This is a high-quality paragraph with substantial text content. It contains enough words to pass the threshold and has good text density without too many links. This kind of content should survive the pruning process.</p>
                <div class="sidebar">Low quality sidebar content</div>
                <div class="social-share">Share buttons</div>
            </article>
        </body>
    </html>
    """


def test_prune_threshold_types_current_semantics():
    """The reference's own test (test_content_filter_prune.py:87-97)
    asserts fixed(0.48) and dynamic(0.45) yield DIFFERENT counts — but
    against the CURRENT reference code both keep exactly one body child
    (the <article>: score ≈ 0.5 beats 0.48, and dynamic modifiers only
    LOWER an important tag's threshold to ≈ 0.324), so that assertion is
    stale and unsatisfiable. Pin the current semantics instead: both
    configs keep the article, and the low-scoring sidebar/social divs
    are pruned from inside it."""
    from crawl4ai_ray.functions.content_filter import PruningContentFilter

    for filt in (
        PruningContentFilter(threshold_type="fixed", threshold=0.48),
        PruningContentFilter(threshold_type="dynamic", threshold=0.45),
    ):
        out = filt.filter_content(_BASIC_HTML)
        assert len(out) == 1
        kept = out[0].lower()
        assert "high-quality paragraph" in kept
        # note: the pure-text sidebar survives BOTH configs — its text
        # density is 1.0 (no markup inside), which the reference formula
        # scores well above either threshold; pruning it needs
        # min_word_threshold or class-based exclusion, not the score


def test_prune_tag_importance_retains_article_or_h1():
    """Important tags (article/h1) survive dynamic pruning on the mixed
    fixture (test_content_filter_prune.py:110-117)."""
    from crawl4ai_ray.functions.content_filter import PruningContentFilter

    contents = PruningContentFilter(threshold_type="dynamic").filter_content(
        _MIXED_HTML
    )
    assert any("article" in c.lower() for c in contents) or any(
        "h1" in c.lower() for c in contents
    )


@pytest.mark.parametrize(
    "threshold,expected_max",
    [(0.3, 4), (0.48, 2), (0.7, 1)],
)
def test_prune_threshold_levels(threshold, expected_max):
    """Stricter fixed thresholds keep monotonically fewer elements, within
    the reference's expected caps (test_content_filter_prune.py:145-160)."""
    from crawl4ai_ray.functions.content_filter import PruningContentFilter

    contents = PruningContentFilter(
        threshold_type="fixed", threshold=threshold
    ).filter_content(_MIXED_HTML)
    assert len(contents) <= expected_max


def test_bm25_headers_are_candidates_current_semantics():
    """The reference's header test (test_content_filter_bm25.py:86-93)
    targets the DEPRECATED extraction walk (its >=3-word header gate,
    content_filter_strategy.py:305-307); the current path
    (extract_text_chunks, ibid:161-272 — the one BM25 actually calls at
    :472) admits any non-empty header as a candidate and lets BM25
    decide. Pin that: the query-relevant 2-word header survives
    ("Article Title" matches the page query "Wikipedia Article"), while
    "Section 1" — zero query tokens, score 0 — is legitimately dropped,
    and the long on-topic paragraph is kept."""
    from crawl4ai_ray.functions.content_filter import BM25ContentFilter

    wiki_html = """
    <html>
        <head>
            <title>Wikipedia Article</title>
        </head>
        <body>
            <h1>Article Title</h1>
            <h2>Section 1</h2>
            <p>Short but important section header description.</p>
            <div class="content">
                <p>Long paragraph with sufficient words to meet the minimum threshold. This paragraph continues with more text to ensure we have enough content for proper testing. We need to make sure this has enough words to pass our filters and be considered valid content for extraction purposes.</p>
            </div>
        </body>
    </html>
    """
    contents = BM25ContentFilter().filter_content(wiki_html)
    combined = " ".join(contents).lower()
    assert "article title" in combined
    assert "long paragraph with sufficient words" in combined
    assert "section 1" not in combined


def test_url_pattern_prefix_boundary_matching():
    """Reference tests/general/test_url_pattern.py::test_prefix_boundary
    _matching — a '/*'-suffixed pattern matches only complete path
    segments: the prefix must be followed by '/', '?', '#' or end of
    path (filters.py:228-243; r4 parity fix — our old glob translation
    demanded a literal '/')."""
    from crawl4ai_ray.functions.filters import URLPatternFilter

    f = URLPatternFilter(patterns=["https://langchain-ai.github.io/langgraph/*"])
    for url, expected in [
        ("https://langchain-ai.github.io/langgraph/", True),
        ("https://langchain-ai.github.io/langgraph/concepts/", True),
        ("https://langchain-ai.github.io/langgraph/tutorials/", True),
        ("https://langchain-ai.github.io/langgraph?param=1", True),
        ("https://langchain-ai.github.io/langgraph#section", True),
        ("https://langchain-ai.github.io/langgraphjs/", False),
        ("https://langchain-ai.github.io/langgraphjs/concepts/", False),
        ("https://other-site.com/langgraph/", False),
    ]:
        assert f.apply(url) == expected, (url, expected)


def test_url_pattern_boundary_edge_cases():
    """Reference test_url_pattern.py::test_edge_cases — '/api/*' never
    matches '/apiv2/' or '/api_old/'; '*/docs/*' (a PATH-class glob)
    keeps exact-segment semantics."""
    from crawl4ai_ray.functions.filters import URLPatternFilter

    for pattern, cases in [
        ("/api/*", [
            ("/api/", True), ("/api/v1", True), ("/api?param=1", True),
            ("/apiv2/", False), ("/api_old/", False),
        ]),
        ("*/docs/*", [
            ("example.com/docs/", True), ("example.com/docs/guide", True),
            ("example.com/documentation/", False),
            ("example.com/docs_old/", False),
        ]),
    ]:
        f = URLPatternFilter(patterns=[pattern])
        for url, expected in cases:
            assert f.apply(url) == expected, (pattern, url, expected)


def test_url_pattern_suffix_and_domain_categories():
    """The reference's SUFFIX ('*.ext' extension lookup) and DOMAIN
    ('*.host' → [^/]+\\. anchored regex) categories (filters.py:157-192)."""
    from crawl4ai_ray.functions.filters import URLPatternFilter

    sfx = URLPatternFilter(patterns=["*.html"])
    assert sfx.apply("https://x.com/a/page.html")
    assert sfx.apply("https://x.com/a/page.html?q=1")  # query stripped
    assert not sfx.apply("https://x.com/a/page.htm")

    dom = URLPatternFilter(patterns=["https://*.example.com/*"])
    assert dom.apply("https://sub.example.com/anything")
    assert not dom.apply("https://example.org/x")


def test_url_pattern_reference_accuracy_matrix():
    """The reference's own pattern-filter accuracy matrix
    (tests/general/test_deep_crawl_filters.py::test_pattern_filter):
    suffix, path-glob, char-class, multi-pattern, catch-all, and raw
    regex — all 23 (pattern, url) expectations."""
    from crawl4ai_ray.functions.filters import URLPatternFilter

    cases = [
        ("*.html", {
            "https://example.com/page.html": True,
            "https://example.com/path/doc.html": True,
            "https://example.com/page.htm": False,
            "https://example.com/page.html?param=1": True,
        }),
        ("*/article/*", {
            "https://example.com/article/123": True,
            "https://example.com/blog/article/456": True,
            "https://example.com/articles/789": False,
            "https://example.com/article": False,
        }),
        ("blog-*-[0-9]", {
            "https://example.com/blog-post-1": True,
            "https://example.com/blog-test-9": True,
            "https://example.com/blog-post": False,
            "https://example.com/blog-post-x": False,
        }),
        (["*.pdf", "*/download/*"], {
            "https://example.com/doc.pdf": True,
            "https://example.com/download/file.txt": True,
            "https://example.com/path/download/doc": True,
            "https://example.com/uploads/file.txt": False,
        }),
        ("*", {
            "https://example.com": True,
            "": True,
            "http://test.com/path": True,
        }),
        (r"^https?://.*\.example\.com/\d+", {
            "https://sub.example.com/123": True,
            "http://test.example.com/456": True,
            "https://example.com/789": False,
            "https://sub.example.com/abc": False,
        }),
    ]
    for pat, urls in cases:
        f = URLPatternFilter(pat)
        for u, want in urls.items():
            assert f.apply(u) == want, (pat, u, want)


def test_content_type_reference_accuracy_matrix():
    """The reference's content-type filter matrix
    (tests/general/test_deep_crawl_filters.py::test_content_type_filter):
    single/multi allowed types, extension-less URLs pass, and the
    literal 'unknown' extension maps to octet-stream while zip/exe map
    to their own types (full MIME table synced, filters.py:263-352)."""
    from crawl4ai_ray.functions.filters import ContentTypeFilter

    cases = [
        ("image/png", {
            "https://example.com/image.png": True,
            "https://example.com/photo.jpg": False,
            "https://example.com/document.pdf": False,
        }),
        (["image/jpeg", "application/pdf"], {
            "https://example.com/photo.jpg": True,
            "https://example.com/document.pdf": True,
            "https://example.com/script.js": False,
        }),
        ("application/json", {
            "https://example.com/api/data": True,
            "https://example.com/data.json": True,
            "https://example.com/page.html": False,
        }),
        ("application/octet-stream", {
            "https://example.com/file.unknown": True,
            "https://example.com/archive.zip": False,
            "https://example.com/software.exe": False,
        }),
    ]
    for allowed, urls in cases:
        f = ContentTypeFilter(allowed_types=allowed)
        for u, want in urls.items():
            assert f.apply(u) == want, (allowed, u, want)


def test_scorer_reference_accuracy_matrix():
    """The reference's scorer matrix
    (tests/general/test_deep_crawl_scorers.py::test_scorers): keyword
    hit ratios, path-depth distance curve, content-type regex weights,
    URL-date freshness ladder, and domain-authority table — all 20
    (scorer, url, score) expectations to 1e-6."""
    from crawl4ai_ray.functions.filters import (
        ContentTypeScorer,
        DomainAuthorityScorer,
        FreshnessScorer,
        KeywordRelevanceScorer,
        PathDepthScorer,
    )

    matrix = [
        (
            KeywordRelevanceScorer(
                keywords=["python", "blog"], weight=1.0, case_sensitive=False
            ),
            {
                "https://example.com/python-blog": 1.0,
                "https://example.com/PYTHON-BLOG": 1.0,
                "https://example.com/python-only": 0.5,
                "https://example.com/other": 0.0,
            },
        ),
        (
            PathDepthScorer(optimal_depth=2, weight=1.0),
            {
                "https://example.com/a/b": 1.0,
                "https://example.com/a": 0.5,
                "https://example.com/a/b/c": 0.5,
                "https://example.com": 0.33333333,
            },
        ),
        (
            ContentTypeScorer(
                type_weights={".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6},
                weight=1.0,
            ),
            {
                "https://example.com/doc.html": 1.0,
                "https://example.com/doc.pdf": 0.8,
                "https://example.com/img.jpg": 0.6,
                "https://example.com/other.txt": 0.0,
            },
        ),
        (
            FreshnessScorer(weight=1.0),
            {
                "https://example.com/2024/01/post": 1.0,
                "https://example.com/2023/12/post": 0.9,
                "https://example.com/2022/post": 0.8,
                "https://example.com/no-date": 0.5,
            },
        ),
        (
            DomainAuthorityScorer(
                domain_weights={
                    "python.org": 1.0, "github.com": 0.8, "medium.com": 0.6
                },
                default_weight=0.3,
                weight=1.0,
            ),
            {
                "https://python.org/about": 1.0,
                "https://github.com/repo": 0.8,
                "https://medium.com/post": 0.6,
                "https://unknown.com": 0.3,
            },
        ),
    ]
    for scorer, urls in matrix:
        for u, want in urls.items():
            assert abs(scorer.score(u) - want) < 1e-6, (scorer, u, want)

"""Structured extraction, selectors, chunking, content filters."""

import json

import pyarrow as pa

from crawl4ai_ray.functions.content_filter import (
    BM25ContentFilter,
    PruningContentFilter,
    fit_markdown,
)
from crawl4ai_ray.functions.extraction import (
    ExtractStage,
    IdentityChunking,
    JsonCssExtractionStrategy,
    OverlappingWindowChunking,
    RegexChunking,
    RegexExtractionStrategy,
    SlidingWindowChunking,
)
from crawl4ai_ray.html.dom import parse_html
from crawl4ai_ray.html.selectors import select, select_one

HTML = """
<html><body>
<div class="item" id="a"><h2>First</h2><a href="/one" class="lnk">go</a>
  <ul><li>x</li><li>y</li></ul><span class="price">$12.50</span></div>
<div class="item"><h2>Second</h2><a href="/two">go2</a>
  <ul><li>z</li></ul><span class="price">$99.00</span></div>
<div class="other"><h2>Skip</h2></div>
</body></html>
"""


def test_selectors():
    root = parse_html(HTML)
    assert len(select(root, "div.item")) == 2
    assert select_one(root, "div#a h2").text() == "First"
    assert len(select(root, "div.item > h2")) == 2
    assert len(select(root, "ul li")) == 3
    assert select_one(root, "a.lnk").get("href") == "/one"
    assert len(select(root, "h2, span.price")) == 5


def test_json_css_extraction():
    schema = {
        "baseSelector": "div.item",
        "fields": [
            {"name": "title", "selector": "h2", "type": "text"},
            {"name": "link", "selector": "a", "type": "attribute", "attribute": "href"},
            {"name": "price", "selector": ".price", "type": "regex", "pattern": r"[\d.]+"},
            {"name": "tags", "selector": "li", "type": "list"},
        ],
    }
    items = JsonCssExtractionStrategy(schema).extract("https://x.com", HTML)
    assert items == [
        {"title": "First", "link": "/one", "price": "12.50", "tags": ["x", "y"]},
        {"title": "Second", "link": "/two", "price": "99.00", "tags": ["z"]},
    ]


def test_regex_extraction():
    text = "mail a@b.com, visit https://x.com/page on 2024-01-15, 50% off"
    recs = RegexExtractionStrategy(labels=["email", "url", "date_iso", "percentage"]).extract(
        "u", text
    )
    got = {(r["label"], r["value"]) for r in recs}
    assert ("email", "a@b.com") in got
    assert ("url", "https://x.com/page") in got
    assert ("date_iso", "2024-01-15") in got
    assert ("percentage", "50%") in got
    for r in recs:
        assert text[r["span"][0] : r["span"][1]] == r["value"]


def test_chunking():
    assert IdentityChunking().chunk("a\n\nb") == ["a\n\nb"]
    assert RegexChunking().chunk("a\n\nb\n\nc") == ["a", "b", "c"]
    w = SlidingWindowChunking(window_size=3, step=2).chunk("a b c d e")
    assert w == ["a b c", "c d e"]
    o = OverlappingWindowChunking(window_size=3, overlap=1).chunk("a b c d e")
    assert o == ["a b c", "c d e"]


def test_fixed_length_and_sentence_chunking():
    from crawl4ai_ray.functions.extraction import (
        FixedLengthWordChunking,
        NlpSentenceChunking,
        NoExtractionStrategy,
    )

    f = FixedLengthWordChunking(chunk_size=2).chunk("a b c d e")
    assert f == ["a b", "c d", "e"]
    s = NlpSentenceChunking().chunk(
        "First sentence here. Second one! Is this third? First sentence here."
    )
    # dedup in first-occurrence order (deterministic, unlike the
    # reference's set())
    assert s == ["First sentence here.", "Second one!", "Is this third?"]
    n = NoExtractionStrategy()
    assert n.run("u", ["x", "y"]) == [
        {"index": 0, "tags": [], "content": "x"},
        {"index": 1, "tags": [], "content": "y"},
    ]


def test_topic_segmentation_chunking():
    from crawl4ai_ray.functions.extraction import TopicSegmentationChunking

    topic_a = ("the cat sat on the mat and the cat chased the mouse around "
               "the house all day. ") * 8
    topic_b = ("stock markets rallied as interest rates fell and investors "
               "bought equities in volume. ") * 8
    text = topic_a + topic_b
    t = TopicSegmentationChunking(w=10, k=4)
    chunks = t.chunk(text)
    assert len(chunks) >= 2
    assert "".join(c + " " for c in chunks).split() == text.split()
    # topic words split across the boundary
    assert "cat" in chunks[0] and "cat" not in chunks[-1]
    assert "markets" in chunks[-1]
    # deterministic
    assert t.chunk(text) == chunks
    # keywords: stopwords filtered, top-k by frequency
    kws = t.extract_keywords("the the the cat cat dog")
    assert kws[0] == "cat"
    # degenerate inputs
    assert t.chunk("") == []
    assert t.chunk("short text") == ["short text"]


def test_extract_stage_batch():
    batch = pa.table({"url": ["https://x.com"], "html": [HTML.encode()]})
    stage = ExtractStage(RegexExtractionStrategy(labels=["currency"]), content_col="html")
    out = stage(batch)
    recs = json.loads(out.column("extracted")[0].as_py())
    assert {r["value"] for r in recs} == {"$12.50", "$99.00"}


PAGE = """
<html><head><title>Python guide</title>
<meta name="description" content="learn python fast"></head><body>
<nav class="menu"><a href="/">home</a><a href="/about">about</a></nav>
<article class="content"><p>Python is a programming language that is widely
used for data processing and machine learning tasks in production systems.</p>
<p>Learn python with examples: fast iteration, clear syntax, rich libraries
make python a great language to learn programming fundamentals.</p></article>
<footer class="footer"><a href="/x">links</a><a href="/y">more</a></footer>
</body></html>
"""


def test_pruning_filter_drops_nav_footer():
    frags = PruningContentFilter(threshold=0.45).filter_content(PAGE)
    joined = " ".join(frags)
    assert "programming language" in joined
    assert "home" not in joined


def test_bm25_filter_ranks_relevant():
    # threshold 0.5: on a 4-chunk page, df("python")=2 of 4 makes its Okapi
    # idf exactly 0 (rank_bm25 semantics), so the default 1.0 cutoff is
    # dominated by idf("learn") alone — the assert is about RANKING
    filt = BM25ContentFilter(user_query="learn python", bm25_threshold=0.5)
    frags = filt.filter_content(PAGE)
    assert frags and "Learn python" in " ".join(frags)
    # nav/footer link chunks score 0 and stay out
    assert "home" not in " ".join(frags)
    md, fh = fit_markdown(PAGE, filt)
    assert "python" in md.lower() and "<div>" in fh


def test_cosine_strategy_clusters_and_filters():
    """CosineStrategy adapter (extraction_strategy.py:121-478): sections
    cluster together, word_count_threshold drops small clusters, output is
    sorted by cluster label with the reference's row shape."""
    from crawl4ai_ray.functions.extraction import CosineStrategy

    sections = [
        "machine learning models require training data pipelines at scale",
        "training data pipelines feed machine learning models continuously",
        "the cafeteria serves lunch at noon on weekdays",
    ]
    # max_dist 0.5 -> join threshold 0.5; the two pipeline sections sit
    # at cosine ~0.549 under the default TinyHashEmbedder (r5: unigram+
    # bigram hashed features), the cafeteria section at ~0.23
    s = CosineStrategy(word_count_threshold=5, max_dist=0.5)
    rows = s.run("https://e.com/x", sections)
    assert rows and all(set(r) == {"index", "tags", "content"} for r in rows)
    assert [r["index"] for r in rows] == sorted(r["index"] for r in rows)
    # identical-topic sections share a cluster
    joined = [r["content"] for r in rows]
    assert any("machine learning" in c and c.count("pipelines") >= 2 for c in joined)

    # semantic_filter drops off-topic chunks entirely
    filt = CosineStrategy(
        semantic_filter="machine learning training", word_count_threshold=3
    )
    rows_f = filt.run("https://e.com/x", sections)
    assert rows_f and all("cafeteria" not in r["content"] for r in rows_f)

    # empty input
    assert CosineStrategy().run("https://e.com/x", []) == []


def test_xpath_select_subset():
    """html/xpath.py subset evaluator: axes, predicates, positions,
    document order, dedup."""
    from crawl4ai_ray.html.xpath import XPathError, xpath_select
    import pytest as _pytest

    root = parse_html(HTML)
    assert len(xpath_select(root, "//div[@class='item']")) == 2
    assert len(xpath_select(root, "//div")) == 3
    assert xpath_select(root, "//div[@id='a']/h2")[0].text() == "First"
    assert xpath_select(root, "//div[@id]")[0].get("id") == "a"
    assert len(xpath_select(root, "//div[contains(@class, 'item')]//li")) == 3
    # positional predicate is per-context: second li of EACH ul
    secondlis = xpath_select(root, "//ul/li[2]")
    assert [li.text() for li in secondlis] == ["y"]
    assert xpath_select(root, "//div[1]/h2")[0].text() == "First"
    assert xpath_select(root, "//span[@class='price']")[0].text() == "$12.50"
    assert xpath_select(root, "//nope") == []
    assert len(xpath_select(root, "//*[@class='item']")) == 2
    # quoted slashes in predicates don't split steps
    assert xpath_select(root, "//a[@href='/one']")[0].text() == "go"
    with _pytest.raises(XPathError):
        xpath_select(root, "//div[foo()]")


def test_json_xpath_extraction_matches_css():
    """JsonXPathExtractionStrategy (extraction_strategy.py:1612-1676):
    same schema semantics as the CSS variant with XPath selectors, plus the
    css->xpath bridge for bare-name field selectors."""
    from crawl4ai_ray.functions.extraction import JsonXPathExtractionStrategy

    schema = {
        "baseSelector": "//div[@class='item']",
        "fields": [
            {"name": "title", "selector": "h2", "type": "text"},  # css->xpath
            {"name": "link", "selector": ".//a", "type": "attribute", "attribute": "href"},
            {"name": "price", "selector": "//span[@class='price']", "type": "regex", "pattern": r"[\d.]+"},
            {"name": "tags", "selector": "ul li", "type": "list"},  # ' ' -> '//'
        ],
    }
    items = JsonXPathExtractionStrategy(schema).extract("https://x.com", HTML)
    assert items == [
        {"title": "First", "link": "/one", "price": "12.50", "tags": ["x", "y"]},
        {"title": "Second", "link": "/two", "price": "99.00", "tags": ["z"]},
    ]

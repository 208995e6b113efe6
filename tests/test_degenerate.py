"""Degenerate inputs (FIXTURES.md §1 'degenerate' row): empty body,
missing body, ≥1 MB pages, non-ASCII, malformed HTML, binary junk."""

from crawl4ai_ray.html.markdown import generate_markdown
from crawl4ai_ray.html.scrape import scrape_page

URL = "https://x.example.com/p"


def test_empty_and_missing_body():
    for html in ("", "<html></html>", "<html><head><title>t</title></head></html>"):
        r = scrape_page(URL, html)
        assert r["success"]
        assert r["text"] == ""
        md = generate_markdown(r["cleaned_root"], base_url=URL)
        # reference converter renders empty input as a single newline
        assert md["raw_markdown"] == "\n"


def test_large_page_1mb():
    para = "<p>" + ("lorem ipsum dolor sit amet " * 40) + "</p>"
    html = "<html><body>" + para * 1200 + "</body></html>"
    assert len(html) > 1_000_000
    r = scrape_page(URL, html)
    assert r["success"]
    assert len(r["text"]) > 500_000
    # fit_html respects its size cap
    assert len(r["fit_html"]) <= 300_000


def test_non_ascii_content():
    html = "<body><p>中文段落内容测试。</p><p dir='rtl'>نص عربي للاختبار</p><p>émojis 🎉 too</p></body>"
    r = scrape_page(URL, html)
    assert "中文段落内容测试。" in r["text"]
    assert "نص عربي للاختبار" in r["text"]
    assert "🎉" in r["text"]


def test_binary_junk_bytes():
    r = scrape_page(URL, b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 10)
    assert isinstance(r["cleaned_html"], str)  # no crash


def test_deeply_nested_and_unclosed():
    html = "<div>" * 200 + "deep text" + "</div>" * 3 + "<p>tail"
    r = scrape_page(URL, html)
    assert "deep text" in r["text"] and "tail" in r["text"]


def test_attribute_edge_cases():
    html = '<body><a href="">empty</a><a>none</a><img src=""><p title="q&quot;x">attr entity</p></body>'
    r = scrape_page(URL, html)
    assert r["success"]
    assert r["links_internal"] == [] and r["links_external"] == []

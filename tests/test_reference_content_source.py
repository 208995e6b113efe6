"""r5 port of tests/general/test_content_source_parameter.py — the
content_source matrix across raw/cleaned/fit markdown inputs (r4
VERDICT task #5), plus the end-to-end wiring through ExtractPages
(ScrapeConfig.content_source now actually selects what feeds markdown
generation)."""

from __future__ import annotations

import pyarrow as pa

from crawl4ai_ray.strategies import (
    DefaultMarkdownGenerator,
    MarkdownGenerationStrategy,
)

RAW = "<html><body><h1>Raw HTML</h1></body></html>"
CLEANED = "<html><body><h1>Cleaned HTML</h1></body></html>"
FIT = "<html><body><h1>Preprocessed HTML</h1></body></html>"


def test_default_content_source_is_cleaned_html():
    assert DefaultMarkdownGenerator().content_source == "cleaned_html"


def test_custom_content_source():
    gen = DefaultMarkdownGenerator(content_source="fit_html")
    assert gen.content_source == "fit_html"


def test_html_source_selection_logic():
    # the reference's four dispatch cases, including the
    # invalid-value → cleaned_html fallback
    for src, expected in [
        ("cleaned_html", CLEANED),
        ("raw_html", RAW),
        ("fit_html", FIT),
        ("invalid_source", CLEANED),
    ]:
        gen = DefaultMarkdownGenerator(content_source=src)
        assert gen.resolve_input_html(RAW, CLEANED, FIT) == expected, src


def test_generate_markdown_uses_input_html_parameter():
    # the reference asserts the input_html param is what reaches the
    # HTML→markdown kernel (mocked there; real here)
    out = DefaultMarkdownGenerator().generate_markdown(
        "<h1>Test Content</h1><p>This is a test paragraph.</p>"
    )
    assert out["raw_markdown"].startswith("# Test Content")
    assert "This is a test paragraph." in out["raw_markdown"]


def test_abstract_strategy_carries_content_source():
    s = MarkdownGenerationStrategy(content_source="raw_html")
    assert s.content_source == "raw_html"


HTML = (
    "<html><head><title>T</title></head><body><nav>menu junk here</nav>"
    "<h1>Kept Title</h1>"
    + "".join(
        f"<p>paragraph {i} with enough words to stay in the cleaned "
        f"output of the scraper pipeline</p>"
        for i in range(4)
    )
    + "<script>var x=1;</script></body></html>"
)


def _extract(content_source: str) -> dict:
    from crawl4ai_ray.config import ScrapeConfig
    from crawl4ai_ray.stages.extract import ExtractPages

    stage = ExtractPages(ScrapeConfig(content_source=content_source))
    batch = pa.table({"url": ["https://e.com/x"], "html": [HTML]})
    return stage(batch).to_pylist()[0]


def test_extract_pages_honors_content_source(ray_session):
    cleaned = _extract("cleaned_html")
    raw = _extract("raw_html")
    fallback = _extract("not_a_source")
    # raw_html markdown keeps the script/nav content the cleaned path drops
    assert "var x=1;" not in cleaned["markdown"]
    assert "var x=1;" in raw["markdown"] or "menu junk" in raw["markdown"]
    # invalid value falls back to the cleaned_html source
    assert fallback["markdown"] == cleaned["markdown"]
    # fit source produces markdown from the fit_html column's content
    fit = _extract("fit_html")
    assert fit["markdown"] != "" or fit["fit_html"] == ""

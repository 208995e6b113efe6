"""Property-based robustness: scrape/markdown must never raise and must be
deterministic on arbitrary (including malformed) HTML."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_ray.html.markdown import generate_markdown
from crawl4ai_ray.html.scrape import scrape_page

URL = "https://p.example.com/x"

tag = st.sampled_from(
    ["p", "div", "span", "a", "ul", "li", "h1", "h2", "table", "tr", "td",
     "pre", "code", "strong", "em", "img", "br", "blockquote", "script"]
)
text_chunk = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
)


@st.composite
def html_fragment(draw, depth=0):
    n = draw(st.integers(0, 3 if depth < 3 else 0))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(text_chunk))
        elif kind == 1:
            t = draw(tag)
            attrs = draw(
                st.sampled_from(["", ' href="/a"', ' class="c d"', ' src="x.png" alt="a"'])
            )
            inner = draw(html_fragment(depth + 1))
            parts.append(f"<{t}{attrs}>{inner}</{t}>")
        elif kind == 2:
            t = draw(tag)
            parts.append(f"<{t}>")  # unclosed
        else:
            parts.append("</" + draw(tag) + ">")  # stray close
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(html=html_fragment())
def test_scrape_never_raises_and_deterministic(html):
    doc = f"<html><body>{html}</body></html>"
    r1 = scrape_page(URL, doc)
    r2 = scrape_page(URL, doc)
    assert r1["success"] and r2["success"]
    assert r1["cleaned_html"] == r2["cleaned_html"]
    assert r1["text"] == r2["text"]
    md1 = generate_markdown(r1["cleaned_root"], base_url=URL)
    # re-scrape for an independent tree (cleaned_root was consumed)
    md2 = generate_markdown(scrape_page(URL, doc)["cleaned_root"], base_url=URL)
    assert md1["raw_markdown"] == md2["raw_markdown"]
    assert md1["markdown_with_citations"] == md2["markdown_with_citations"]


@settings(max_examples=80, deadline=None)
@given(junk=st.binary(max_size=400))
def test_scrape_binary_junk_never_raises(junk):
    r = scrape_page(URL, junk)
    assert isinstance(r["cleaned_html"], str)
    assert isinstance(r["text"], str)

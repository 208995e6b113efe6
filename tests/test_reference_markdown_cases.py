"""Byte-parity against the REFERENCE's own markdown converter.

The reference's vendored html2text package is pure stdlib; we execute it
READ-ONLY from /root/reference (importlib, no code copied) under the exact
options the reference pipeline uses (markdown_generation_strategy.py:181-214)
and assert our generator produces byte-identical output. This replaces the
round-1 self-referential golden snapshots with proven parity (r1 VERDICT #3).

Known, documented divergences (not asserted): <li> outside a list, lists
nested inside blockquotes, adjacent <pre><pre>, <ul></ul> (reference emits
a stray blank line), named &nbsp; hard-space placement. None occur in
cleaned real-page content. (Round 3 closed the former empty-emphasis
divergence — fused markers + next-chunk strip are now replicated.)
"""

import importlib.util
import os
import sys

import pytest

REF_H2T = "/root/reference/crawl4ai/html2text/__init__.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_H2T), reason="reference html2text not present"
)


@pytest.fixture(scope="module")
def ref_md():
    spec = importlib.util.spec_from_file_location(
        "ref_html2text", REF_H2T,
        submodule_search_locations=[os.path.dirname(REF_H2T)])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_html2text"] = mod
    spec.loader.exec_module(mod)

    def convert(html: str, baseurl: str = "") -> str:
        h = mod.CustomHTML2Text(baseurl=baseurl)
        h.update_params(
            body_width=0, ignore_emphasis=False, ignore_links=False,
            ignore_images=False, protect_links=False, single_line_break=True,
            mark_code=True, escape_snob=False,
        )
        return h.handle(html).replace("    ```", "```")

    return convert


CASES = [
    '<h1>Title</h1><p>Some <strong>bold</strong> and <em>italic</em> text.</p>',
    '<p>A <a href="https://x.com/a">link</a> here.</p>',
    '<p>A <a href="https://x.com/a" title="t">titled link</a>.</p>',
    '<ul><li>one</li><li>two</li></ul>',
    '<ul><li>one</li><li>two<ul><li>nested</li></ul></li></ul>',
    '<ol><li>first</li><li>second</li></ol>',
    '<ol start="3"><li>three</li></ol>',
    '<pre><code>def f():\n    return 1\n</code></pre>',
    '<pre>raw  spaced\ncontent</pre>',
    '<table><thead><tr><th>a</th><th>b</th></tr></thead><tbody><tr><td>1</td><td>2</td></tr></tbody></table>',
    '<table><caption>Cap</caption><tbody><tr><td>x</td><td>y</td></tr></tbody></table>',
    '<table><tr><td>x</td><td>y</td></tr><tr><td>1</td><td>2</td></tr></table><p>after</p>',
    '<blockquote>quoted wisdom</blockquote>',
    '<blockquote><p>one</p><p>two</p></blockquote><p>x</p>',
    '<p>line one<br>line two</p>',
    '<h2>Sub</h2><p>text</p><hr><p>after</p>',
    '<p>inline <code>x=1</code> code</p>',
    '<p><code>a  b</code></p>',
    '<img src="https://x.com/i.png" alt="pic">',
    '<p>x <img src="i.png"> y</p>',
    '<p>entity &amp; dash &#8212; here</p>',
    '<p>&nbsp;|&mdash;|&ndash;|&rsquo;|&lsquo;|&rdquo;|&ldquo;|&copy;|&middot;|&rarr;|&larr;|&hellip;</p>',
    '<h3>H3</h3><h4>H4</h4><h5>H5</h5><h6>H6</h6>',
    '<div><p>in div</p></div>',
    '<p>star * under _ score</p>',
    '<p>brackets [x] and (y) and #hash and 1. dot</p>',
    '<nav><a href="/">home</a></nav><p>body</p>',
    '<p></p><p>after empty</p>',
    '<ul><li><p>para in li</p></li></ul>',
    '<p><em><strong>both</strong></em></p>',
    '<p><strong>b</strong><em>i</em>tail</p>',
    '<p><strong> spaced bold </strong>x</p>',
    '<p>covers <strong>synthetic</strong> content in <em>en</em>.</p>',
    '<span>bare span</span> tail',
    '<p>before</p>bare between<p>after</p>',
    '<p><a href="mailto:info@example.com">contact</a> x</p>',
    '<p><a href="javascript:void(0)">noop</a> y</p>',
    '<p><a href="https://x.com/p?utm_source=feed&ref=rss#section-2">second</a></p>',
    '<p><a href="//site3.example.com/page/3">third</a></p>',
    '<video width="640"><source src="v.mp4"></video><p>x</p>',
    '<form class="promo" action="/sub"><input name="q" type="text"></form><p>x</p>',
    '<p>中文内容 &mdash; test</p>',
    '<ul><li>a</li><li>b<ol><li>n1</li></ol></li></ul><p>x</p>',
    '<p>first</p><ul><li>a</li></ul>',
    '<h2>h</h2><ul><li>a</li></ul><h2>g</h2>',
    '<p>t</p><hr><p>u</p>',
    '<table><tr><th>a</th></tr><tr><td><strong>b</strong></td></tr></table>',
    '<ul><li>item with <a href="u">link</a></li></ul>',
    '<p>trailing space </p><p>next</p>',
    '<p>an <u>underlined</u> word</p>',
    '<p><u>u</u> then <code>c <u>u2</u></code></p>',
    '',
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_case_byte_parity(ref_md, i):
    from crawl4ai_ray.html.markdown import html_to_markdown

    html = CASES[i]
    assert html_to_markdown(html) == ref_md(html), html[:80]


def test_corpus_pages_byte_parity(ref_md):
    """Every synthesized corpus page converts byte-identically."""
    from crawl4ai_ray.html.markdown import html_to_markdown
    from crawl4ai_ray.sources.pages import build_html

    for d in range(0, 300):
        html = build_html(d, 500, f"word{d} alpha beta gamma " * 40, "en")
        assert html_to_markdown(html) == ref_md(html), f"doc {d}"


def test_wikipedia_sample_byte_parity(ref_md):
    """Real-world 768 KB page, the reference's own test fixture: the FULL
    document converts BYTE-IDENTICALLY at the pipeline seam (our
    cleaned_html fed to both converters) — the north rule's per-url
    byte-identity invariant demonstrated on real-world HTML, covering
    nested tables in cells, radio-button menus, links in code spans, abbr
    definition lists, automatic links and the converter's whitespace
    quirks."""
    from crawl4ai_ray.html.markdown import generate_markdown
    from crawl4ai_ray.html.scrape import scrape_page

    html = open("/root/reference/tests/async/sample_wikipedia.html",
                encoding="utf-8").read()
    r = scrape_page("https://en.wikipedia.org/wiki/Apple", html)
    ours = generate_markdown(r["cleaned_root"])["raw_markdown"]
    theirs = ref_md(r["cleaned_html"])
    assert ours == theirs


def test_wikipedia_raw_html_near_parity(ref_md):
    """Direct raw-html conversion (no cleaning): ≥98% line-identity — the
    residual gap lives in page chrome (menus/forms) that the pipeline's
    cleaning removes before markdown ever runs."""
    import difflib

    from crawl4ai_ray.html.markdown import html_to_markdown

    html = open("/root/reference/tests/async/sample_wikipedia.html",
                encoding="utf-8").read()
    ours = html_to_markdown(html).splitlines()
    theirs = ref_md(html).splitlines()
    removed = sum(
        1
        for l in difflib.unified_diff(theirs, ours, lineterm="")
        if l.startswith("-") and not l.startswith("---")
    )
    identical = len(theirs) - removed
    assert identical / len(theirs) >= 0.98, f"{identical}/{len(theirs)}"


def test_reference_html_sweep(ref_md):
    """Every .html file in the reference repo through both converters at
    the pipeline seam: ALL ~25 files byte-identical (round 3 closed the
    long tail: heading leading/trailing spaces, empty emphasis, adjacent
    text-node chunking, dl token stream + space-flag flushes, headings
    with block children, link-wrapped headings, list stray text)."""
    import difflib
    import glob

    from crawl4ai_ray.html.markdown import generate_markdown
    from crawl4ai_ray.html.scrape import scrape_page

    files = sorted(glob.glob("/root/reference/**/*.html", recursive=True))
    exact = 0
    ident_lines = 0
    total_lines = 0
    for f in files:
        html = open(f, encoding="utf-8", errors="replace").read()
        if len(html) > 2_000_000:
            continue
        r = scrape_page("https://example.com/x", html)
        ours = generate_markdown(r["cleaned_root"])["raw_markdown"]
        theirs = ref_md(r["cleaned_html"])
        t = theirs.splitlines()
        total_lines += len(t)
        if ours == theirs:
            exact += 1
            ident_lines += len(t)
            continue
        rem = sum(
            1
            for l in difflib.unified_diff(t, ours.splitlines(), lineterm="")
            if l.startswith("-") and not l.startswith("---")
        )
        ident_lines += len(t) - rem
    assert exact == len([f for f in files if len(open(f, encoding="utf-8", errors="replace").read()) <= 2_000_000]), exact
    assert ident_lines / max(total_lines, 1) >= 0.999, (ident_lines, total_lines)


# -- behavioral cases ported from the reference's own markdown-generator
#    test suite (tests/async/test_markdown_genertor.py) — each assert below
#    mirrors one of its named tests against OUR generator.

def test_ref_mdgen_relative_links_resolved_in_references():
    """test_markdown_genertor.py:73-88 (test_relative_links): relative hrefs
    are resolved against base_url inside the references block; absolute
    ones pass through."""
    from crawl4ai_ray.html.markdown import generate_markdown

    md_in = (
        "Here's a [relative link](/wiki/Apple) and an "
        "[absolute link](https://example.com). Also an "
        "[image](/images/test.png) and another [page](/wiki/Banana)."
    )
    res = generate_markdown(md_in, base_url="https://en.wikipedia.org")
    refs = res["references_markdown"]
    assert "https://en.wikipedia.org/wiki/Apple" in refs
    assert "https://example.com" in refs
    assert "https://en.wikipedia.org/images/test.png" in refs
    assert "https://en.wikipedia.org/wiki/Banana" in refs


def test_ref_mdgen_duplicate_links_share_citation():
    """test_markdown_genertor.py:90-103 (test_duplicate_links): the same
    resolved url gets ONE citation number, reused at every occurrence."""
    from crawl4ai_ray.html.markdown import generate_markdown

    md_in = "Here's a [link](/test) and another [link](/test) and a [different link](/other)."
    res = generate_markdown(md_in, base_url="https://example.com")
    assert res["markdown_with_citations"].count("⟨1⟩") == 2
    assert res["markdown_with_citations"].count("⟨2⟩") == 1
    # and the references block lists each url exactly once
    assert res["references_markdown"].count("https://example.com/test") == 1


def test_ref_mdgen_link_titles_and_text_in_references():
    """test_markdown_genertor.py:106-122 (test_link_descriptions): a link's
    "title" attribute and its anchor text both land in the references."""
    from crawl4ai_ray.html.markdown import generate_markdown

    md_in = (
        'Here\'s a [link with title](/test "Test Title") and a '
        "[link with description](/other) to test."
    )
    res = generate_markdown(md_in, base_url="https://example.com")
    refs = res["references_markdown"]
    assert "Test Title" in refs
    assert "link with description" in refs
    # title and text are joined "title - text" for the titled link
    assert "Test Title - link with title" in refs


def test_ref_mdgen_image_links_cited():
    """test_markdown_genertor.py:153+ (test_image_links): image links get
    citations too, with the ![...] form preserved."""
    from crawl4ai_ray.html.markdown import generate_markdown

    md_in = (
        'Here\'s an ![image](/image.png "Image Title") and another '
        "![image](/other.jpg). And a regular [link](/page)."
    )
    res = generate_markdown(md_in, base_url="https://example.com")
    cit = res["markdown_with_citations"]
    assert "![image⟨1⟩]" in cit and "![image⟨2⟩]" in cit
    assert "https://example.com/image.png" in res["references_markdown"]


def test_ref_mdgen_references_header():
    """test_markdown_genertor.py:40-70 (test_basic_markdown_conversion):
    citations use ⟨⟩ brackets and references carry the '## References'
    header."""
    from crawl4ai_ray.html.markdown import generate_markdown

    res = generate_markdown(
        "<p>go <a href='/x'>here</a></p>", base_url="https://en.wikipedia.org"
    )
    assert "⟨" in res["markdown_with_citations"]
    assert "## References" in res["references_markdown"]

"""Differential test: the fast regex tokenizer must build the identical
tree to the HTMLParser-based builder (or fall back entirely)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_ray.html.dom import _parse_html_fast, _parse_html_slow
from crawl4ai_ray.sources.pages import build_html


def _same(html: str) -> None:
    fast = _parse_html_fast(html)
    if fast is None:
        return  # fell back: slow path used for real parse, nothing to diff
    slow = _parse_html_slow(html)
    assert fast.serialize() == slow.serialize(), html[:400]


def test_corpus_differential():
    for i in range(0, 400, 7):
        _same(build_html(i, 500, f"word{i} " * 60, "en"))


def test_handwritten_cases():
    cases = [
        "",
        "plain text only",
        "<p>a</p>",
        "<P CLASS='X'>mixed CASE</P>",
        '<a href="/x" title="t&amp;t">t</a>',
        "<ul><li>a<li>b</ul>",
        "<img src='x.png'><br><hr>",
        "<script>var a = 1 < 2 && b > 3;</script><p>after</p>",
        "<style>a { content: '<' }</style><p>x</p>",
        "<!-- comment --><p>y</p>",
        "<!DOCTYPE html><html><body><p>z</p></body></html>",
        "<div><div><div>deep</div></div></div>",
        "<p>entity &amp; &#8212; &lt;notatag</p>",
        "<td colspan=2>unquoted</td>",
        "<input type=text name=q value='v'>",
        "<p>text &unknownentity; more</p>",
        "<pre>  spaced\n\tcontent  </pre>",
        "<p>a</p\n>odd close</p>",
        "<svg/><math/>",
        "<p att1 att2='b' att1='dup'>first wins</p>",
        # HTML5 self-closing-on-non-void shapes (ADVICE r1): slash ignored,
        # element stays open; autoclose runs for the sibling rules.
        "<ul><li>a<li/>b</li></ul>",
        "<p>x<p/>y",
        "<td/>",
        "<div/>trailing text",
        "<li/><li/>two",
        "<table><tr><td/>cell<td/>cell2</tr></table>",
        "<script/>var x = '<p>not a tag</p>';",
        "<style/>.a { color: red }",
        "<pre/>raw  text",
        "<dt/>term<dd/>def",
    ]
    for c in cases:
        _same(c)


def test_html5_self_closing_keeps_element_open():
    """'<p/>y' parses as <p>y</p> (HTML5 / lxml semantics), both parsers."""
    for parse in (_parse_html_fast, _parse_html_slow):
        root = parse("<p/>y")
        assert root is not None
        (p,) = [c for c in root.children if not isinstance(c, str)]
        assert p.tag == "p" and p.children == ["y"]
    # li sibling autoclose still applies to a self-closing token
    for parse in (_parse_html_fast, _parse_html_slow):
        root = parse("<ul><li>a<li/>b</li></ul>")
        ul = root.children[0]
        lis = [c for c in ul.children if not isinstance(c, str)]
        assert [li.tag for li in lis] == ["li", "li"]
        assert lis[0].children == ["a"] and lis[1].children == ["b"]


tag = st.sampled_from(
    ["p", "div", "a", "ul", "li", "img", "br", "pre", "script", "table", "td"]
)
txt = st.text(alphabet="ab <>&;#x/=\"'\n\t", max_size=24)


@st.composite
def soup(draw, depth=0):
    n = draw(st.integers(0, 3 if depth < 2 else 0))
    parts = []
    for _ in range(n):
        k = draw(st.integers(0, 2))
        if k == 0:
            parts.append(draw(txt))
        elif k == 1:
            t = draw(tag)
            attrs = draw(st.sampled_from(["", " a=1", ' b="x y"', " c='z'", " d"]))
            parts.append(f"<{t}{attrs}>{draw(soup(depth + 1))}</{t}>")
        else:
            parts.append(f"<{draw(tag)}>")
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(html=soup())
def test_random_soup_differential(html):
    _same(html)

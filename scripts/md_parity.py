"""Markdown byte-parity harness: run the REFERENCE's vendored html2text
(executed read-only from /root/reference via importlib — no code copied)
next to our generator over case snippets + corpus pages; report diffs.

Usage: python scripts/md_parity.py [n_pages] [case_index]
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_H2T = "/root/reference/crawl4ai/html2text/__init__.py"


def load_ref():
    spec = importlib.util.spec_from_file_location(
        "ref_html2text", REF_H2T,
        submodule_search_locations=[os.path.dirname(REF_H2T)])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_html2text"] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_md_fn(mod):
    def ref_md(html: str, baseurl: str = "") -> str:
        h = mod.CustomHTML2Text(baseurl=baseurl)
        h.update_params(
            body_width=0, ignore_emphasis=False, ignore_links=False,
            ignore_images=False, protect_links=False, single_line_break=True,
            mark_code=True, escape_snob=False,
        )
        return h.handle(html).replace("    ```", "```")
    return ref_md


CASES = [
    '<h1>Title</h1><p>Some <strong>bold</strong> and <em>italic</em> text.</p>',
    '<p>A <a href="https://x.com/a">link</a> here.</p>',
    '<p>A <a href="https://x.com/a" title="t">titled link</a>.</p>',
    '<ul><li>one</li><li>two</li></ul>',
    '<ul><li>one</li><li>two<ul><li>nested</li></ul></li></ul>',
    '<ol><li>first</li><li>second</li></ol>',
    '<pre><code>def f():\n    return 1\n</code></pre>',
    '<pre>raw  spaced\ncontent</pre>',
    '<table><thead><tr><th>a</th><th>b</th></tr></thead><tbody><tr><td>1</td><td>2</td></tr></tbody></table>',
    '<table><caption>Cap</caption><tbody><tr><td>x</td><td>y</td></tr></tbody></table>',
    '<blockquote>quoted wisdom</blockquote>',
    '<p>line one<br>line two</p>',
    '<h2>Sub</h2><p>text</p><hr><p>after</p>',
    '<p>inline <code>x=1</code> code</p>',
    '<img src="https://x.com/i.png" alt="pic">',
    '<p>entity &amp; dash &#8212; here</p>',
    '<h3>H3</h3><h4>H4</h4><h5>H5</h5><h6>H6</h6>',
    '<div><p>in div</p></div>',
    '<p>star * under _ score</p>',
    '<p>a  b\n  c</p>',
    '<nav><a href="/">home</a></nav><p>body</p>',
    '<p></p><p>after empty</p>',
    '<ul><li><p>para in li</p></li></ul>',
    '<blockquote><p>p one</p><p>p two</p></blockquote>',
    '<p><em><strong>both</strong></em></p>',
    '<span>bare span</span> tail',
    '<p>text with <span>span</span> inline</p>',
    '<p><a href="/rel">relative</a></p>',
    '<video width="640"><source src="v.mp4" type="video/mp4"></video>',
    '<p>中文内容 &mdash; test</p>',
]


def main():
    mod = load_ref()
    ref_md = ref_md_fn(mod)
    from crawl4ai_ray.html.markdown import html_to_markdown

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    only = int(sys.argv[2]) if len(sys.argv) > 2 else None

    same = 0
    for i, c in enumerate(CASES):
        if only is not None and i != only:
            continue
        r, o = ref_md(c), html_to_markdown(c)
        if r == o:
            same += 1
        else:
            print(f"=== CASE {i}: {c[:70]}")
            print("REF :", repr(r))
            print("OURS:", repr(o))
    if only is None:
        print(f"cases: {same}/{len(CASES)} byte-identical")

        from crawl4ai_ray.sources.pages import build_html
        psame = 0
        first_bad = None
        for d in range(0, n_pages):
            html = build_html(d, 500, "word one two three " * 30, "en")
            r, o = ref_md(html), html_to_markdown(html)
            if r == o:
                psame += 1
            elif first_bad is None:
                first_bad = d
                import difflib
                diff = list(difflib.unified_diff(r.splitlines(), o.splitlines(),
                                                 "ref", "ours", lineterm=""))
                print(f"--- first corpus mismatch at doc {d}:")
                print("\n".join(diff[:40]))
        print(f"corpus pages: {psame}/{n_pages} byte-identical")


if __name__ == "__main__":
    main()

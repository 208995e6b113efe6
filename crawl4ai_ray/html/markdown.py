"""Markdown generation from the cleaned DOM.

Re-expression of the reference's DefaultMarkdownGenerator contract
(markdown_generation_strategy.py:148-260): html2text-style conversion with
``body_width=0`` (no wrap), ``single_line_break=True`` (blocks separated by
one blank line marker "\\n"), fenced code blocks, ``[text](url "title")``
links, then the ``"    ```" → "```"`` fixup, then optional link→citation
conversion (⟨n⟩ markers + "## References" section,
markdown_generation_strategy.py:82-146).

html2text itself is unavailable here, so the conversion is this module's own
deterministic spec — the engine's byte-identity anchor. Given the same
cleaned_html, output is byte-stable across runs, batch sizes and
parallelism (no dict-order, time or randomness dependence).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .dom import BLOCK_TAGS, Element, parse_html

# Reference markdown_generation_strategy.py:11
LINK_PATTERN = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def fast_urljoin(base: str, url: str) -> str:
    """Fast path urljoin (markdown_generation_strategy.py:14-23)."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


def _inline(el: Element) -> str:
    """Render inline content of an element to markdown (whitespace
    collapsed; strong/em/code/a/img handled)."""
    parts: list[str] = []
    for c in el.children:
        if isinstance(c, str):
            parts.append(c)
            continue
        tag = c.tag
        if tag in ("strong", "b"):
            inner = _collapse(_inline(c))
            if inner:
                parts.append(f"**{inner}**")
        elif tag in ("em", "i"):
            inner = _collapse(_inline(c))
            if inner:
                parts.append(f"_{inner}_")
        elif tag == "code":
            inner = c.text()
            if inner:
                parts.append(f"`{inner}`")
        elif tag == "a":
            inner = _collapse(_inline(c)) or c.text()
            href = c.get("href", "") or ""
            title = c.get("title")
            if not href:
                parts.append(inner)
            elif title:
                parts.append(f'[{inner}]({href} "{title}")')
            else:
                parts.append(f"[{inner}]({href})")
        elif tag == "img":
            alt = c.get("alt", "") or ""
            src = c.get("src", "") or ""
            title = c.get("title")
            if src:
                if title:
                    parts.append(f'![{alt}]({src} "{title}")')
                else:
                    parts.append(f"![{alt}]({src})")
        elif tag == "br":
            parts.append("\n")
        else:
            parts.append(_inline(c))
    return "".join(parts)


_WS_RE = re.compile(r"[ \t\r\f\v]*\n[ \t\r\f\v]*|[ \t\r\f\v]+")


def _collapse(s: str) -> str:
    # collapse runs of whitespace to single spaces, preserving nothing else
    return re.sub(r"\s+", " ", s).strip()


def _render_table(t: Element) -> str:
    rows = t.find_all("tr")
    if not rows:
        return ""
    lines: list[str] = []
    caption = t.find("caption")
    header_done = False
    body_lines: list[str] = []
    header_cells: list[str] | None = None
    for r in rows:
        cells = [c for c in r.children if isinstance(c, Element) and c.tag in ("td", "th")]
        if not cells:
            continue
        vals = [_collapse(_inline(c)) for c in cells]
        if not header_done and all(c.tag == "th" for c in cells):
            header_cells = vals
            header_done = True
        else:
            body_lines.append("| " + " | ".join(vals) + " |")
    if header_cells is None and body_lines:
        # headerless table: synthesize an empty header of the right arity
        ncols = body_lines[0].count(" | ") + 1
        header_cells = [""] * ncols
    out = []
    if caption is not None:
        cap = caption.text()
        if cap:
            out.append(cap)
    if header_cells is not None:
        out.append("| " + " | ".join(header_cells) + " |")
        out.append("|" + "|".join("---" for _ in header_cells) + "|")
    out.extend(body_lines)
    return "\n".join(out)


def _render_block(el: Element, out: list[str], list_stack: list):
    tag = el.tag
    if tag in _HEADINGS:
        txt = _collapse(_inline(el))
        if txt:
            out.append("#" * _HEADINGS[tag] + " " + txt)
    elif tag == "p":
        txt = _collapse(_inline(el))
        if txt:
            out.append(txt)
    elif tag == "pre":
        code = el.text(strip=False, collapse=False)
        out.append("```\n" + code.strip("\n") + "\n```")
    elif tag == "blockquote":
        inner: list[str] = []
        _render_children(el, inner, list_stack)
        quoted = "\n".join(
            "> " + line if line else ">" for block in inner for line in block.split("\n")
        )
        if quoted:
            out.append(quoted)
    elif tag in ("ul", "ol"):
        items: list[str] = []
        idx = 1
        depth = len(list_stack)
        indent = "  " * depth
        for c in el.children:
            if isinstance(c, Element) and c.tag == "li":
                sub: list[str] = []
                _render_li(c, sub, list_stack + [tag])
                content = "\n".join(sub)
                marker = f"{indent}  * " if tag == "ul" else f"{indent}  {idx}. "
                idx += 1
                items.append(marker + content)
        if items:
            out.append("\n".join(items))
    elif tag == "table":
        rendered = _render_table(el)
        if rendered:
            out.append(rendered)
    elif tag == "hr":
        out.append("* * *")
    elif tag in ("div", "section", "article", "main", "header", "footer",
                 "nav", "aside", "figure", "figcaption", "address", "form",
                 "fieldset", "body", "[doc]", "html"):
        _render_children(el, out, list_stack)
    else:
        # treat any other element as inline content in its own block
        txt = _collapse(_inline(el))
        if txt:
            out.append(txt)


def _render_li(li: Element, out: list[str], list_stack: list):
    inline_parts: list[str] = []
    for c in li.children:
        if isinstance(c, str):
            inline_parts.append(c)
        elif c.tag in ("ul", "ol"):
            txt = _collapse("".join(inline_parts))
            inline_parts = []
            if txt:
                out.append(txt)
            sub: list[str] = []
            _render_block(c, sub, list_stack)
            out.extend(sub)
        elif c.tag in BLOCK_TAGS:
            txt = _collapse("".join(inline_parts))
            inline_parts = []
            if txt:
                out.append(txt)
            _render_block(c, out, list_stack)
        else:
            inline_parts.append(_inline_one(c))
    txt = _collapse("".join(inline_parts))
    if txt:
        out.append(txt)


def _inline_one(c: Element) -> str:
    wrapper = Element("[doc]")
    wrapper.children = [c]
    return _inline(wrapper)


def _render_children(el: Element, out: list[str], list_stack: list):
    inline_parts: list[str] = []

    def flush():
        txt = _collapse("".join(inline_parts))
        inline_parts.clear()
        if txt:
            out.append(txt)

    for c in el.children:
        if isinstance(c, str):
            inline_parts.append(c)
        elif c.tag in BLOCK_TAGS or c.tag in ("table",):
            flush()
            _render_block(c, out, list_stack)
        else:
            inline_parts.append(_inline_one(c))
    flush()


def dom_to_markdown(root: Element) -> str:
    """Cleaned DOM → raw markdown; blocks joined by single blank lines.
    Full documents render from <body> (head metadata never reaches md)."""
    body = root.find("body")
    if body is not None:
        root = body
    blocks: list[str] = []
    _render_children(root, blocks, [])
    md = "\n\n".join(b for b in blocks if b)
    md = md.replace("    ```", "```")  # parity fixup (strategy.py:214)
    return md + "\n" if md else ""


def html_to_markdown(html: str) -> str:
    return dom_to_markdown(parse_html(html))


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """[text](url "title") → text⟨n⟩ + "## References" block; numbering by
    first occurrence; references sorted by number
    (markdown_generation_strategy.py:82-146 semantics)."""
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1
    for match in LINK_PATTERN.finditer(markdown):
        parts.append(markdown[last_end : match.start()])
        text, url, title = match.groups()
        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in url_cache:
                url_cache[url] = fast_urljoin(base_url, url)
            url = url_cache[url]
        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1
        num = link_map[url][0]
        parts.append(
            f"{text}⟨{num}⟩" if not match.group(0).startswith("!") else f"![{text}⟨{num}⟩]"
        )
        last_end = match.end()
    parts.append(markdown[last_end:])
    converted = "".join(parts)
    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(link_map.items(), key=lambda x: x[1][0])
    )
    return converted, "".join(references)


def generate_markdown(
    input_html_or_root, base_url: str = "", citations: bool = True
) -> dict:
    """Full markdown result (mirrors MarkdownGenerationResult fields,
    models.py:119-127): raw_markdown, markdown_with_citations,
    references_markdown."""
    root = (
        input_html_or_root
        if isinstance(input_html_or_root, Element)
        else parse_html(input_html_or_root or "")
    )
    raw = dom_to_markdown(root)
    with_cit, refs = (raw, "")
    if citations:
        with_cit, refs = convert_links_to_citations(raw, base_url)
    return {
        "raw_markdown": raw,
        "markdown_with_citations": with_cit,
        "references_markdown": refs,
    }

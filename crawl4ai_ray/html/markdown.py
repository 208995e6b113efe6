"""Markdown generation from the cleaned DOM — byte-parity with the
reference's converter.

The reference generates markdown with its vendored ``CustomHTML2Text``
under fixed options (markdown_generation_strategy.py:181-214: body_width=0,
single_line_break=True, mark_code=True, escape_snob=False,
ignore_mailto_links=True) followed by the ``"    ```" → "```"`` fixup.
This module is an independent DOM-walking implementation of that exact
output contract — byte-for-byte equality is asserted against the
reference converter itself in tests/test_reference_markdown_cases.py
(the reference's html2text package is pure stdlib and is executed
read-only from /root/reference at test time to generate goldens; no code
is copied).

Output rules replicated (all verified empirically against the reference):

- blocks separated by a single newline (single_line_break)
- a top-level list is followed by two blank lines; a <pre> block by one
- ``<pre>`` → fenced block preserving content verbatim (incl. trailing
  newline), closing fence on its own line
- tables: first row is ALWAYS the header; cells joined ``"| "`` with no
  outer pipes; every table line carries two trailing spaces (markdown
  line-break); separator ``---|---``; ``<caption>`` text is concatenated
  directly before the first header cell
- ``<br>`` → ``"  \\n"``
- emphasis: inner whitespace stripped, a separating space is forced
  around the marker when glued to adjacent content
- links ``[text](url)`` with ``(`` / ``)`` in urls backslash-escaped;
  mailto links dropped (text kept); images ``![alt](src)``
- inline code preserves whitespace (newlines → spaces)
- entity refs for —, –, curly quotes, ©, ·, →, ← unify to ASCII
  (``--``, ``-``, ``'``, ``"``, ``(C)``, ``*``, ``->``, ``<-``); literal
  unicode characters pass through untouched
- trailing spaces of the final output line are stripped; empty input
  renders as a single newline

Then optional link→citation conversion (⟨n⟩ markers + "## References",
markdown_generation_strategy.py:82-146).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .dom import Element, parse_html

# Reference markdown_generation_strategy.py:11
LINK_PATTERN = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# entity-reference unification (behavioral parity with the reference
# converter's charref handling; literal unicode chars are NOT mapped)
_UNIFY_CHARS = {
    "—": "--",   # mdash
    "–": "-",    # ndash
    "’": "'",    # rsquo
    "‘": "'",    # lsquo
    "“": '"',    # ldquo
    "”": '"',    # rdquo
    "©": "(C)",  # copy
    "·": "*",    # middot
    "→": "->",   # rarr
    "←": "<-",   # larr
    " ": " ",    # nbsp (numeric ref; named &nbsp; keeps a hard space)
}
_ENT_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
_NBSP_SENTINEL = "\ue000"  # named &nbsp; survives collapse as a hard space
_ENT_NAMES = {
    "mdash": "--", "ndash": "-", "rsquo": "'", "lsquo": "'",
    "ldquo": '"', "rdquo": '"', "copy": "(C)", "middot": "*",
    "rarr": "->", "larr": "<-", "nbsp": _NBSP_SENTINEL,
}


def _unify_entities(html: str) -> str:
    """Rewrite unifiable entity refs to their ASCII forms BEFORE parsing,
    so the DOM the renderer sees matches what the reference converter's
    charref handler would have produced. Other refs unescape normally."""

    def sub(m: re.Match) -> str:
        ref = m.group(1)
        if ref.startswith("#"):
            try:
                cp = int(ref[2:], 16) if ref[1] in "xX" else int(ref[1:])
                ch = chr(cp)
            except (ValueError, OverflowError):
                return m.group(0)
            return _UNIFY_CHARS.get(ch, m.group(0))
        return _ENT_NAMES.get(ref, m.group(0))

    return _ENT_RE.sub(sub, html)


def fast_urljoin(base: str, url: str) -> str:
    """Fast path urljoin (markdown_generation_strategy.py:14-23)."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


_SKIP_TAGS = frozenset(
    {"script", "style", "head", "video", "audio", "source", "track",
     "iframe", "form", "input", "button", "select", "option", "textarea",
     "template", "noscript"}
)

_LIST_TAGS = ("ul", "ol")


def _escape_url(url: str) -> str:
    return url.replace("(", "\\(").replace(")", "\\)")


import string as _string

_STRESS_NOSPACE_RE = re.compile(r"[^][(){}\s.!?]")


class _Inline:
    """Inline accumulator replicating the reference converter's whitespace
    model: runs of whitespace become a pending-space flag that materializes
    when the next token arrives (or at block end); leading space suppressed.
    Emphasis spacing follows the reference exactly: an opening ``_`` is
    space-padded when the preceding text data ends in a non-space,
    non-punctuation char (``**`` only when it ends in ``*``); after a
    stressed span, the next text data gets a leading space unless it starts
    with whitespace or one of ``][(){}.!?`` or flows into a link/code."""

    def __init__(self):
        self.parts: list[str] = []
        self.pending_space = False
        self.after_br = False
        self.last_data_char = ""   # last char of preceding TEXT data
        self.preceding_stressed = False

    def text(self, s: str, collapse: bool = True):
        if not s:
            return
        if self.preceding_stressed:
            if _STRESS_NOSPACE_RE.match(s[0]):
                self.pending_space = True
            self.preceding_stressed = False
        if not collapse:
            self.flush()
            self.parts.append(s)
            self.last_data_char = s[-1:]
            return
        tokens = s.split()
        if not tokens:
            if self.parts and not self.after_br:
                self.pending_space = True
            self.last_data_char = " "
            return
        if s[:1].isspace():
            if self.parts and not self.after_br:
                self.pending_space = True
        self.flush()
        self.parts.append(" ".join(tokens))
        self.after_br = False
        self.last_data_char = tokens[-1][-1]
        if s[-1:].isspace():
            self.pending_space = True
            self.last_data_char = " "

    def stressed(self, marker: str, inner: str):
        """Emphasis span: marker is '_' or '**'."""
        if marker == "_":
            pad = bool(
                self.last_data_char
                and self.last_data_char not in _string.whitespace
                and self.last_data_char not in _string.punctuation
            )
        else:
            pad = self.last_data_char == marker[0]
        if pad:
            self.pending_space = True
            self.last_data_char = " "
        self.preceding_stressed = False
        self.flush()
        self.parts.append(f"{marker}{inner}{marker}")
        self.after_br = False
        if inner:
            self.last_data_char = inner[-1]
        self.preceding_stressed = True

    def raw(self, s: str, is_data: bool = False):
        """Emit a token verbatim (markers/links are not subject to the
        post-stress spacing rule; is_data applies it)."""
        if is_data and self.preceding_stressed and s and _STRESS_NOSPACE_RE.match(s[0]):
            self.pending_space = True
        self.preceding_stressed = False
        self.flush()
        self.parts.append(s)
        self.after_br = False

    def data_seen(self, s: str):
        """Record that text data flowed through a sub-renderer (link/code
        inner content updates preceding_data in the reference)."""
        if s:
            self.last_data_char = s[-1:]
        self.preceding_stressed = False

    def br(self):
        self.pending_space = False
        self.preceding_stressed = False
        self.parts.append("  \n")
        self.after_br = True

    def flush(self):
        if self.pending_space:
            self.parts.append(" ")
            self.pending_space = False

    def result(self, keep_trailing_space: bool = True) -> str:
        out = "".join(self.parts)
        if self.pending_space and keep_trailing_space and out:
            out += " "
        return out


def _render_inline_into(acc: _Inline, el: Element):
    for c in el.children:
        if isinstance(c, str):
            acc.text(c)
            continue
        tag = c.tag
        if tag in _SKIP_TAGS:
            continue
        if tag in ("strong", "b"):
            inner = _inline_text(c).strip()
            if inner:
                acc.stressed("**", inner)
        elif tag in ("em", "i"):
            inner = _inline_text(c).strip()
            if inner:
                acc.stressed("_", inner)
        elif tag == "code":
            inner = "".join(c.itertext()).replace("\n", " ")
            if inner:
                acc.raw(f"`{inner}`")
                acc.data_seen(inner)
        elif tag == "a":
            href = c.get("href", "") or ""
            inner = _inline_text(c).strip()
            if not href or href.startswith("mailto:"):
                if inner:  # ignore_mailto_links: text kept, link dropped
                    acc.raw(inner, is_data=True)
                    acc.data_seen(inner)
            else:
                title = c.get("title")
                if title is not None and title != "":
                    acc.raw(f'[{inner}]({_escape_url(href)} "{title}")')
                else:
                    acc.raw(f"[{inner}]({_escape_url(href)})")
                acc.data_seen(inner)
        elif tag == "img":
            alt = c.get("alt", "") or ""
            src = c.get("src", "") or ""
            if src:
                title = c.get("title")
                if title is not None and title != "":
                    acc.raw(f'![{alt}]({_escape_url(src)} "{title}")')
                else:
                    acc.raw(f"![{alt}]({_escape_url(src)})")
        elif tag == "br":
            acc.br()
        else:
            _render_inline_into(acc, c)


def _inline_text(el: Element) -> str:
    acc = _Inline()
    _render_inline_into(acc, el)
    return acc.result()


def _render_inline(el: Element) -> str:
    """Inline content of a block element (trailing source space kept)."""
    return _inline_text(el)


class _Block:
    __slots__ = ("text", "kind")

    def __init__(self, text: str, kind: str = "normal"):
        self.text = text
        self.kind = kind  # normal | list | pre


def _render_table(t: Element) -> str | None:
    rows = []
    for r in t.find_all("tr"):
        cells = [
            c for c in r.children
            if isinstance(c, Element) and c.tag in ("td", "th")
        ]
        if cells:
            rows.append([_inline_text(c).strip() for c in cells])
    if not rows:
        return None
    caption = t.find("caption")
    cap = _inline_text(caption).strip() if caption is not None else ""
    lines = [cap + "| ".join(rows[0]) + "  "]
    lines.append("|".join("---" for _ in rows[0]) + "  ")
    for r in rows[1:]:
        lines.append("| ".join(r) + "  ")
    return "\n".join(lines)


def _render_list(el: Element, depth: int, counter_start: int = 1) -> list[str]:
    lines: list[str] = []
    idx = counter_start
    if el.tag == "ol":
        try:
            idx = int(el.get("start", "1") or "1")
        except ValueError:
            idx = 1
    indent = " " * (2 + 2 * depth)
    for c in el.children:
        if not isinstance(c, Element) or c.tag != "li":
            continue
        item_acc = _Inline()
        sublists: list[Element] = []
        for lc in c.children:
            if isinstance(lc, str):
                item_acc.text(lc)
            elif lc.tag in _LIST_TAGS:
                sublists.append(lc)
            elif lc.tag in _SKIP_TAGS:
                continue
            elif lc.tag in ("p", "div"):
                _render_inline_into(item_acc, lc)
            else:
                _render_inline_into(item_acc, _wrap(lc))
        content = item_acc.result(keep_trailing_space=False).strip()
        marker = f"{indent}* " if el.tag == "ul" else f"{indent}{idx}. "
        idx += 1
        lines.append(marker + content)
        for sub in sublists:
            lines.extend(_render_list(sub, depth + 1))
    return lines


def _wrap(c: Element) -> Element:
    w = Element("[doc]")
    w.children = [c]
    return w


def _render_blocks(el: Element, blocks: list[_Block], quote_depth: int = 0):
    acc = _Inline()

    def flush_inline():
        txt = acc.result()
        if txt.strip():
            blocks.append(_Block(txt))
        acc.parts.clear()
        acc.pending_space = False
        acc.after_br = False

    for c in el.children:
        if isinstance(c, str):
            acc.text(c)
            continue
        tag = c.tag
        if tag in _SKIP_TAGS:
            continue
        if tag in _HEADINGS:
            flush_inline()
            txt = _inline_text(c).strip()
            if txt:
                blocks.append(_Block("#" * _HEADINGS[tag] + " " + txt))
        elif tag == "p":
            flush_inline()
            txt = _render_inline(c)
            if txt.strip():
                blocks.append(_Block(txt))
        elif tag == "pre":
            flush_inline()
            code = "".join(c.itertext())
            blocks.append(_Block("```\n" + code + "\n```", kind="pre"))
        elif tag == "blockquote":
            flush_inline()
            inner: list[_Block] = []
            _render_blocks(c, inner, quote_depth + 1)
            if inner:
                quoted_lines: list[str] = []
                for b in inner:
                    for line in b.text.split("\n"):
                        quoted_lines.append(("> " + line).rstrip() if not line else "> " + line)
                blocks.append(_Block("\n".join(quoted_lines)))
        elif tag in _LIST_TAGS:
            flush_inline()
            lines = _render_list(c, 0)
            if lines:
                blocks.append(_Block("\n".join(lines), kind="list"))
        elif tag == "table":
            flush_inline()
            rendered = _render_table(c)
            if rendered is not None:
                blocks.append(_Block(rendered, kind="table"))
        elif tag == "hr":
            flush_inline()
            blocks.append(_Block("* * *"))
        elif tag == "dl":
            flush_inline()
            lines = []
            for dc in c.children:
                if isinstance(dc, Element) and dc.tag == "dt":
                    lines.append(_inline_text(dc).strip())
                elif isinstance(dc, Element) and dc.tag == "dd":
                    lines.append("    " + _inline_text(dc).strip())
            if lines:
                blocks.append(_Block("\n".join(lines)))
        elif tag in ("div", "section", "article", "main", "header", "footer",
                     "nav", "aside", "figure", "figcaption", "address",
                     "fieldset", "body", "html", "center", "details",
                     "summary", "li", "td", "th", "tr", "tbody", "thead",
                     "tfoot"):
            flush_inline()
            _render_blocks(c, blocks, quote_depth)
        else:
            # inline element at block level: accumulate
            _render_inline_into(acc, _wrap(c))
    flush_inline()


def dom_to_markdown(root: Element) -> str:
    """Cleaned DOM → raw markdown under the engine's fixed option set.
    Full documents render from <body> (head metadata never reaches md)."""
    body = root.find("body")
    if body is not None:
        root = body
    blocks: list[_Block] = []
    _render_blocks(root, blocks)
    # Assembly mirrors the reference's pending-newline (p_p) model:
    # normal blocks request one separating newline on start (p()); a list
    # CLOSE emits two newlines directly; a pre block carries its own
    # trailing newline and requests nothing on start — so list→pre shows
    # one blank line while list→p shows two, and pre→table glues the
    # caption right under the closing fence. Document end emits one \n.
    parts: list[str] = []
    pending = 0
    for i, b in enumerate(blocks):
        if b.kind in ("pre", "table"):
            emit = pending  # no p() on start for these
        else:
            emit = max(pending, 1) if i > 0 else pending
        parts.append("\n" * emit)
        parts.append(b.text)
        if b.kind == "list":
            parts.append("\n\n")
            pending = 0
        elif b.kind == "pre":
            parts.append("\n")
            pending = 0
        else:
            pending = 1
    md = "".join(parts) + "\n"
    md = md.replace("    ```", "```")  # parity fixup (strategy.py:214)
    # strip trailing spaces on the final line (reference end-of-doc behavior)
    md = re.sub(r"[ \t]+\n\Z", "\n", md)
    return md.replace(_NBSP_SENTINEL, " ")


def html_to_markdown(html: str) -> str:
    return dom_to_markdown(parse_html(_unify_entities(html)))


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
        else parse_html(_unify_entities(input_html_or_root or ""))
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

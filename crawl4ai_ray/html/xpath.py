"""XPath-subset evaluator over the stdlib DOM — selector engine for
JsonXPathExtractionStrategy (reference extraction_strategy.py:1612-1676,
which evaluates user XPath via lxml; lxml is absent here, so this is a
clean-room evaluator of the subset those schemas actually use).

Grammar:

    path      := '.'? ( '/' | '//' )? step ( ( '/' | '//' ) step )*
    step      := ( NAME | '*' ) predicate*
    predicate := '[' '@'NAME ( '=' STRING )? ']'
               | '[' 'contains(' '@'NAME ',' STRING ')' ']'
               | '[' INTEGER ']'

Semantics follow XPath: ``//x`` searches descendants, ``/x`` direct
children, a leading bare name is a child step, ``*`` matches any tag, a
positional predicate is 1-based WITHIN each context node's match list, and
results are deduplicated in document order. Text/node functions
(``text()``, axes beyond child/descendant) are not supported — the
extraction strategy reads text/attributes through its field types instead.
"""

from __future__ import annotations

import re

from .dom import Element

_PRED_RE = re.compile(
    r"\[\s*(?:"
    r"@(?P<attr>[\w:-]+)\s*(?:=\s*(?P<q>['\"])(?P<val>.*?)(?P=q))?"
    r"|contains\(\s*@(?P<cattr>[\w:-]+)\s*,\s*(?P<cq>['\"])(?P<cval>.*?)(?P=cq)\s*\)"
    r"|(?P<pos>\d+)"
    r")\s*\]"
)
_NODETEST_RE = re.compile(r"^([\w:-]+|\*)")


class XPathError(ValueError):
    pass


def _split_steps(path: str) -> list[tuple[str, str]]:
    """Split into (axis, step_token) pairs, respecting brackets/quotes so
    ``[@href='/x']`` doesn't split on its slash."""
    path = path.strip()
    if path.startswith("."):
        path = path[1:]
    steps: list[tuple[str, str]] = []
    i, n = 0, len(path)
    axis = "child"
    if path.startswith("//"):
        axis, i = "descendant", 2
    elif path.startswith("/"):
        axis, i = "child", 1
    buf: list[str] = []
    depth = 0
    quote: str | None = None

    def flush(next_axis: str):
        nonlocal buf, axis
        token = "".join(buf).strip()
        if token:
            steps.append((axis, token))
        elif steps or token:
            raise XPathError(f"empty step in xpath: {path!r}")
        buf = []
        axis = next_axis

    while i < n:
        c = path[i]
        if quote:
            buf.append(c)
            if c == quote:
                quote = None
            i += 1
            continue
        if c in "'\"":
            quote = c
            buf.append(c)
            i += 1
            continue
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
        if c == "/" and depth == 0:
            if path.startswith("//", i):
                flush("descendant")
                i += 2
            else:
                flush("child")
                i += 1
            continue
        buf.append(c)
        i += 1
    flush("child")
    if not steps:
        raise XPathError(f"empty xpath: {path!r}")
    return steps


def _parse_step(token: str):
    m = _NODETEST_RE.match(token)
    if not m:
        raise XPathError(f"unsupported xpath step: {token!r}")
    name = m.group(1)
    rest = token[m.end() :].strip()
    preds = []
    pos = 0
    while pos < len(rest):
        pm = _PRED_RE.match(rest, pos)
        if not pm:
            raise XPathError(f"unsupported xpath predicate: {rest[pos:]!r}")
        preds.append(pm.groupdict())
        pos = pm.end()
    return name, preds


def _apply_predicates(matches: list[Element], preds: list[dict]) -> list[Element]:
    for p in preds:
        if p["pos"] is not None:
            k = int(p["pos"])  # 1-based within this context's match list
            matches = [matches[k - 1]] if 0 < k <= len(matches) else []
        elif p["attr"] is not None:
            attr = p["attr"]
            if p["val"] is None:
                matches = [e for e in matches if e.get(attr) is not None]
            else:
                matches = [e for e in matches if e.get(attr) == p["val"]]
        else:  # contains(@attr, 'v')
            attr, val = p["cattr"], p["cval"]
            matches = [
                e for e in matches if val in (e.get(attr) or "")
            ]
    return matches


def xpath_select(root: Element, path: str) -> list[Element]:
    """Evaluate ``path`` relative to ``root``; returns elements in document
    order, deduplicated."""
    ctx: list[Element] = [root]
    for axis, token in _split_steps(path):
        name, preds = _parse_step(token)
        out: list[Element] = []
        seen: set[int] = set()
        for node in ctx:
            if axis == "descendant":
                cands = [e for e in node.iter() if e is not node]
            else:
                cands = [c for c in node.children if isinstance(c, Element)]
            matches = [e for e in cands if name == "*" or e.tag == name]
            matches = _apply_predicates(matches, preds)
            for m in matches:
                if id(m) not in seen:
                    seen.add(id(m))
                    out.append(m)
        ctx = out
        if not ctx:
            return []
    return ctx

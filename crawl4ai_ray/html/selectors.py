"""Minimal CSS selector engine over the stdlib DOM.

Supports the subset the reference's JsonCssExtractionStrategy schemas use in
practice (extraction_strategy.py:838-892): tag, .class, #id, [attr],
[attr=value], compound selectors (div.item#x), descendant combinators
("div .title"), child combinators ("ul > li"), and comma unions.
"""

from __future__ import annotations

import re

from .dom import Element

_PART_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<quals>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_QUAL_RE = re.compile(r"([.#])([\w-]+)|\[([^\]=]+)(?:=(\"[^\"]*\"|'[^']*'|[^\]]*))?\]")


class _Simple:
    __slots__ = ("tag", "classes", "ids", "attrs")

    def __init__(self, part: str):
        m = _PART_RE.match(part)
        if not m or (not m.group(0)):
            raise ValueError(f"unsupported selector part: {part!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.classes: list[str] = []
        self.ids: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        for qm in _QUAL_RE.finditer(m.group("quals") or ""):
            if qm.group(1) == ".":
                self.classes.append(qm.group(2))
            elif qm.group(1) == "#":
                self.ids.append(qm.group(2))
            elif qm.group(3):
                val = qm.group(4)
                if val is not None:
                    val = val.strip("\"'")
                self.attrs.append((qm.group(3).strip(), val))

    def matches(self, el: Element) -> bool:
        if self.tag and el.tag != self.tag:
            return False
        if self.classes:
            cls = el.classes()
            if any(c not in cls for c in self.classes):
                return False
        if any(el.get("id") != i for i in self.ids):
            return False
        for k, v in self.attrs:
            av = el.get(k)
            if av is None or (v is not None and av != v):
                return False
        return True


class Selector:
    def __init__(self, selector: str):
        self.alternatives: list[list[tuple[str, _Simple]]] = []
        for alt in selector.split(","):
            parts: list[tuple[str, _Simple]] = []
            tokens = alt.replace(">", " > ").split()
            combinator = " "
            for tok in tokens:
                if tok == ">":
                    combinator = ">"
                    continue
                parts.append((combinator, _Simple(tok)))
                combinator = " "
            if parts:
                self.alternatives.append(parts)

    def select(self, root: Element) -> list[Element]:
        out: list[Element] = []
        seen: set[int] = set()
        for parts in self.alternatives:
            for el in self._select_chain(root, parts):
                if id(el) not in seen:
                    seen.add(id(el))
                    out.append(el)
        return out

    def _select_chain(self, root: Element, parts) -> list[Element]:
        current = [root]
        for i, (comb, simple) in enumerate(parts):
            nxt: list[Element] = []
            nxt_seen: set[int] = set()
            for base in current:
                if comb == ">" and i > 0:
                    candidates = [c for c in base.children if isinstance(c, Element)]
                else:
                    candidates = [e for e in base.iter() if e is not base]
                for c in candidates:
                    if simple.matches(c) and id(c) not in nxt_seen:
                        nxt_seen.add(id(c))
                        nxt.append(c)
            current = nxt
        return current


def select(root: Element, selector: str) -> list[Element]:
    return Selector(selector).select(root)


def select_one(root: Element, selector: str) -> Element | None:
    found = Selector(selector).select(root)
    return found[0] if found else None

"""Relevant-content filters → fit_markdown.

Clean-room re-expression of the reference's content_filter_strategy.py:

- PruningContentFilter (:580-778): per-node composite score (text density,
  link density, tag weight, class/id signals, text length) with fixed or
  dynamic threshold; low-scoring subtrees pruned, surviving block HTML
  fragments returned.
- BM25ContentFilter (:340-570): page chunks ranked by BM25 against a query
  derived from head metadata; top chunks returned. (The reference stems
  with snowball; unavailable here — we use lowercase tokens and note the
  deviation.)

``filter_content(html) -> list[str]`` matches the reference ABC
(content_filter_strategy.py:33-123); fit_markdown = markdown over the
joined fragments (markdown_generation_strategy.py:243-252).
"""

from __future__ import annotations

import math
import re

from ..html.dom import Element, parse_html
from ..html.markdown import html_to_markdown

_NEGATIVE_CLASS_RE = re.compile(
    r"(nav|menu|sidebar|footer|header|comment|banner|ad[sv]?|promo|related|share|social)",
    re.I,
)
_POSITIVE_CLASS_RE = re.compile(r"(article|content|main|post|body|text|entry)", re.I)

_TAG_WEIGHTS = {
    "article": 2.0, "main": 2.0, "section": 1.2, "p": 1.0, "pre": 1.0,
    "blockquote": 1.0, "td": 0.8, "div": 0.6, "li": 0.5, "span": 0.3,
    "nav": 0.1, "aside": 0.1, "footer": 0.1, "header": 0.2,
}

_BLOCK_CANDIDATES = ("article", "main", "section", "div", "p", "pre",
                     "blockquote", "table", "ul", "ol")


class RelevantContentFilter:
    def filter_content(self, html: str) -> list[str]:  # pragma: no cover
        raise NotImplementedError


class PruningContentFilter(RelevantContentFilter):
    def __init__(
        self,
        threshold: float = 0.48,
        threshold_type: str = "fixed",  # fixed | dynamic
        min_word_threshold: int = 2,
    ):
        self.threshold = threshold
        self.threshold_type = threshold_type
        self.min_word_threshold = min_word_threshold

    def _node_score(self, el: Element) -> float:
        text = el.text()
        words = text.split()
        n_words = len(words)
        if n_words < self.min_word_threshold:
            return 0.0
        # link density: words inside <a> / total
        link_words = sum(len(a.text().split()) for a in el.find_all("a"))
        link_density = link_words / n_words if n_words else 1.0
        text_len_score = min(1.0, n_words / 100.0)
        tag_weight = _TAG_WEIGHTS.get(el.tag, 0.5)
        cls_id = " ".join(el.classes()) + " " + (el.get("id") or "")
        class_score = 1.0
        if _NEGATIVE_CLASS_RE.search(cls_id):
            class_score = 0.2
        elif _POSITIVE_CLASS_RE.search(cls_id):
            class_score = 1.5
        # children text density: text chars / serialized chars
        raw_len = len(el.serialize())
        density = len(text) / raw_len if raw_len else 0.0
        score = (
            0.3 * (1.0 - link_density)
            + 0.2 * text_len_score
            + 0.2 * min(1.0, tag_weight)
            + 0.15 * min(1.0, class_score)
            + 0.15 * min(1.0, density * 2)
        )
        return score

    def filter_content(self, html: str) -> list[str]:
        root = parse_html(html)
        body = root.find("body") or root
        candidates = [e for e in body.iter() if e.tag in _BLOCK_CANDIDATES]
        scored = [(self._node_score(e), e) for e in candidates]
        scored = [(s, e) for s, e in scored if s > 0]
        if not scored:
            return []
        if self.threshold_type == "dynamic":
            mean = sum(s for s, _ in scored) / len(scored)
            thr = mean * self.threshold * 2
        else:
            thr = self.threshold
        kept: list[Element] = []
        kept_ids: set[int] = set()
        for s, e in scored:
            if s < thr:
                continue
            # skip if an ancestor already kept (avoid duplicate content)
            p = e.parent
            anc = False
            while p is not None:
                if id(p) in kept_ids:
                    anc = True
                    break
                p = p.parent
            if not anc:
                kept.append(e)
                kept_ids.add(id(e))
        return [e.serialize() for e in kept]


_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


class BM25ContentFilter(RelevantContentFilter):
    """BM25 chunk ranking against a user query or head-derived query
    (content_filter_strategy.py:340-570; k1=1.2, b=0.75 textbook params).
    Deviation: no snowball stemming (library absent) — plain lowercase
    tokens."""

    def __init__(self, user_query: str | None = None, bm25_threshold: float = 1.0):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold
        self.k1, self.b = 1.2, 0.75

    def filter_content(self, html: str) -> list[str]:
        root = parse_html(html)
        body = root.find("body") or root
        query = self.user_query
        if not query:
            head = root.find("head")
            parts = []
            if head is not None:
                t = head.find("title")
                if t is not None:
                    parts.append(t.text())
                for m in head.find_all("meta"):
                    if (m.get("name") or "").lower() in ("description", "keywords"):
                        parts.append(m.get("content") or "")
            query = " ".join(parts)
        if not query.strip():
            return []
        chunks = [
            e
            for e in body.iter()
            if e.tag in ("p", "li", "td", "pre", "blockquote", "h1", "h2", "h3")
            and e.word_count() >= 2
        ]
        if not chunks:
            return []
        docs = [_tokens(c.text()) for c in chunks]
        qtok = _tokens(query)
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        df: dict[str, int] = {}
        for d in docs:
            for t in set(d):
                df[t] = df.get(t, 0) + 1
        out = []
        for c, d in zip(chunks, docs):
            score = 0.0
            dl = len(d) or 1
            for t in qtok:
                f = d.count(t)
                if not f:
                    continue
                idf = math.log(1 + (n - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5))
                score += idf * f * (self.k1 + 1) / (
                    f + self.k1 * (1 - self.b + self.b * dl / avgdl)
                )
            if score >= self.bm25_threshold:
                out.append((score, c))
        out.sort(key=lambda x: -x[0])
        return [c.serialize() for _, c in out]


def fit_markdown(html: str, content_filter: RelevantContentFilter) -> tuple[str, str]:
    """(fit_markdown, fit_html) per the reference wiring
    (markdown_generation_strategy.py:243-252)."""
    fragments = content_filter.filter_content(html)
    fit_html = "\n".join(f"<div>{f}</div>" for f in fragments)
    return html_to_markdown(fit_html), fit_html

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

# Excluded chrome tags + negative class/id patterns shared by the filters
# (content_filter_strategy.py:100-117 RelevantContentFilter.__init__)
_EXCLUDED_TAGS = frozenset(
    {"nav", "footer", "header", "aside", "script", "style", "form",
     "iframe", "noscript"}
)
_NEGATIVE_PATTERNS = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I
)


class RelevantContentFilter:
    def filter_content(self, html: str) -> list[str]:  # pragma: no cover
        raise NotImplementedError


def _text_strip_concat(el: Element) -> str:
    """bs4 ``get_text(strip=True)`` semantics: every descendant text node
    stripped, then concatenated WITHOUT separator."""
    parts: list[str] = []
    stack = [el]
    while stack:
        e = stack.pop()
        if isinstance(e, str):
            s = e.strip()
            if s:
                parts.append(s)
            continue
        stack.extend(reversed(e.children))
    return "".join(parts)


class PruningContentFilter(RelevantContentFilter):
    """Tree-pruning content filter (content_filter_strategy.py:548-805):
    remove chrome tags, then recursively score every node on a composite of
    text density, link density, tag weight, class/id signal and log text
    length; a node below threshold is REMOVED WITH ITS SUBTREE, a surviving
    node recurses into its children — so a kept <article> still loses its
    low-scoring sidebar. Output = the serialized direct children of body
    that still carry text.

    Faithful quirks kept: word counts use bs4's strip-concat text (inline
    splits fuse); the class/id term is clamped to max(0, score) where the
    score is never positive, so it contributes only its weight to the
    normalization (ibid:752-756); link text counts DIRECT child <a> string
    nodes only (ibid:692-696)."""

    TAG_IMPORTANCE = {
        "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
        "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
    }
    TAG_WEIGHTS = {
        "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
        "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
        "h4": 0.9, "h5": 0.8, "h6": 0.7,
    }
    METRIC_WEIGHTS = {
        "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
        "class_id_weight": 0.1, "text_length": 0.1,
    }

    def __init__(
        self,
        threshold: float = 0.48,
        threshold_type: str = "fixed",  # fixed | dynamic
        min_word_threshold: int | None = None,
    ):
        self.threshold = threshold
        self.threshold_type = threshold_type
        self.min_word_threshold = min_word_threshold

    def _composite_score(
        self, el: Element, text_len: int, tag_len: int, link_text_len: int
    ) -> float:
        if self.min_word_threshold:
            word_count = _text_strip_concat(el).count(" ") + 1
            if word_count < self.min_word_threshold:
                return -1.0  # guaranteed removal
        w = self.METRIC_WEIGHTS
        score = 0.0
        score += w["text_density"] * (text_len / tag_len if tag_len > 0 else 0)
        score += w["link_density"] * (
            1 - (link_text_len / text_len if text_len > 0 else 0)
        )
        score += w["tag_weight"] * self.TAG_WEIGHTS.get(el.tag, 0.5)
        class_id_score = 0.0
        cls = " ".join(el.classes())
        if cls and _NEGATIVE_PATTERNS.match(cls):
            class_id_score -= 0.5
        eid = el.get("id") or ""
        if eid and _NEGATIVE_PATTERNS.match(eid):
            class_id_score -= 0.5
        score += w["class_id_weight"] * max(0, class_id_score)
        score += w["text_length"] * math.log(text_len + 1)
        return score / sum(w.values())

    def _prune_tree(self, el: Element) -> bool:
        """Returns False if ``el`` should be removed by its parent."""
        text_len = len(_text_strip_concat(el))
        inner = "".join(
            c if isinstance(c, str) else c.serialize() for c in el.children
        )
        tag_len = len(inner)
        # direct-child <a> single-string text only (reference recursive=False
        # + a.string)
        link_text_len = 0
        for c in el.children:
            if (
                isinstance(c, Element)
                and c.tag == "a"
                and len(c.children) == 1
                and isinstance(c.children[0], str)
            ):
                link_text_len += len(c.children[0].strip())

        score = self._composite_score(el, text_len, tag_len, link_text_len)

        if self.threshold_type == "fixed":
            should_remove = score < self.threshold
        else:  # dynamic threshold modifiers (ibid:704-716)
            tag_importance = self.TAG_IMPORTANCE.get(el.tag, 0.7)
            text_ratio = text_len / tag_len if tag_len > 0 else 0
            link_ratio = link_text_len / text_len if text_len > 0 else 1
            thr = self.threshold
            if tag_importance > 1:
                thr *= 0.8
            if text_ratio > 0.4:
                thr *= 0.9
            if link_ratio > 0.6:
                thr *= 1.2
            should_remove = score < thr

        if should_remove:
            return False
        el.children = [
            c
            for c in el.children
            if isinstance(c, str) or self._prune_tree(c)
        ]
        return True

    def filter_content(self, html: str) -> list[str]:
        # reference returns [] for empty/None input (test_content_filter_prune
        # test_empty_input)
        if not html or not isinstance(html, str):
            return []
        root = parse_html(html)
        body = root.find("body") or root
        # chrome removal before scoring (ibid:666-676)
        for e in list(body.iter()):
            if e.tag in _EXCLUDED_TAGS:
                e.detach()
        # prune the tree in place; body itself is never removed, only its
        # descendants (the reference calls _prune_tree(body) whose removal
        # branch can drop body on degenerate pages — we keep body and let
        # the empty-output check speak)
        body.children = [
            c
            for c in body.children
            if isinstance(c, str) or self._prune_tree(c)
        ]
        return [
            c.serialize()
            for c in body.children
            if isinstance(c, Element) and _text_strip_concat(c)
        ]


_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


# Inline tags that don't break the text-chunk walk
# (content_filter_strategy.py:176-208 INLINE_TAGS)
_INLINE_TAGS = frozenset(
    "a abbr acronym b bdo big br button cite code dfn em i img input kbd "
    "label map object q samp script select small span strong sub sup "
    "textarea time tt var".split()
)
_HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "header"})
# clean_element's removal sets (content_filter_strategy.py:334-343)
_UNWANTED_TAGS = frozenset({"script", "style", "aside", "form", "iframe", "noscript"})
_UNWANTED_ATTRS = frozenset(
    {"style", "onclick", "onmouseover", "align", "bgcolor", "class", "id"}
)
# Token cleaning (utils.py:2405-2610 clean_tokens): len>2, minus a
# noise/stopword set, minus arrow-prefixed tokens. The stopword list below
# is the high-frequency core of the reference's ~120-entry list.
_STOPWORDS = frozenset(
    "and are as at but by for from has have its nor not off our out over "
    "she that the this these those was were will with you your all any "
    "both each few more most other some such can could may might must "
    "shall should when where why how what which who whom whose none "
    "although because since unless through toward under underneath until "
    "upon within near past outside".split()
)


def clean_tokens(tokens: list[str]) -> list[str]:
    return [
        t
        for t in tokens
        if len(t) > 2
        and t not in _STOPWORDS
        and not t.startswith(("↑", "▲", "⬆"))
    ]


def extract_text_chunks(body: Element, min_word_threshold: int | None = None):
    """Flat text-chunk walk (content_filter_strategy.py:161-272): DFS the
    tree accumulating stripped text nodes; every NON-inline element close
    flushes the accumulation as one chunk carrying the flushing element.
    Faithful quirk: accumulated strings are concatenated WITHOUT separator
    before whitespace-normalizing (the reference joins with ''), so text
    split across inline elements fuses.

    Returns [(index, text, 'header'|'content', element), ...] in document
    order."""
    chunks: list[tuple] = []
    current: list[str] = []
    idx = 0
    stack: list[tuple] = [(body, False)]
    while stack:
        el, visited = stack.pop()
        if visited:
            if current and el.tag not in _INLINE_TAGS:
                text = " ".join("".join(current).split())
                if text:
                    kind = "header" if el.tag in _HEADER_TAGS else "content"
                    chunks.append((idx, text, kind, el))
                    idx += 1
                current = []
            continue
        if isinstance(el, str):
            s = el.strip()
            if s:
                current.append(s)
            continue
        if not el.children:
            continue
        stack.append((el, True))
        for c in reversed(el.children):
            stack.append((c, False))
    if current:
        text = " ".join("".join(current).split())
        if text:
            chunks.append((idx, text, "content", body))
    if min_word_threshold:
        chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
    return chunks


def clean_element(el: Element) -> str:
    """Serialize an element dropping unwanted tags and presentation attrs
    (content_filter_strategy.py:329-377 clean_element)."""
    if not isinstance(el, Element):
        return ""
    builder: list[str] = []

    def render(e):
        if isinstance(e, str):
            builder.append(e.strip())
            return
        if e.tag in _UNWANTED_TAGS:
            return
        builder.append(f"<{e.tag}")
        for k, v in e.attrs.items():
            if k not in _UNWANTED_ATTRS:
                builder.append(f' {k}="{v}"')
        builder.append(">")
        for c in e.children:
            render(c)
        builder.append(f"</{e.tag}>")

    render(el)
    return "".join(builder)


class BM25ContentFilter(RelevantContentFilter):
    """BM25 chunk ranking against a user query or page-derived query
    (content_filter_strategy.py:381-532). Mirrors the reference end to end:
    flat text-chunk walk, rank_bm25-equivalent Okapi scoring (k1=1.5,
    b=0.75, epsilon=0.25 negative-idf floor), priority-tag score weights
    (h1×5, h2×4, ...), threshold on the weighted score, output in DOCUMENT
    order through clean_element. Deviation: no snowball stemming (library
    absent) — plain lowercase whitespace tokens, noted in tests."""

    PRIORITY_TAGS = {
        "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0,
        "b": 1.5, "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5,
        "th": 1.5,
    }

    def __init__(self, user_query: str | None = None, bm25_threshold: float = 1.0):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold
        self.k1, self.b, self.epsilon = 1.5, 0.75, 0.25

    def extract_page_query(self, root: Element, body: Element) -> str:
        """Query fallback chain (content_filter_strategy.py:125-160):
        user_query, else title + first h1 + meta keywords/description +
        (when no meta matched) the first paragraph longer than 150 chars,
        truncated to 150."""
        if self.user_query:
            return self.user_query
        parts: list[str] = []
        t = root.find("title")
        if t is not None and t.text().strip():
            parts.append(t.text().strip())
        h1 = root.find("h1")
        if h1 is not None:
            parts.append(h1.text())
        temp = ""
        for meta_name in ("keywords", "description"):
            for m in root.find_all("meta"):
                if (m.get("name") or "").lower() == meta_name and m.get("content"):
                    parts.append(m.get("content"))
                    temp += m.get("content")
                    break
        if not temp:
            for p in body.find_all("p"):
                if len(p.text()) > 150:
                    parts.append(p.text()[:150])
                    break
        return " ".join(filter(None, parts))

    def filter_content(self, html: str, min_word_threshold: int | None = None) -> list[str]:
        if not html or not isinstance(html, str):
            return []
        root = parse_html(html)
        body = root.find("body") or root
        query = self.extract_page_query(root, body)
        if not query.strip():
            return []
        candidates = extract_text_chunks(body, min_word_threshold)
        if not candidates:
            return []
        docs = [clean_tokens(text.lower().split()) for _, text, _, _ in candidates]
        qtok = clean_tokens(query.lower().split())
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        df: dict[str, int] = {}
        for d in docs:
            for t in set(d):
                df[t] = df.get(t, 0) + 1
        # rank_bm25 BM25Okapi idf: ln((N-df+0.5)/(df+0.5)), negatives
        # floored to epsilon * mean(idf) (mean over ALL terms, pre-floor)
        idf = {
            t: math.log(n - f + 0.5) - math.log(f + 0.5) for t, f in df.items()
        }
        if idf:
            avg_idf = sum(idf.values()) / len(idf)
            floor = self.epsilon * avg_idf
            idf = {t: (v if v >= 0 else floor) for t, v in idf.items()}
        selected = []
        for (index, _text, _kind, el), d in zip(candidates, docs):
            score = 0.0
            dl = len(d) or 1
            for t in qtok:
                f = d.count(t)
                if not f:
                    continue
                score += idf.get(t, 0.0) * f * (self.k1 + 1) / (
                    f + self.k1 * (1 - self.b + self.b * dl / avgdl)
                )
            # priority-tag weighting (content_filter_strategy.py:512-517)
            score *= self.PRIORITY_TAGS.get(el.tag, 1.0)
            if score >= self.bm25_threshold:
                selected.append((index, el))
        if not selected:
            return []
        selected.sort(key=lambda x: x[0])  # original document order
        return [clean_element(el) for _, el in selected]


def fit_markdown(html: str, content_filter: RelevantContentFilter) -> tuple[str, str]:
    """(fit_markdown, fit_html) per the reference wiring
    (markdown_generation_strategy.py:243-252)."""
    fragments = content_filter.filter_content(html)
    fit_html = "\n".join(f"<div>{f}</div>" for f in fragments)
    return html_to_markdown(fit_html), fit_html

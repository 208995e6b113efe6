"""Structured extraction strategies — clean-room re-expression of the
reference's ExtractionStrategy surface (extraction_strategy.py):

- JsonCssExtractionStrategy (:838-892): user-supplied schema dict
  {baseSelector, fields: [{name, selector, type, ...}]} with field types
  text / attribute / html / regex / nested / list / nested_list.
- RegexExtractionStrategy (:1711-1812): the 21-pattern built-in catalog,
  emitting {url, label, value, span} match records.
- Chunking strategies (chunking_strategy.py): Identity / RegexChunking /
  sliding window / overlapping window.

All are pure per-row callables designed to run inside ``map_batches``
(ExtractStage below); an extraction strategy instance IS the batch UDF
state, so user strategies plug in unchanged conceptually (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..html.dom import Element, decode_html, parse_html
from ..html.selectors import Selector, select


class ExtractionStrategy:
    """Base: extract(url, content) -> list[dict]."""

    input_format = "html"

    def extract(self, url: str, content: str) -> list[dict]:  # pragma: no cover
        raise NotImplementedError

    def run(self, url: str, sections: list[str]) -> list[dict]:
        out: list[dict] = []
        for s in sections:
            out.extend(self.extract(url, s))
        return out


class JsonCssExtractionStrategy(ExtractionStrategy):
    """Schema-driven extraction (reference extraction_strategy.py:838-892).

    schema = {
      "baseSelector": "div.item",
      "fields": [
        {"name": "title", "selector": "h2", "type": "text"},
        {"name": "link", "selector": "a", "type": "attribute", "attribute": "href"},
        {"name": "raw", "selector": ".body", "type": "html"},
        {"name": "price", "selector": ".p", "type": "regex", "pattern": "\\d+"},
        {"name": "tags", "selector": "li", "type": "list",
         "fields": [{"name": "t", "type": "text"}]},
        {"name": "sub", "selector": ".sub", "type": "nested", "fields": [...]},
      ],
    }
    """

    def __init__(self, schema: dict):
        self.schema = schema
        self._sel_cache: dict[str, Selector] = {}

    def _select(self, root: Element, selector: str | None) -> list[Element]:
        if not selector:
            return [root]
        sel = self._sel_cache.get(selector)
        if sel is None:
            sel = Selector(selector)
            self._sel_cache[selector] = sel
        return sel.select(root)

    def _field_value(self, el: Element, field: dict):
        ftype = field.get("type", "text")
        if ftype == "text":
            return el.text()
        if ftype == "attribute":
            return el.get(field.get("attribute", ""), "")
        if ftype == "html":
            return el.serialize()
        if ftype == "regex":
            m = re.search(field.get("pattern", ""), el.text())
            return m.group(0) if m else None
        if ftype in ("nested", "nested_list"):
            targets = self._select(el, field.get("selector"))
            items = [self._extract_fields(t, field.get("fields", [])) for t in targets]
            return items if ftype == "nested_list" else (items[0] if items else None)
        if ftype == "list":
            targets = self._select(el, field.get("selector"))
            sub_fields = field.get("fields")
            if sub_fields and len(sub_fields) == 1 and not sub_fields[0].get("selector"):
                return [self._field_value(t, sub_fields[0]) for t in targets]
            if sub_fields:
                return [self._extract_fields(t, sub_fields) for t in targets]
            return [t.text() for t in targets]
        return None

    def _extract_fields(self, el: Element, fields: list[dict]) -> dict:
        item: dict = {}
        for field in fields:
            ftype = field.get("type", "text")
            if ftype in ("nested", "nested_list", "list"):
                item[field["name"]] = self._field_value(el, field)
                continue
            targets = self._select(el, field.get("selector"))
            if not targets:
                if "default" in field:
                    item[field["name"]] = field["default"]
                continue
            item[field["name"]] = self._field_value(targets[0], field)
        return item

    def extract(self, url: str, content: str) -> list[dict]:
        root = parse_html(content)
        base = self.schema.get("baseSelector")
        elements = select(root, base) if base else [root]
        return [self._extract_fields(el, self.schema.get("fields", [])) for el in elements]


class JsonXPathExtractionStrategy(JsonCssExtractionStrategy):
    """XPath-selector variant of the schema extractor (reference
    extraction_strategy.py:1612-1676). baseSelector is evaluated as XPath;
    field selectors pass through the reference's css→xpath bridge: a
    selector containing '/' is already XPath, otherwise ' > ' chains become
    '//a/b' and descendant chains '//a//b' (ibid:1645-1660), then evaluate
    relative to the base element. Selector engine: html/xpath.py (lxml
    absent — clean-room subset evaluator)."""

    def _css_to_xpath(self, css_selector: str) -> str:
        if "/" in css_selector:
            return css_selector
        if " > " in css_selector:
            return "//" + "/".join(css_selector.split(" > "))
        if " " in css_selector:
            return "//" + "//".join(css_selector.split(" "))
        return "//" + css_selector

    def _select(self, root: Element, selector: str | None) -> list[Element]:
        from ..html.xpath import xpath_select

        if not selector:
            return [root]
        xp = self._css_to_xpath(selector)
        if not xp.startswith("."):
            xp = "." + xp
        return xpath_select(root, xp)

    def extract(self, url: str, content: str) -> list[dict]:
        from ..html.xpath import xpath_select

        root = parse_html(content)
        base = self.schema.get("baseSelector")
        elements = xpath_select(root, base) if base else [root]
        return [
            self._extract_fields(el, self.schema.get("fields", []))
            for el in elements
        ]


# Built-in regex catalog (names + patterns per extraction_strategy.py:1784-1812)
_BUILTIN_PATTERNS = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d{1,3}[-.\s]?\(?\d{1,4}\)?[-.\s]?\d{1,4}[-.\s]?\d{1,9}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"(?:[A-Fa-f0-9]{1,4}:){7}[A-Fa-f0-9]{1,4}",
    "uuid": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "currency": r"[$€£¥]\s?\d+(?:[.,]\d{2,3})*",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.]\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?::[0-5]\d)?\b",
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]?\s*\d[A-Z]{2}\b",
    "hex_color": r"#[0-9a-fA-F]{6}\b",
    "twitter_handle": r"@\w{1,15}",
    "hashtag": r"#\w+",
    "mac_address": r"(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}",
    "iban": r"\b[A-Z]{2}\d{2}[A-Z0-9]{10,30}\b",
    "credit_card": r"\b(?:\d[ -]?){13,16}\b",
    "htmltag": r"</?\w+[^>]*>",
}


class CosineStrategy(ExtractionStrategy):
    """Semantic chunk clustering as an ExtractionStrategy
    (extraction_strategy.py:121-478 CosineStrategy): split content on DEL,
    optionally pre-filter chunks against ``semantic_filter`` by cosine,
    cluster the survivors, drop clusters under ``word_count_threshold``
    words, return [{'index', 'tags', 'content'}] sorted by cluster label.

    Deviations (both env-bound, both injectable/documented): the encoder
    defaults to the recorded-weights TinyHashEmbedder (r5;
    sentence-transformers absent — pass ``encoder_factory`` to swap in a
    real transformer), and clustering is the greedy single-link
    cosine pass from stages/embed.py with join threshold ``1 - max_dist``
    (scipy ward dendrogram absent). ``tags`` stays [] — the reference
    fills it from an HF text-classification pipeline (ibid:434-438).

    For corpus-scale use, the actor-pool form of the same math is
    ``stages.embed.cosine_sections``; this adapter serves the per-document
    strategy surface (run/extract)."""

    DEL = "<|DEL|>"  # reference base default (extraction_strategy.py:64)
    input_format = "text"

    def __init__(
        self,
        semantic_filter: str | None = None,
        word_count_threshold: int = 10,
        max_dist: float = 0.2,
        top_k: int = 3,
        sim_threshold: float = 0.3,
        encoder_factory=None,
    ):
        from ..stages.embed import TinyHashEmbedder

        self.semantic_filter = semantic_filter
        self.word_count_threshold = word_count_threshold
        self.max_dist = max_dist
        self.top_k = top_k
        self.sim_threshold = sim_threshold
        self.model = (encoder_factory or TinyHashEmbedder)()

    def extract(self, url: str, content: str) -> list[dict]:
        import numpy as np

        from ..stages.embed import cosine_cluster

        chunks = [c for c in (content or "").split(self.DEL) if c.strip()]
        if not chunks:
            return []
        vecs = np.asarray(self.model.encode(chunks), dtype=np.float64)
        if self.semantic_filter:
            qv = np.asarray(
                self.model.encode([self.semantic_filter])[0], dtype=np.float64
            )
            qn = np.linalg.norm(qv)
            norms = np.linalg.norm(vecs, axis=1)
            denom = np.maximum(norms * qn, 1e-12)
            sims = vecs @ qv / denom
            keep = sims >= self.sim_threshold
            chunks = [c for c, k in zip(chunks, keep) if k]
            vecs = vecs[keep]
            if not chunks:
                return []
        labels = cosine_cluster(vecs, sim_threshold=1.0 - self.max_dist)
        clusters: dict[int, list[str]] = {}
        for i, lab in enumerate(labels.tolist()):
            clusters.setdefault(int(lab), []).append(chunks[i])
        out = []
        for lab in sorted(clusters):
            text = " ".join(clusters[lab])
            if len(text.split()) >= self.word_count_threshold:
                out.append({"index": lab, "tags": [], "content": text})
        return out

    def run(self, url: str, sections: list[str]) -> list[dict]:
        # all sections cluster TOGETHER (extraction_strategy.py:463-473)
        return self.extract(url, self.DEL.join(sections))


class NoExtractionStrategy(ExtractionStrategy):
    """Pass-through strategy (extraction_strategy.py:98-113): each section
    becomes {'index', 'tags': [], 'content'} unchanged — the reference's
    "no meaningful extraction" baseline."""

    input_format = "text"

    def extract(self, url: str, content: str) -> list[dict]:
        return [{"index": 0, "content": content}]

    def run(self, url: str, sections: list[str]) -> list[dict]:
        return [
            {"index": i, "tags": [], "content": s}
            for i, s in enumerate(sections)
        ]


class RegexExtractionStrategy(ExtractionStrategy):
    """Regex extraction: built-in catalog and/or custom patterns; emits
    {url, label, value, span} records (extraction_strategy.py:1711-1718)."""

    input_format = "text"

    def __init__(self, patterns: dict[str, str] | None = None, labels=None):
        if patterns is None:
            patterns = {
                k: v
                for k, v in _BUILTIN_PATTERNS.items()
                if labels is None or k in labels
            }
        self.compiled = {label: re.compile(p) for label, p in patterns.items()}

    def extract(self, url: str, content: str) -> list[dict]:
        out = []
        for label, rx in self.compiled.items():
            for m in rx.finditer(content):
                out.append(
                    {
                        "url": url,
                        "label": label,
                        "value": m.group(0),
                        "span": [m.start(), m.end()],
                    }
                )
        return out


# ---------------------------------------------------------------------------
# chunking (chunking_strategy.py)
# ---------------------------------------------------------------------------

class ChunkingStrategy:
    def chunk(self, text: str) -> list[str]:  # pragma: no cover
        raise NotImplementedError


class IdentityChunking(ChunkingStrategy):
    def chunk(self, text: str) -> list[str]:
        return [text]


class RegexChunking(ChunkingStrategy):
    def __init__(self, patterns=(r"\n\n",)):
        self.patterns = list(patterns)

    def chunk(self, text: str) -> list[str]:
        chunks = [text]
        for p in self.patterns:
            chunks = [piece for c in chunks for piece in re.split(p, c)]
        return [c for c in chunks if c.strip()]


class SlidingWindowChunking(ChunkingStrategy):
    def __init__(self, window_size: int = 100, step: int = 50):
        self.window_size = window_size
        self.step = step

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [" ".join(words)] if words else []
        return [
            " ".join(words[i : i + self.window_size])
            for i in range(0, len(words) - self.window_size + 1, self.step)
        ]


class OverlappingWindowChunking(ChunkingStrategy):
    def __init__(self, window_size: int = 1000, overlap: int = 100):
        self.window_size = window_size
        self.overlap = overlap

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        if not words:
            return []
        chunks = []
        start = 0
        while start < len(words):
            end = min(start + self.window_size, len(words))
            chunks.append(" ".join(words[start:end]))
            if end == len(words):
                break
            start = end - self.overlap
        return chunks


class FixedLengthWordChunking(ChunkingStrategy):
    """Non-overlapping fixed-size word chunks (chunking_strategy.py:147-171)."""

    def __init__(self, chunk_size: int = 100):
        self.chunk_size = chunk_size

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        return [
            " ".join(words[i : i + self.chunk_size])
            for i in range(0, len(words), self.chunk_size)
        ]


_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+(?=[\"'(\[]?[A-Z0-9])")


class NlpSentenceChunking(ChunkingStrategy):
    """Sentence chunking (chunking_strategy.py:65-90). The reference uses
    nltk's punkt tokenizer then returns ``list(set(sentences))`` —
    unordered. nltk is absent here, so this is a clean-room regex sentence
    splitter (break after ./!/? followed by whitespace and an
    uppercase/digit/bracket opener — the same heuristic the reference
    keeps commented out at :78-82); deliberate divergence: duplicates are
    removed in FIRST-OCCURRENCE order so output is deterministic."""

    def chunk(self, text: str) -> list[str]:
        sentences = [s.strip() for s in _SENTENCE_RE.split(text) if s.strip()]
        seen: set[str] = set()
        out = []
        for s in sentences:
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out


class TopicSegmentationChunking(ChunkingStrategy):
    """Topic segmentation (chunking_strategy.py:93-144). The reference
    delegates to nltk's TextTilingTokenizer; nltk is absent, so this is a
    clean-room implementation of the published TextTiling block-comparison
    algorithm (Hearst 1997, "TextTiling: Segmenting Text into
    Multi-paragraph Subtopic Passages"):

    1. lowercase word tokens → pseudo-sentences of ``w`` tokens;
    2. per gap, cosine similarity of the ``k``-pseudo-sentence blocks on
       either side (term-frequency vectors);
    3. depth score per gap = (left peak − sim) + (right peak − sim);
    4. boundaries where depth > mean + stdev·cutoff (liberal cutoff −0.5,
       nltk's LC default), snapped to the nearest following sentence
       boundary so chunks are cut at natural breaks.

    Deterministic; ``chunk_with_topics`` mirrors the reference's keyword
    step with a stopword-filtered frequency count (:121-134)."""

    _STOPWORDS = frozenset(
        "a an and are as at be by for from has he in is it its of on that "
        "the to was were will with this these those i you they we she him "
        "her them our your their not or but if then so no yes do does did "
        "have had can could would should may might must shall".split()
    )

    def __init__(self, num_keywords: int = 3, w: int = 20, k: int = 10,
                 cutoff: float = -0.5):
        self.num_keywords = num_keywords
        self.w = w
        self.k = k
        self.cutoff = cutoff

    def chunk(self, text: str) -> list[str]:
        import numpy as np

        tokens = re.findall(r"\w+", text.lower())
        n_ps = len(tokens) // self.w
        if n_ps < 2:
            return [text] if text.strip() else []
        # term-frequency vector per pseudo-sentence
        vocab: dict[str, int] = {}
        ps_vecs = []
        for i in range(n_ps):
            counts: dict[int, int] = {}
            for t in tokens[i * self.w : (i + 1) * self.w]:
                j = vocab.setdefault(t, len(vocab))
                counts[j] = counts.get(j, 0) + 1
            ps_vecs.append(counts)
        mat = np.zeros((n_ps, len(vocab)))
        for i, counts in enumerate(ps_vecs):
            for j, c in counts.items():
                mat[i, j] = c
        k = min(self.k, max(1, n_ps // 2))
        sims = np.zeros(n_ps - 1)
        for g in range(n_ps - 1):
            left = mat[max(0, g + 1 - k) : g + 1].sum(axis=0)
            right = mat[g + 1 : g + 1 + k].sum(axis=0)
            denom = np.linalg.norm(left) * np.linalg.norm(right)
            sims[g] = (left @ right) / denom if denom > 0 else 0.0
        # depth scoring: climb to the nearest peak on each side
        depths = np.zeros(n_ps - 1)
        for g in range(n_ps - 1):
            lpeak = sims[g]
            for i in range(g, -1, -1):
                if sims[i] >= lpeak:
                    lpeak = sims[i]
                else:
                    break
            rpeak = sims[g]
            for i in range(g, n_ps - 1):
                if sims[i] >= rpeak:
                    rpeak = sims[i]
                else:
                    break
            depths[g] = (lpeak - sims[g]) + (rpeak - sims[g])
        threshold = depths.mean() + depths.std() * self.cutoff
        gaps = [g for g in range(n_ps - 1) if depths[g] > threshold and depths[g] > 0]
        if not gaps:
            return [text]
        # token index of each candidate cut, snapped to the next sentence end
        sent_ends = []
        pos = 0
        for m in re.finditer(r"\w+", text.lower()):
            pos += 1
            tail = text[m.end() : m.end() + 3]
            if tail[:1] in ".!?":
                punct = len(tail) - len(tail.lstrip(".!?\"')"))
                sent_ends.append((pos, m.end() + punct))
            elif "\n\n" in tail:
                sent_ends.append((pos, m.end()))
        cuts = []
        for g in gaps:
            tok_idx = (g + 1) * self.w
            snapped = next(
                (cend for cnt, cend in sent_ends if cnt >= tok_idx), None
            )
            if snapped is not None and (not cuts or snapped > cuts[-1]):
                cuts.append(snapped)
        chunks = []
        start = 0
        for c in cuts:
            piece = text[start:c].strip()
            if piece:
                chunks.append(piece)
            start = c
        tail_piece = text[start:].strip()
        if tail_piece:
            chunks.append(tail_piece)
        return chunks or [text]

    def extract_keywords(self, text: str) -> list[str]:
        from collections import Counter

        tokens = [
            t for t in re.findall(r"\w+", text.lower())
            if t not in self._STOPWORDS
        ]
        return [w for w, _ in Counter(tokens).most_common(self.num_keywords)]

    def chunk_with_topics(self, text: str) -> list[tuple[str, list[str]]]:
        return [(seg, self.extract_keywords(seg)) for seg in self.chunk(text)]


# ---------------------------------------------------------------------------
# the Ray stage
# ---------------------------------------------------------------------------

class ExtractStage:
    """map_batches UDF: applies an ExtractionStrategy to a column of each
    batch, emitting (url, extracted JSON) — the Ray form of the reference's
    per-page ``extraction_strategy.run`` step (async_webcrawler.py:592-621).
    Strategy state (compiled regexes, parsed schema) is built once per
    worker in __init__ → use with concurrency= for an actor pool."""

    def __init__(
        self,
        strategy: ExtractionStrategy,
        content_col: str = "html",
        chunking: ChunkingStrategy | None = None,
    ):
        self.strategy = strategy
        self.content_col = content_col
        self.chunking = chunking or IdentityChunking()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        contents = batch.column(self.content_col).to_pylist()
        out = []
        for url, content in zip(urls, contents):
            content = decode_html(content)
            sections = self.chunking.chunk(content)
            records = self.strategy.run(url, sections)
            out.append(json.dumps(records, ensure_ascii=False))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "extracted": pa.array(out, pa.string()),
            }
        )

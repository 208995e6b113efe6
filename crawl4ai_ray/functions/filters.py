"""URL filters + scorers — vectorized re-expressions of the reference's
deep-crawl FilterChain / URLScorer machinery (deep_crawling/filters.py,
deep_crawling/scorers.py). Each filter/scorer exposes

    apply(url) -> bool / score(url) -> float       (scalar parity surface)
    apply_batch(urls) -> np.ndarray[bool] / score_batch(urls) -> np.ndarray

The batch forms are what the Ray stages use; stats counters mirror
FilterStats (filters.py:19-37) / ScoringStats (scorers.py:26-62) as simple
per-instance counters that stages surface into wave manifests.
"""

from __future__ import annotations

import fnmatch
import math
import re
from urllib.parse import urlparse

import numpy as np

from .urls import extract_extension, extract_year, get_base_domain, path_depth


class FilterStats:
    __slots__ = ("total", "passed", "rejected")

    def __init__(self):
        self.total = 0
        self.passed = 0
        self.rejected = 0

    def update(self, mask: np.ndarray):
        n = int(mask.size)
        p = int(mask.sum())
        self.total += n
        self.passed += p
        self.rejected += n - p

    def as_dict(self):
        return {"total": self.total, "passed": self.passed, "rejected": self.rejected}


class URLFilter:
    """Base: subclasses implement _mask(urls)->np.ndarray[bool]."""

    def __init__(self, name: str | None = None):
        self.name = name or type(self).__name__
        self.stats = FilterStats()

    def apply(self, url: str) -> bool:
        return bool(self.apply_batch([url])[0])

    def apply_batch(self, urls) -> np.ndarray:
        mask = self._mask(list(urls))
        self.stats.update(mask)
        return mask

    def _mask(self, urls: list[str]) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class URLPatternFilter(URLFilter):
    """Glob/regex URL pattern filter — the reference's full category
    machinery (filters.py:117-256): patterns classify as

    - REGEX (``^...``/``...$``/``\\d``): compiled raw, ``search``;
    - SUFFIX (one ``*``, ``*.ext``): extension lookup on
      ``url.split('?')[0].split('/')[-1].split('.')[-1]``;
    - PREFIX (one ``*``, ``.../*``): prefix match on ``url.split('?')[0]``
      with PATH-BOUNDARY checking — the prefix must be followed by
      ``/``, ``?``, ``#`` or end-of-path, so ``/api/*`` matches
      ``/api?x=1`` and ``/api#frag`` but never ``/apiv2/``
      (filters.py:228-243, r4 parity fix — the old glob translation
      demanded a literal ``/``);
    - DOMAIN (``*.host`` with ``://``): ``*.`` -> ``[^/]+\\.`` regex,
      anchored match;
    - PATH (everything else): ``**``->``.*``, ``{a,b}``->``(a|b)``,
      fnmatch translation, ``search`` (reference :249).

    ``reverse=True`` inverts (block-list)."""

    def __init__(self, patterns, use_glob: bool = True, reverse: bool = False):
        super().__init__()
        if isinstance(patterns, (str, re.Pattern)):
            patterns = [patterns]
        self._reverse = reverse
        self._suffixes = set()
        self._prefixes = set()
        self._domain_patterns = []
        self._path_patterns = []
        for p in patterns:
            if isinstance(p, re.Pattern):
                self._path_patterns.append(p)
                continue
            if p.startswith("^") or p.endswith("$") or "\\d" in p:
                self._path_patterns.append(re.compile(p))
                continue
            if p.count("*") == 1 and p.startswith("*."):
                self._suffixes.add(p[2:])
                continue
            if p.count("*") == 1 and p.endswith("/*"):
                self._prefixes.add(p[:-2])
                continue
            if "://" in p and p.startswith("*."):
                self._domain_patterns.append(
                    re.compile(p.replace("*.", r"[^/]+\."))
                )
                continue
            if "**" in p:
                p = p.replace("**", ".*")
            if "{" in p:
                p = re.sub(
                    r"\{([^}]+)\}",
                    lambda m: "(" + "|".join(m.group(1).split(",")) + ")",
                    p,
                )
            self._path_patterns.append(re.compile(fnmatch.translate(p)))

    def _match_one(self, u: str) -> bool:
        if self._suffixes:
            path = u.split("?")[0]
            if path.split("/")[-1].split(".")[-1] in self._suffixes:
                return True
        for dp in self._domain_patterns:
            if dp.match(u):
                return True
        if self._prefixes:
            path = u.split("?")[0]
            for prefix in self._prefixes:
                if path.startswith(prefix) and (
                    len(path) == len(prefix)
                    or path[len(prefix)] in ("/", "?", "#")
                ):
                    return True
        return any(pp.search(u) for pp in self._path_patterns)

    def _mask(self, urls):
        out = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            out[i] = self._match_one(u)
        if self._reverse:
            out = ~out
        return out


class DomainFilter(URLFilter):
    """Allow/block by registrable domain (filters.py:315-412 semantics):
    blocked wins; if allowed_domains set, subdomains of allowed pass."""

    def __init__(self, allowed_domains=None, blocked_domains=None):
        super().__init__()
        self._allowed = {d.lower() for d in (allowed_domains or [])}
        self._blocked = {d.lower() for d in (blocked_domains or [])}

    @staticmethod
    def _domain(url: str) -> str:
        try:
            d = urlparse(url).netloc.lower().split(":")[0]
            return re.sub(r"^www\.", "", d)
        except Exception:
            return ""

    def _mask(self, urls):
        out = np.empty(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            d = self._domain(u)
            base = get_base_domain(u)
            if d in self._blocked or base in self._blocked:
                out[i] = False
            elif self._allowed:
                out[i] = (
                    d in self._allowed
                    or base in self._allowed
                    or any(d.endswith("." + a) for a in self._allowed)
                )
            else:
                out[i] = True
        return out


class ContentTypeFilter(URLFilter):
    """Filter by URL file extension (filters.py:257-430 semantics): the
    extension comes from the path's last segment only (no '.' in the
    filename → pass, assumed html); allowed when the extension's MIME type
    contains any allowed type substring."""

    # the reference's full extension → MIME table (filters.py:263-352),
    # incl. the literal "unknown" → octet-stream fallback entry its own
    # tests probe (file.unknown passes an octet-stream filter; zip/exe
    # do not)
    _MIME_MAP = {
        "txt": "text/plain", "html": "text/html", "htm": "text/html",
        "xhtml": "application/xhtml+xml", "css": "text/css",
        "csv": "text/csv", "ics": "text/calendar",
        "js": "application/javascript",
        "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
        "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
        "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
        "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
        "m4a": "audio/mp4", "aac": "audio/aac",
        "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
        "avi": "video/x-msvideo", "mov": "video/quicktime",
        "flv": "video/x-flv", "wmv": "video/x-ms-wmv",
        "mkv": "video/x-matroska",
        "json": "application/json", "xml": "application/xml",
        "pdf": "application/pdf", "zip": "application/zip",
        "gz": "application/gzip", "tar": "application/x-tar",
        "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
        "exe": "application/vnd.microsoft.portable-executable",
        "msi": "application/x-msdownload",
        "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
        "otf": "font/otf",
        "doc": "application/msword", "dot": "application/msword",
        "docx": "application/vnd.openxmlformats-officedocument."
                "wordprocessingml.document",
        "xlsx": "application/vnd.openxmlformats-officedocument."
                "spreadsheetml.sheet",
        "xls": "application/vnd.ms-excel",
        "ppt": "application/vnd.ms-powerpoint",
        "pptx": "application/vnd.openxmlformats-officedocument."
                "presentationml.presentation",
        "odt": "application/vnd.oasis.opendocument.text",
        "ods": "application/vnd.oasis.opendocument.spreadsheet",
        "odp": "application/vnd.oasis.opendocument.presentation",
        "tar.gz": "application/gzip", "tgz": "application/gzip",
        "bz2": "application/x-bzip2",
        "rtf": "application/rtf",
        "apk": "application/vnd.android.package-archive",
        "epub": "application/epub+zip", "jar": "application/java-archive",
        "swf": "application/x-shockwave-flash",
        "midi": "audio/midi", "mid": "audio/midi",
        "ps": "application/postscript", "ai": "application/postscript",
        "eps": "application/postscript",
        "bin": "application/octet-stream",
        "dmg": "application/x-apple-diskimage",
        "iso": "application/x-iso9660-image",
        "deb": "application/x-debian-package", "rpm": "application/x-rpm",
        "sqlite": "application/vnd.sqlite3",
        "unknown": "application/octet-stream",
        "php": "application/x-httpd-php",
    }

    def __init__(self, allowed_types, check_extension: bool = True):
        super().__init__()
        if isinstance(allowed_types, str):
            allowed_types = [allowed_types]
        self._allowed = frozenset(t.lower() for t in allowed_types)
        self._check_extension = check_extension
        self._allowed_exts = frozenset(
            ext
            for ext, mime in self._MIME_MAP.items()
            if any(a in mime for a in self._allowed)
        )

    @staticmethod
    def _extension(url: str) -> str:
        if "://" in url:
            url = url.split("://", 1)[-1]
        path_start = url.find("/")
        path = url[path_start:] if path_start != -1 else ""
        filename = path.rsplit("/", 1)[-1] if "/" in path else ""
        if "." not in filename:
            return ""
        return filename.rpartition(".")[-1].lower()

    def _mask(self, urls):
        if not self._check_extension:
            return np.ones(len(urls), dtype=bool)
        out = np.empty(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            ext = self._extension(u)
            out[i] = (not ext) or ext in self._allowed_exts
        return out


class TrapFilter(URLFilter):
    """Drop spider-trap URLs (functions/urls.py trap_flags — repeated
    path segments, excessive depth, session ids, param explosions,
    over-long URLs, out-of-range calendar years). No reference analogue
    (a page-at-a-time crawler never meets traps); at frontier scale this
    sits in the deep-crawl FilterChain beside URLPatternFilter."""

    def _mask(self, urls):
        from .urls import trap_mask

        return trap_mask(list(urls))


class FilterChain:
    """AND of filters with early-exit, chain-level stats
    (filters.py:68-116)."""

    def __init__(self, filters=None):
        self.filters = tuple(filters or [])
        self.stats = FilterStats()

    def apply(self, url: str) -> bool:
        return bool(self.apply_batch([url])[0])

    def apply_batch(self, urls) -> np.ndarray:
        urls = list(urls)
        mask = np.ones(len(urls), dtype=bool)
        for f in self.filters:
            if not mask.any():
                break
            # only evaluate survivors, preserving each filter's stats on them
            idx = np.nonzero(mask)[0]
            sub = f.apply_batch([urls[i] for i in idx])
            mask[idx[~sub]] = False
        self.stats.update(mask)
        return mask


# ---------------------------------------------------------------------------
# Scorers (deep_crawling/scorers.py)
# ---------------------------------------------------------------------------

_SCORE_LOOKUP = [1.0, 0.5, 1.0 / 3.0, 0.25]  # scorers.py lookup for |depth-opt|
_FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4]  # scorers.py year diffs


class ScoringStats:
    __slots__ = ("count", "total", "min", "max")

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self.min = None
        self.max = None

    def update(self, scores: np.ndarray):
        if scores.size == 0:
            return
        self.count += int(scores.size)
        self.total += float(scores.sum())
        mn, mx = float(scores.min()), float(scores.max())
        self.min = mn if self.min is None else min(self.min, mn)
        self.max = mx if self.max is None else max(self.max, mx)

    def as_dict(self):
        return {
            "count": self.count,
            "total": self.total,
            "min": self.min,
            "max": self.max,
            "mean": (self.total / self.count) if self.count else None,
        }


class URLScorer:
    def __init__(self, weight: float = 1.0):
        self.weight = weight
        self.stats = ScoringStats()

    def score(self, url: str) -> float:
        return float(self.score_batch([url])[0])

    def score_batch(self, urls) -> np.ndarray:
        s = self._scores(list(urls)) * self.weight
        self.stats.update(s)
        return s

    def _scores(self, urls: list[str]) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class KeywordRelevanceScorer(URLScorer):
    """fraction of keywords present as substrings (scorers.py:160-188)."""

    def __init__(self, keywords, weight: float = 1.0, case_sensitive: bool = False):
        super().__init__(weight)
        self._case = case_sensitive
        self._keywords = [k if case_sensitive else k.lower() for k in keywords]

    def _scores(self, urls):
        out = np.empty(len(urls), dtype=np.float64)
        n = len(self._keywords)
        for i, u in enumerate(urls):
            if not self._case:
                u = u.lower()
            out[i] = sum(1 for k in self._keywords if k in u) / n if n else 0.0
        return out


class PathDepthScorer(URLScorer):
    """1/(1+|depth-optimal|) with small-distance lookup (scorers.py:190-244)."""

    def __init__(self, optimal_depth: int = 3, weight: float = 1.0):
        super().__init__(weight)
        self._optimal = optimal_depth

    def _scores(self, urls):
        out = np.empty(len(urls), dtype=np.float64)
        for i, u in enumerate(urls):
            d = abs(path_depth(u) - self._optimal)
            out[i] = _SCORE_LOOKUP[d] if d < 4 else 1.0 / (1.0 + d)
        return out


class ContentTypeScorer(URLScorer):
    """Extension → weight lookup (scorers.py:246-334)."""

    def __init__(self, type_weights: dict, weight: float = 1.0):
        super().__init__(weight)
        self._exact = {}
        self._regex = []
        for pattern, score in type_weights.items():
            if pattern.startswith(".") and pattern.endswith("$"):
                self._exact[pattern[1:-1]] = score
            else:
                self._regex.append((re.compile(pattern), score))
        self._regex.sort(key=lambda x: -x[1])

    def _scores(self, urls):
        out = np.zeros(len(urls), dtype=np.float64)
        for i, u in enumerate(urls):
            ext = extract_extension(u)
            if ext and ext in self._exact:
                out[i] = self._exact[ext]
                continue
            for pat, sc in self._regex:
                if pat.search(u):
                    out[i] = sc
                    break
        return out


class FreshnessScorer(URLScorer):
    """Year-in-URL freshness (scorers.py:336-428); 0.5 default w/o date."""

    def __init__(self, weight: float = 1.0, current_year: int = 2024):
        super().__init__(weight)
        self._year = current_year

    def _scores(self, urls):
        out = np.empty(len(urls), dtype=np.float64)
        for i, u in enumerate(urls):
            y = extract_year(u, self._year)
            if y is None:
                out[i] = 0.5
            else:
                diff = self._year - y
                out[i] = (
                    _FRESHNESS_SCORES[diff]
                    if diff < len(_FRESHNESS_SCORES)
                    else max(0.1, 1.0 - diff * 0.1)
                )
        return out


class DomainAuthorityScorer(URLScorer):
    """Domain → authority weight lookup (scorers.py:430-530)."""

    def __init__(self, domain_weights: dict, default_weight: float = 0.5, weight: float = 1.0):
        super().__init__(weight)
        self._weights = {d.lower(): s for d, s in domain_weights.items()}
        self._default = default_weight

    @staticmethod
    def _domain(url: str) -> str:
        start = url.find("://")
        start = 0 if start == -1 else start + 3
        end = len(url)
        for ch in "/?#":
            p = url.find(ch, start)
            if p != -1:
                end = min(end, p)
        domain = url[start:end]
        port = domain.rfind(":")
        if port != -1:
            domain = domain[:port]
        return domain.lower()

    def _scores(self, urls):
        return np.array(
            [self._weights.get(self._domain(u), self._default) for u in urls],
            dtype=np.float64,
        )


class CompositeScorer(URLScorer):
    """Sum of child scorers, optionally normalized (scorers.py:123-158)."""

    def __init__(self, scorers, normalize: bool = False):
        super().__init__(weight=1.0)
        self._scorers = list(scorers)
        self._normalize = normalize

    def _scores(self, urls):
        total = np.zeros(len(urls), dtype=np.float64)
        for s in self._scorers:
            total += s.score_batch(urls)
        if self._normalize and self._scorers:
            total /= len(self._scorers)
        return total


# ---------------------------------------------------------------------------
# head-peek filters (reference deep_crawling/filters.py:501-690): evaluate a
# candidate url against its target page's <head> section. Offline, the HEAD
# fetch is the corpus head-prefix parse (stages/link_preview.head_meta_batch
# machinery); these classes hold the pure, vectorizable scoring.
# ---------------------------------------------------------------------------


def head_fields(head_html: str) -> dict:
    """Title + insertion-ordered meta dict from raw head HTML, mirroring
    the reference's HeadPeekr regex extraction (utils.py:2840-2861)."""
    meta: dict[str, str] = {}
    for m in re.finditer(r"<meta[^>]+>", head_html):
        tag = m.group(0)
        name = re.search(r'name=["\'](.*?)["\']', tag)
        prop = re.search(r'property=["\'](.*?)["\']', tag)
        content = re.search(r'content=["\'](.*?)["\']', tag)
        if content and (name or prop):
            key = name.group(1) if name else prop.group(1)
            meta[key] = content.group(1)
    tm = re.search(r"<title>(.*?)</title>", head_html, re.IGNORECASE | re.DOTALL)
    return {"title": tm.group(1) if tm else "", "meta": meta}


class ContentRelevanceFilter(URLFilter):
    """BM25 head-relevance filter (reference deep_crawling/filters.py:
    501-575). The document is built from weighted head fields exactly as the
    reference does (title*3 ‖ description*2 ‖ keywords ‖ all meta values),
    scored with its simplified-IDF BM25 and thresholded. Deterministic
    variant: query terms iterate in first-occurrence order (the reference
    iterates a set — nondeterministic float-sum order)."""

    def __init__(self, query: str, threshold: float, k1: float = 1.2,
                 b: float = 0.75, avgdl: int = 1000):
        super().__init__(name="BM25RelevanceFilter")
        seen = set()
        self.query_terms = [
            t for t in query.lower().split() if not (t in seen or seen.add(t))
        ]
        self.threshold = threshold
        self.k1 = k1
        self.b = b
        self.avgdl = avgdl

    @staticmethod
    def build_document(title: str, meta: dict) -> str:
        return " ".join(
            [
                title * 3,
                meta.get("description", "") * 2,
                meta.get("keywords", ""),
                " ".join(meta.values()),
            ]
        )

    def score(self, title: str, meta: dict) -> float:
        doc_terms = self.build_document(title, meta).lower().split()
        doc_len = len(doc_terms)
        tf: dict[str, int] = {}
        for t in doc_terms:
            tf[t] = tf.get(t, 0) + 1
        score = 0.0
        for term in self.query_terms:
            term_freq = tf.get(term, 0)
            idf = math.log((1 + 1) / (term_freq + 0.5) + 1)  # simplified IDF
            numerator = term_freq * (self.k1 + 1)
            denominator = term_freq + self.k1 * (
                1 - self.b + self.b * (doc_len / self.avgdl)
            )
            score += idf * (numerator / denominator)
        return score

    def apply_head_batch(self, heads: list[dict]) -> np.ndarray:
        """heads: list of head_fields() dicts (empty head → reject, like
        the reference's failed HEAD fetch)."""
        out = np.zeros(len(heads), dtype=bool)
        for i, h in enumerate(heads):
            if not h or (not h.get("title") and not h.get("meta")):
                continue
            out[i] = self.score(h.get("title", ""), h.get("meta", {})) >= self.threshold
        self.stats.update(out)
        return out

    def _mask(self, urls):  # head-based filter: use apply_head_batch
        raise NotImplementedError("ContentRelevanceFilter needs head content")


class SEOFilter(URLFilter):
    """Quantitative SEO quality filter (reference deep_crawling/filters.py:
    576-690): weighted factors over title length, keyword presence, meta
    description length, canonical match, robots noindex, schema.org
    presence and url shape."""

    DEFAULT_WEIGHTS = {
        "title_length": 0.15,
        "title_kw": 0.18,
        "meta_description": 0.12,
        "canonical": 0.10,
        "robot_ok": 0.20,
        "schema_org": 0.10,
        "url_quality": 0.15,
    }

    def __init__(self, threshold: float = 0.65, keywords=None, weights=None):
        super().__init__(name="SEOFilter")
        self.threshold = threshold
        self._weights = weights or self.DEFAULT_WEIGHTS
        self._kw_patterns = (
            re.compile(
                r"\b({})\b".format("|".join(map(re.escape, keywords or []))), re.I
            )
            if keywords
            else None
        )

    def score(self, url: str, head_html: str) -> float:
        from urllib.parse import urlparse

        f = head_fields(head_html)
        meta, title = f["meta"], f["title"]
        parsed = urlparse(url)
        scores = {
            "title_length": self._score_title_length(title),
            "title_kw": self._score_keyword_presence(title),
            "meta_description": self._score_meta_description(
                meta.get("description", "")
            ),
            "canonical": self._score_canonical(meta.get("canonical"), url),
            "robot_ok": 1.0 if "noindex" not in meta.get("robots", "") else 0.0,
            "schema_org": self._score_schema_org(head_html),
            "url_quality": self._score_url_quality(parsed),
        }
        return sum(w * scores[k] for k, w in self._weights.items())

    @staticmethod
    def _score_title_length(title: str) -> float:
        length = len(title)
        if 50 <= length <= 60:
            return 1.0
        if 40 <= length < 50 or 60 < length <= 70:
            return 0.7
        return 0.3

    def _score_keyword_presence(self, text: str) -> float:
        if not self._kw_patterns:
            return 0.0
        return min(len(self._kw_patterns.findall(text)) * 0.3, 1.0)

    @staticmethod
    def _score_meta_description(desc: str) -> float:
        length = len(desc)
        if 140 <= length <= 160:
            return 1.0
        return 0.5 if 120 <= length <= 200 else 0.2

    @staticmethod
    def _score_canonical(canonical, original: str) -> float:
        if not canonical:
            return 0.5
        return 1.0 if canonical == original else 0.2

    @staticmethod
    def _score_schema_org(html: str) -> float:
        return (
            1.0
            if re.search(r'<script[^>]+type=["\']application/ld\+json', html)
            else 0.0
        )

    @staticmethod
    def _score_url_quality(parsed) -> float:
        score = 1.0
        path = parsed.path.lower()
        if len(path) > 80:
            score *= 0.7
        if re.search(r"\d{4}", path):
            score *= 0.8
        if parsed.query:
            score *= 0.6
        if "_" in path:
            score *= 0.9
        return score

    def apply_head_batch(self, urls: list[str], head_htmls: list[str]) -> np.ndarray:
        out = np.zeros(len(urls), dtype=bool)
        for i, (u, h) in enumerate(zip(urls, head_htmls)):
            if not h:
                continue
            out[i] = self.score(u, h) >= self.threshold
        self.stats.update(out)
        return out

    def _mask(self, urls):
        raise NotImplementedError("SEOFilter needs head content")

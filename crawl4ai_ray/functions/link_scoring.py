"""Link intrinsic/contextual scoring — re-expression of the reference's
score_links path (utils.py:3078-3371: extract_page_context once per page,
calculate_link_intrinsic_score per link, calculate_total_score merge).
Pure functions, called from the scrape stage when ``score_links`` is on.
"""

from __future__ import annotations

from urllib.parse import urlparse

_STRIP = '.,!?;:"()[]{}'
_DOC_DOMAINS = ("docs.", "api.", "developer.", "reference.")
_NAV_CLASSES = ("nav", "menu", "primary", "main", "important")
_BAD_CLASSES = ("ad", "sponsor", "track", "promo", "banner")
_GOOD_RELS = ("canonical", "next", "prev", "chapter")
_BAD_RELS = ("nofollow", "sponsored", "ugc")
_GOOD_PATHS = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")
_MEDIUM_PATHS = ("/blog/", "/article/", "/post/", "/news/")
_BAD_PATHS = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")
_GENERIC_TEXTS = ("click here", "read more", "more info", "link", "here")
_DOC_KEYWORDS = ("api", "reference", "guide", "tutorial", "example")


def extract_page_context(
    page_title: str, headlines_text: str, meta_description: str, base_url: str
) -> dict:
    """Once-per-page context for link scoring (utils.py:3078-3121)."""
    context = {
        "terms": set(),
        "headlines": headlines_text or "",
        "meta_description": meta_description or "",
        "domain": "",
        "is_docs_site": False,
    }
    try:
        parsed = urlparse(base_url)
        context["domain"] = parsed.netloc.lower()
        context["is_docs_site"] = any(d in context["domain"] for d in _DOC_DOMAINS)
        all_text = (
            (page_title or "") + " " + context["headlines"] + " " + context["meta_description"]
        ).lower()
        context["terms"] = {
            w.strip(_STRIP) for w in all_text.split() if len(w.strip(_STRIP)) > 2
        }
    except Exception:
        pass
    return context


def calculate_link_intrinsic_score(
    link_text: str,
    url: str,
    title_attr: str,
    class_attr: str,
    rel_attr: str,
    page_context: dict,
) -> float:
    """0–10 link quality heuristic (utils.py:3123-3235 rules, verbatim
    semantics: attr quality, url structure, text quality, term overlap,
    docs-site bonus)."""
    score = 0.0
    try:
        if title_attr and len(title_attr.strip()) > 3:
            score += 1.0
        class_str = (class_attr or "").lower()
        if any(c in class_str for c in _NAV_CLASSES):
            score += 1.5
        if any(c in class_str for c in _BAD_CLASSES):
            score -= 1.0
        rel_str = (rel_attr or "").lower()
        if any(r in rel_str for r in _GOOD_RELS):
            score += 1.0
        if any(r in rel_str for r in _BAD_RELS):
            score -= 0.5

        url_lower = url.lower()
        if any(p in url_lower for p in _GOOD_PATHS):
            score += 2.0
        elif any(p in url_lower for p in _MEDIUM_PATHS):
            score += 1.0
        if any(p in url_lower for p in _BAD_PATHS):
            score -= 1.5
        url_depth = url.count("/") - 2
        if url_depth <= 2:
            score += 1.0
        elif url_depth > 5:
            score -= 0.5
        if url.startswith("https://"):
            score += 0.5

        if link_text:
            text_clean = link_text.strip()
            if len(text_clean) > 3:
                score += 1.0
            word_count = len(text_clean.split())
            if word_count >= 2:
                score += 0.5
            if word_count >= 4:
                score += 0.5
            if text_clean.lower() in _GENERIC_TEXTS:
                score -= 1.0

        if page_context.get("terms") and link_text:
            link_words = {
                w.strip(_STRIP).lower()
                for w in link_text.split()
                if len(w.strip(_STRIP)) > 2
            }
            if link_words:
                overlap = len(link_words & page_context["terms"])
                if overlap > 0:
                    score += (overlap / min(len(link_words), 10)) * 2.0

        if page_context.get("is_docs_site", False):
            if link_text and any(k in link_text.lower() for k in _DOC_KEYWORDS):
                score += 1.0
    except Exception:
        score = 0.5
    return max(0.0, min(score, 10.0))


def calculate_total_score(
    intrinsic_score: float | None = None, contextual_score: float | None = None
) -> float | None:
    """70% intrinsic (rescaled /10) + 30% contextual (utils.py:3238-3371);
    falls back to whichever side is present."""
    if intrinsic_score is None and contextual_score is None:
        return None
    if contextual_score is None:
        return intrinsic_score / 10.0 if intrinsic_score is not None else None
    if intrinsic_score is None:
        return contextual_score
    return 0.7 * (intrinsic_score / 10.0) + 0.3 * contextual_score

"""Text-token hygiene + small parse helpers (reference utils.py misc)."""

from __future__ import annotations

import json
import re

# Stop/noise sets in the spirit of clean_tokens (utils.py:2405-2630) — the
# reference inlines a large english stopword list; behaviourally what
# matters is: drop stopwords, noise words and tokens shorter than 3 chars.
STOP_WORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the
    to was were will with this these those i you your they them their we our
    us me my mine his her she him himself herself itself do does did doing
    have had having would should could can cannot not no nor so than then
    there here when where which who whom why how all any both each few more
    most other some such only own same too very s t just don now""".split()
)
NOISE_WORDS = frozenset(
    "click here read more learn info page home menu skip next prev previous".split()
)


def clean_tokens(tokens: list[str]) -> list[str]:
    """Drop stopwords / noise words / short tokens (utils.py:2405-2630)."""
    return [
        t
        for t in tokens
        if len(t) > 2 and t.lower() not in STOP_WORDS and t.lower() not in NOISE_WORDS
    ]


_SPLIT_RE = re.compile(r"[\s\-_,.;:!?()\[\]{}\"']+")


def advanced_split(text: str) -> list[str]:
    """Punctuation-aware splitter (utils.py:419)."""
    return [t for t in _SPLIT_RE.split(text) if t]


def split_and_parse_json_objects(text: str) -> tuple[list, list[str]]:
    """Extract well-formed top-level JSON objects from mixed text
    (utils.py:707): returns (parsed, unparsable_segments)."""
    parsed, bad = [], []
    depth, start = 0, None
    in_str, esc = False, False
    for i, ch in enumerate(text):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            if depth > 0:
                depth -= 1
                if depth == 0 and start is not None:
                    seg = text[start : i + 1]
                    try:
                        parsed.append(json.loads(seg))
                    except json.JSONDecodeError:
                        bad.append(seg)
                    start = None
    return parsed, bad


def extract_xml_data(tags: list[str], xml: str) -> dict[str, str]:
    """Naive first-occurrence tag text extraction (utils.py:1688)."""
    out = {}
    for tag in tags:
        m = re.search(rf"<{tag}\b[^>]*>(.*?)</{tag}>", xml, re.S | re.I)
        out[tag] = m.group(1).strip() if m else ""
    return out


def sanitize_input_encode(text) -> str:
    """Encoding hygiene (utils.py:752-824): valid utf-8 str out of
    whatever came in."""
    if text is None:
        return ""
    if isinstance(text, bytes):
        return text.decode("utf-8", errors="replace")
    return str(text).encode("utf-8", errors="replace").decode("utf-8")


def escape_json_string(s: str) -> str:
    return json.dumps(s)[1:-1]


_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_HSPACE_RE = re.compile(r"[ \t]+")
_VSPACE_RE = re.compile(r"\n{3,}")


def normalize_text(text: str) -> str:
    """Unicode/whitespace normalization for corpus text — the ftfy-lite
    cleanup every training-data pipeline runs before tokenization:
    NFC-compose (e + combining accent → é), strip C0 controls (keeping
    \\n and \\t), collapse horizontal-whitespace runs to one space, cap
    blank-line runs at one, trim. Rule ORDER is part of the contract —
    the SQL oracle (nfc_normalize + regexp_replace chain) mirrors it
    step for step, so don't reorder without changing both."""
    import unicodedata

    t = unicodedata.normalize("NFC", text)
    t = _CTRL_RE.sub("", t)
    t = _HSPACE_RE.sub(" ", t)
    t = _VSPACE_RE.sub("\n\n", t)
    # after the chain the edges can only hold ' ' or '\n'; strip exactly
    # those (not full unicode whitespace) so DuckDB's trim(x, ' '||chr(10))
    # is the literal same operation
    return t.strip(" \n")

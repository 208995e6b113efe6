"""Pattern redaction — the scrub stage of a training-data pipeline.

Before web text is trained on, PII-shaped spans (emails, phones, IPs,
credit cards, …) are replaced with typed placeholders. This is the
map-only redaction stage: the pattern catalog is the same 21-pattern
built-in set the extraction surface exposes
(functions/extraction.py _BUILTIN_PATTERNS, mirroring the reference's
RegexExtractionStrategy catalog, extraction_strategy.py:1784-1812) —
extraction *finds* the spans, redaction *rewrites* them.

Ray shape: a callable class for ``map_batches`` — patterns compile once
per actor in ``__init__``, each batch is rewritten row-wise with the
compiled regexes (regex substitution is inherently per-string; the
per-actor compile and Arrow-in/Arrow-out batching are what keep it fast).
No shuffle; safe at any scale.
"""

from __future__ import annotations

import re

import pyarrow as pa


class Redactor:
    """map_batches UDF: (id, text) → (id, text_redacted, n_redacted).

    ``patterns``: {label: regex} applied in dict order (document overlap
    ordering explicitly — e.g. redact emails before bare domains); each
    match is replaced by ``[LABEL]`` (uppercased) unless ``replacement``
    overrides the template.
    """

    def __init__(
        self,
        patterns: dict[str, str] | None = None,
        labels: list[str] | None = None,
        replacement: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        from ..functions.extraction import _BUILTIN_PATTERNS

        if patterns is None:
            patterns = {
                k: v
                for k, v in _BUILTIN_PATTERNS.items()
                if labels is None or k in labels
            }
        self.compiled = [
            (re.compile(p), replacement or f"[{label.upper()}]")
            for label, p in patterns.items()
        ]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_text, out_n = [], []
        for t in batch.column(self.text_col).to_pylist():
            t = t or ""
            n = 0
            for rx, repl in self.compiled:
                t, k = rx.subn(repl, t)
                n += k
            out_text.append(t)
            out_n.append(n)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "text_redacted": pa.array(out_text, pa.string()),
                "n_redacted": pa.array(out_n, pa.int64()),
            }
        )


def redact(
    ds,
    patterns: dict[str, str] | None = None,
    labels: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
    batch_size: int = 256,
):
    """Dataset-level wrapper: column-pruned input, actor pool when
    ``concurrency`` is given (compile-once-per-actor)."""
    return ds.select_columns([id_col, text_col]).map_batches(
        Redactor,
        fn_constructor_kwargs=dict(
            patterns=patterns, labels=labels, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
    )

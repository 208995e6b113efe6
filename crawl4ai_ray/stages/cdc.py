"""Content-defined chunking (CDC) dedup — the rsync/LBFS/FastCDC family.

Fixed-size chunking breaks on insertion: one added byte shifts every
later chunk boundary, so two 99%-identical page snapshots share no
chunks. CDC instead cuts wherever a *content-derived* rolling hash over
a small window hits a boundary condition, so boundaries re-synchronise
right after any local edit and the unchanged remainder deduplicates.
(Muthitacharoen, Chen & Mazières, "A low-bandwidth network file system",
SOSP 2001; Xia et al., "FastCDC", USENIX ATC 2016.)

Spec (frozen; mirrored operand-for-operand by the SQL oracle):
  - unit = Unicode code points (both engines' native string indexing);
  - window W = 8, polynomial hash h(s) = sum_{j<W} cp[s+j] * B^(W-1-j)
    mod M with B = 1000003, M = 2^31 - 1 (term < 2^52, 8-term sum
    < 2^55 — exact in int64 on both engines);
  - a cut AFTER code point s+W-1 whenever h(s) % D == 0 (D = 64, so
    expected chunk length ~64 code points), plus a forced cut at the
    end of the document; no min/max chunk clamp (keeps the SQL mirror
    windowless-recursion-free);
  - chunk key = md5 hex of the chunk's text.

Distributed shape: pure map_batches over documents — each batch emits
per-(doc, chunk_hash) partial rows (never raw text), then ONE
groupby(chunk_hash) closes the global chunk store. Shuffle volume is
O(chunks), ~1/64 of corpus code points.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

CDC_WINDOW = 8
CDC_BASE = 1000003
CDC_MOD = 2**31 - 1
CDC_DIVISOR = 64

_POWERS = np.array(
    [pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD) for j in range(CDC_WINDOW)],
    dtype=np.int64,
)


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def chunk_cuts(cp: np.ndarray) -> np.ndarray:
    """Sorted, unique cut positions (code-point indices, exclusive ends).
    Always ends with len(cp); empty input → no cuts."""
    n = cp.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n >= CDC_WINDOW:
        win = np.lib.stride_tricks.sliding_window_view(cp % CDC_MOD, CDC_WINDOW)
        h = (win * _POWERS).sum(axis=1) % CDC_MOD
        cuts = np.nonzero(h % CDC_DIVISOR == 0)[0] + CDC_WINDOW
    else:
        cuts = np.zeros(0, dtype=np.int64)
    return np.unique(np.append(cuts, n)).astype(np.int64)


def chunk_text(text: str) -> list[str]:
    """The document's CDC chunks, in order (concatenation == text)."""
    cp = _codepoints(text)
    prev = 0
    out = []
    for cut in chunk_cuts(cp):
        out.append(text[prev:cut])
        prev = int(cut)
    return out


def doc_chunk_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-(doc, chunk_hash) partial rows: local occurrence count + chunk
    length. Raw chunk text never leaves the batch — only 32-char keys."""
    ids, hs, chars, cs = [], [], [], []
    for doc_id, text in zip(
        batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
    ):
        local: dict[str, list] = {}
        for ch in chunk_text(text or ""):
            k = hashlib.md5(ch.encode("utf-8")).hexdigest()
            e = local.get(k)
            if e is None:
                local[k] = [len(ch), 1]
            else:
                e[1] += 1
        for k, (ln, c) in local.items():
            ids.append(doc_id)
            hs.append(k)
            chars.append(ln)
            cs.append(c)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "chunk_hash": pa.array(hs, pa.string()),
            "chunk_chars": pa.array(chars, pa.int64()),
            "c": pa.array(cs, pa.int64()),
        }
    )


def chunk_store(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Global CDC chunk store: one row per distinct chunk with its total
    occurrence count, distinct-document count and length."""
    from ray.data.aggregate import Count, Max, Sum

    return (
        docs.map_batches(
            lambda b: doc_chunk_rows(b, id_col, text_col), batch_format="pyarrow"
        )
        .groupby("chunk_hash")
        .aggregate(Sum("c"), Count(), Max("chunk_chars"))
        .map_batches(
            lambda b: pa.table(
                {
                    "chunk_hash": b.column("chunk_hash"),
                    "n_occurrences": b.column("sum(c)").cast(pa.int64()),
                    "n_docs": b.column("count()").cast(pa.int64()),
                    "chunk_chars": b.column("max(chunk_chars)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

"""Corpus-frequency boilerplate segment removal (RefinedWeb "line dedup").

RefinedWeb / CCNet-style pipelines drop text segments (lines, in corpora
with line structure) that recur across many documents — navigation chrome,
cookie banners, footers — and keep each document's residual text. This is
a *corpus-level* transform, distinct from the pairwise dedup family in
``stages/dedup.py``: the unit removed is a segment, the decision statistic
is the segment's document frequency over the whole corpus, and the output
is the cleaned corpus itself.

Ray-Data plan (two passes over the corpus, one small shuffle):

1. map_batches: per doc, the *distinct* segment 128-bit keys — only
   ``(seg_h1, doc_id)`` pairs ever shuffle, never text.
2. ``groupby(seg_h).count()`` → segments with doc-frequency > ``max_docs``.
   Boilerplate is by construction a small set (segments shared by many
   docs); it is collected once, ``ray.put`` into plasma, and probed
   zero-copy by every pass-2 task — the broadcast-semijoin shape of
   ``stages/decontaminate.py``. ``cap`` bounds the driver fold; overflow
   raises rather than silently under-removing.
3. map_batches: re-segment each doc, drop members, reassemble the text.

Segment model: production corpora split on newline (``width=None``). The
synthetic documents table has no line structure, so the deterministic
stand-in is fixed non-overlapping ``width``-token windows (the final
partial window is a segment too); both engines of the correctness gate
apply the identical model. Keys are 128-bit (hash64 ‖ hash64_alt,
``functions/hashing.py`` pinned spec) so a collision cannot silently drop
a clean segment at corpus scale.

Reference anchor: crawl4ai has no corpus-level stage like this (it is a
per-page framework); the semantics follow the published RefinedWeb
(Penedo et al. 2023, §3.3 line-wise filtering) and CCNet pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import hash64, hash64_alt


def _segments(text: str | None, width: int | None) -> list[str]:
    """The frozen segment model shared by both passes (and mirrored by the
    SQL oracle): newline lines, or non-overlapping width-token windows
    with the trailing partial window kept as a segment."""
    if not text:
        return []
    if width is None:
        return text.split("\n")
    toks = text.split()
    return [" ".join(toks[i : i + width]) for i in range(0, len(toks), width)]


def _batch_keys(texts: list[str | None], width: int | None, distinct: bool):
    """Flatten a batch's segments and hash them in ONE vectorized call.

    Returns (doc_index_per_segment, segment_strings, key128_per_segment).
    """
    doc_idx: list[int] = []
    segs: list[str] = []
    for i, t in enumerate(texts):
        s = _segments(t, width)
        if distinct:
            s = list(dict.fromkeys(s))  # order-stable within doc
        doc_idx.extend([i] * len(s))
        segs.extend(s)
    if not segs:
        empty = np.empty(0, dtype=np.uint64)
        return np.empty(0, dtype=np.int64), segs, (empty, empty)
    h1 = hash64(segs)
    h2 = hash64_alt(segs)
    return np.asarray(doc_idx, dtype=np.int64), segs, (h1, h2)


def boilerplate_keys(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    width: int | None = None,
    max_docs: int = 2,
    cap: int = 1_000_000,
):
    """Pass 1+2: the 128-bit keys of segments whose document frequency
    exceeds ``max_docs``, as a plasma-broadcast frozenset ObjectRef.

    Returns ``(ref, n_boiler)``. Raises if the boilerplate set exceeds
    ``cap`` (a broadcast that big means the threshold is wrong, not that
    the driver should swallow it)."""

    def seg_pairs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        idx, _, (h1, h2) = _batch_keys(texts, width, distinct=True)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[idx]
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    counts = (
        docs.map_batches(seg_pairs, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .count()
    )

    def over(batch: pa.Table) -> pa.Table:
        if "count()" not in batch.column_names:  # empty-corpus schema loss
            return pa.table(
                {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64())}
            )
        mask = pa.compute.greater(batch.column("count()"), pa.scalar(max_docs))
        return batch.filter(mask).select(["h1", "h2"])

    boiler = counts.map_batches(over, batch_format="pyarrow")
    keys: set[int] = set()
    for b in boiler.iter_batches(batch_format="pyarrow"):
        a1 = b.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        a2 = b.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
        for x, y in zip(a1.tolist(), a2.tolist()):
            keys.add((x << 64) | y)
        if len(keys) > cap:
            raise ValueError(
                f"boilerplate set exceeds cap={cap}; raise max_docs or cap"
            )
    return ray.put(frozenset(keys)), len(keys)


class SegmentFilter:
    """Actor-pool pass 3: probe the broadcast boilerplate key set and
    reassemble each doc from its surviving segments. The plasma ref is
    resolved once per actor."""

    def __init__(self, keys_ref, text_col: str, width: int | None):
        self.keys: frozenset[int] = ray.get(keys_ref)
        self.text_col = text_col
        self.width = width
        self.joiner = "\n" if width is None else " "

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        idx, segs, (h1, h2) = _batch_keys(texts, self.width, distinct=False)
        key128 = [
            (int(a) << 64) | int(b)
            for a, b in zip(h1.view(np.uint64).tolist(), h2.view(np.uint64).tolist())
        ]
        keep = [k not in self.keys for k in key128]
        n = len(texts)
        n_seg = np.zeros(n, dtype=np.int64)
        n_kept = np.zeros(n, dtype=np.int64)
        kept_segs: list[list[str]] = [[] for _ in range(n)]
        for j, d in enumerate(idx.tolist()):
            n_seg[d] += 1
            if keep[j]:
                n_kept[d] += 1
                kept_segs[d].append(segs[j])
        clean = [self.joiner.join(s) for s in kept_segs]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_seg": pa.array(n_seg, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "clean_text": pa.array(clean, pa.string()),
            }
        )


def line_dedup(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    width: int | None = None,
    max_docs: int = 2,
    concurrency=(1, 4),
    boiler_cap: int = 1_000_000,
) -> "ray.data.Dataset":
    """Remove corpus-frequent segments from every document.

    ``max_docs`` is a document-frequency threshold and therefore NOT
    scale-invariant — a value tuned at 500k docs flags far more
    segments at 10M; callers scaling the corpus should scale it (and
    ``boiler_cap``, which bounds the broadcast key set) with n.

    Output schema: (doc_id, n_seg, n_kept, clean_text)."""
    ref, _ = boilerplate_keys(
        docs, text_col=text_col, width=width, max_docs=max_docs,
        cap=boiler_cap,
    )
    return docs.map_batches(
        SegmentFilter,
        fn_constructor_args=(ref, text_col, width),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

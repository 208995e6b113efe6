"""Unigram language-model quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2019) scores every document with a language model
trained on a trusted corpus and buckets documents into head/middle/tail by
perplexity; the tail is dropped or down-weighted before training. The
in-container stand-in for KenLM is a unigram model fit on the corpus
itself — the distributed plan is identical to the production shape:

1. Token counts: per-batch ``Counter`` partials (map-side combine) →
   one small ``groupby(token).sum`` — only (token, partial_count) rows
   shuffle, never text.
2. Vocabulary cap: the top ``vocab_k`` tokens by (count desc, token asc)
   become explicit classes; everything else folds into ONE out-of-vocab
   class. This bounds the broadcast model size no matter how large the
   corpus vocabulary grows (the 100 TB guardrail), exactly like
   production LM vocabularies.
3. The per-token negative log-probabilities are pre-quantized to
   **fixed-point int64** (``round(-ln(p) * 1e8)``) on the driver, the
   tiny model dict is ``ray.put`` once, and scoring is an actor-pool
   ``map_batches``: per doc, ``nll_fixed = Σ count(tok) · q(tok)`` —
   an INTEGER sum, so the result is bit-exact regardless of summation
   order, batch boundaries, or partitioning. (A float accumulation
   would make the correctness gate hash-unstable across plans; the
   ``bm25_topk`` float discipline avoids order-dependence by fixed
   3-term expressions — here docs have hundreds of terms, so we
   quantize instead.)

Smoothing: add-one over (vocab_k + 1) classes —
``p(tok) = (c_tok + 1) / (n_total + vocab_k + 1)``. An OOV token is
priced at the *per-type* rate ``oov_total // n_oov_types`` (floor — still
integer-exact), NOT the pooled OOV mass: pooling would make rare tokens
look as probable as the head of the vocabulary and invert the filter.

Output: (doc_id, dl, nll_fixed, mean_nll_fixed, bucket) where
``mean_nll_fixed = nll_fixed // dl`` (floor division — still exact
integers) and ``bucket`` is head/middle/tail by fixed thresholds on
``mean_nll_fixed``.

Reference anchor: crawl4ai has no corpus LM stage (per-page framework);
semantics follow the published CCNet pipeline.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray

OOV = "\x00oov"  # cannot collide with whitespace-split tokens


def token_counts(docs: "ray.data.Dataset", text_col: str = "text"):
    """Corpus token counts as a small Dataset of (w, c) — map-side
    combined, so the shuffle carries one row per distinct token per
    batch, independent of corpus length."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").split())
        ws = sorted(c)
        return pa.table(
            {
                "w": pa.array(ws, pa.string()),
                "c": pa.array([c[w] for w in ws], pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .sum("c")
        .rename_columns({"sum(c)": "c"})
    )


def fit_unigram(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    vocab_k: int = 65536,
):
    """Fit the capped-vocab unigram model. Returns
    ``(model_ref, n_total, v_kept)`` where model_ref is a plasma
    ObjectRef to a dict token → fixed-point nll (int), with the OOV
    class under the ``OOV`` key.

    The driver holds at most ``vocab_k + |batches|`` rows transiently
    (counts are map-side combined); the broadcast dict is ≤ vocab_k+1
    entries regardless of corpus size."""
    counts = token_counts(docs, text_col)
    rows = counts.to_pandas()
    if "c" not in rows.columns:  # all-empty corpus: groupby emits no schema
        import pandas as pd

        rows = pd.DataFrame({"w": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")})
    rows = rows.sort_values(["c", "w"], ascending=[False, True], kind="mergesort")
    n_total = int(rows["c"].sum())
    kept = rows.iloc[:vocab_k]
    v_kept = len(kept)
    v_distinct = len(rows)
    oov_total = n_total - int(kept["c"].sum())
    oov_rate = oov_total // max(v_distinct - v_kept, 1)
    denom = n_total + v_kept + 1

    def q(c: int) -> int:
        # identical expression tree to the SQL oracle:
        # floor(-ln((c+1)/denom) * 1e8 + 0.5) over libm ln
        p = float(c + 1) / float(denom)
        return int(math.floor(-math.log(p) * 1e8 + 0.5))

    model = {w: q(int(c)) for w, c in zip(kept["w"], kept["c"])}
    model[OOV] = q(oov_rate)
    return ray.put(model), n_total, v_kept


class UnigramScorer:
    """Actor-pool scoring stage: integer fixed-point nll accumulation.
    The model dict is resolved from plasma once per actor."""

    def __init__(self, model_ref, text_col: str = "text",
                 head_t: int = 0, tail_t: int = 0, carry_cols: tuple = ()):
        self.model: dict = ray.get(model_ref)
        self.oov = self.model[OOV]
        self.text_col = text_col
        self.head_t = head_t
        self.tail_t = tail_t
        self.carry_cols = tuple(carry_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        dl = np.zeros(n, dtype=np.int64)
        nll = np.zeros(n, dtype=np.int64)
        get = self.model.get
        oov = self.oov
        for i, t in enumerate(texts):
            toks = (t or "").split()
            dl[i] = len(toks)
            s = 0
            for w, c in Counter(toks).items():
                s += c * get(w, oov)
            nll[i] = s
        mean = np.where(dl > 0, nll // np.maximum(dl, 1), 0)
        bucket = np.where(
            mean < self.head_t, "head", np.where(mean < self.tail_t, "middle", "tail")
        )
        cols = {
            "doc_id": batch.column("doc_id"),
            "dl": pa.array(dl, pa.int64()),
            "nll_fixed": pa.array(nll, pa.int64()),
            "mean_nll_fixed": pa.array(mean, pa.int64()),
            "bucket": pa.array(bucket.tolist(), pa.string()),
        }
        # passthrough columns (e.g. the text for a downstream export) —
        # a pure map, so carrying them costs no shuffle
        for c in self.carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)


def unigram_lm_score(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    vocab_k: int = 65536,
    head_t: int = 0,
    tail_t: int = 0,
    concurrency=(1, 4),
    carry_cols: tuple = (),
) -> "ray.data.Dataset":
    """Score every document with the corpus-fit capped unigram LM.

    ``head_t`` / ``tail_t``: fixed mean-nll thresholds (1e-8 units)
    splitting head < head_t ≤ middle < tail_t ≤ tail."""
    model_ref, _, _ = fit_unigram(docs, text_col, vocab_k)
    return docs.map_batches(
        UnigramScorer,
        fn_constructor_args=(model_ref, text_col, head_t, tail_t, carry_cols),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

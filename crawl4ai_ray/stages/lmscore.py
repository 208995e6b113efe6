"""Unigram language-model quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2019) scores every document with a language model
trained on a trusted corpus and buckets documents into head/middle/tail by
perplexity; the tail is dropped or down-weighted before training. The
in-container stand-in for KenLM is a unigram model fit on the corpus
itself — the distributed plan is identical to the production shape:

1. Token counts: per-batch polars explode+groupby partials (map-side
   combine) → one ``groupby(token).sum`` — only (token, partial_count)
   rows shuffle, never text.
2. Vocabulary cap — **fully distributed, exact**: the top ``vocab_k``
   tokens by (count desc, token asc) become explicit classes. Selection
   is (a) a per-block top-``vocab_k`` prune inside ``map_batches`` (after
   the groupby each token is globally unique, so every global top-k
   member survives its block's local top-k), then (b) ONE distributed
   ``sort(count desc, token asc).limit(vocab_k)`` over the pruned set
   (≤ vocab_k × num_blocks rows). The driver receives exactly
   ``vocab_k`` rows — never the full distinct vocabulary, which at web
   scale is billions of rows (typo'd words, URLs, hex strings).
   Corpus totals (n_total, v_distinct) come from per-block scalar
   partials (one row per block) summed on the driver — both folds are
   bounded regardless of corpus size (the 100 TB guardrail).
3. The per-token negative log-probabilities are pre-quantized to
   **fixed-point int64** (``round(-ln(p) * 1e8)``) on the driver, the
   tiny model dict is ``ray.put`` once, and scoring is an actor-pool
   ``map_batches``: per doc, ``nll_fixed = Σ count(tok) · q(tok)`` —
   an INTEGER sum, so the result is bit-exact regardless of summation
   order, batch boundaries, or partitioning. Scoring is vectorized:
   polars explode → ``replace_strict`` against the broadcast vocab
   (built once per actor) → integer groupby-sum per doc; no per-row
   Python in the hot path.

Smoothing: add-one over (vocab_k + 1) classes —
``p(tok) = (c_tok + 1) / (n_total + vocab_k + 1)``. An OOV token is
priced at the *per-type* rate ``oov_total // n_oov_types`` (floor — still
integer-exact), NOT the pooled OOV mass: pooling would make rare tokens
look as probable as the head of the vocabulary and invert the filter.

Output: (doc_id, dl, nll_fixed, mean_nll_fixed, bucket) where
``mean_nll_fixed = nll_fixed // dl`` (floor division — still exact
integers) and ``bucket`` is head/middle/tail by fixed thresholds on
``mean_nll_fixed``.

Tokenization is ``\\S+`` runs (polars ``str.extract_all``) — identical to
Python ``str.split()`` on this corpus and to the DuckDB oracle's
``regexp_split_to_array(text, '\\s+')``.

Reference anchor: crawl4ai has no corpus LM stage (per-page framework);
semantics follow the published CCNet pipeline.
"""

from __future__ import annotations

import math

import numpy as np
import polars as pl
import pyarrow as pa

import ray

OOV = "\x00oov"  # cannot collide with whitespace-split tokens

_TOK_RE = r"\S+"


def _explode_tokens(df: pl.DataFrame, text_col: str) -> pl.DataFrame:
    """(…, text) → one row per token occurrence, column ``w``."""
    return (
        df.select(
            [c for c in df.columns if c != text_col]
            + [pl.col(text_col).str.extract_all(_TOK_RE).alias("w")]
        )
        .explode("w", empty_as_null=True)
        .filter(pl.col("w").is_not_null())
    )


def token_counts(docs: "ray.data.Dataset", text_col: str = "text"):
    """Corpus token counts as a Dataset of (w, c) — map-side combined
    (polars explode+groupby inside the batch), so the shuffle carries one
    row per distinct token per batch, independent of corpus length."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([text_col]))
        out = (
            _explode_tokens(df, text_col)
            .group_by("w")
            .len()
            .sort("w")
            .select("w", c=pl.col("len").cast(pl.Int64))
        )
        return out.to_arrow()

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .sum("c")
        .rename_columns({"sum(c)": "c"})
    )


def _select_vocab(counts: "ray.data.Dataset", vocab_k: int):
    """Exact distributed top-``vocab_k`` by (c desc, w asc) plus corpus
    totals, with bounded driver state.

    Returns ``(kept, n_total, v_distinct)`` where ``kept`` is a list of
    (w, c) pairs of length ≤ vocab_k. ONE pass over the counts emits,
    per block, its local top-k candidates (kind=0 — each token is
    globally unique after the groupby, so every global top-k member
    survives its block's local top-k) AND one (sum, count) scalar row
    (kind=1); only that pruned table (≤ vocab_k+1 rows per block) is
    materialized — the full distinct vocabulary is never materialized
    twice nor collected anywhere. Totals fold from the scalar rows
    (≤ num_blocks on the driver); the final exact selection is one
    distributed sort+limit shipping exactly vocab_k rows down."""

    def prune_and_total(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        top = batch.sort_by([("c", "descending"), ("w", "ascending")]).slice(
            0, vocab_k
        )
        n = top.num_rows
        return pa.table(
            {
                "w": pa.concat_arrays(
                    [top.column("w").combine_chunks(), pa.array([""], pa.string())]
                ),
                "c": pa.concat_arrays(
                    [
                        top.column("c").combine_chunks(),
                        pa.array(
                            [pc.sum(batch.column("c")).as_py() or 0], pa.int64()
                        ),
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        pa.array([0] * n, pa.int64()),
                        pa.array([batch.num_rows], pa.int64()),
                    ]
                ),
                "kind": pa.concat_arrays(
                    [pa.array([0] * n, pa.int64()), pa.array([1], pa.int64())]
                ),
            }
        )

    pruned = counts.map_batches(
        prune_and_total, batch_format="pyarrow"
    ).materialize()  # ≤ vocab_k+1 rows per block, object-store resident

    tot_rows = pruned.filter(expr="kind == 1").take_all()
    n_total = sum(int(r["c"]) for r in tot_rows)
    v_distinct = sum(int(r["v"]) for r in tot_rows)
    if v_distinct == 0:
        return [], 0, 0

    kept_rows = (
        pruned.filter(expr="kind == 0")
        .sort(["c", "w"], descending=[True, False])
        .limit(vocab_k)
        .take_all()
    )
    kept = [(r["w"], int(r["c"])) for r in kept_rows]
    return kept, n_total, v_distinct


def fit_unigram(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    vocab_k: int = 65536,
):
    """Fit the capped-vocab unigram model. Returns
    ``(model_ref, n_total, v_kept)`` where model_ref is a plasma
    ObjectRef to a dict token → fixed-point nll (int), with the OOV
    class under the ``OOV`` key.

    Driver-bounded: vocab selection is a distributed sort+limit (see
    ``_select_vocab``) — the driver holds ≤ vocab_k + num_blocks rows;
    the broadcast dict is ≤ vocab_k+1 entries regardless of corpus
    size."""
    counts = token_counts(docs, text_col)
    kept, n_total, v_distinct = _select_vocab(counts, vocab_k)
    v_kept = len(kept)
    oov_total = n_total - sum(c for _, c in kept)
    oov_rate = oov_total // max(v_distinct - v_kept, 1)
    denom = n_total + v_kept + 1

    def q(c: int) -> int:
        # identical expression tree to the SQL oracle:
        # floor(-ln((c+1)/denom) * 1e8 + 0.5) over libm ln
        p = float(c + 1) / float(denom)
        return int(math.floor(-math.log(p) * 1e8 + 0.5))

    model = {w: q(c) for w, c in kept}
    model[OOV] = q(oov_rate)
    return ray.put(model), n_total, v_kept


class UnigramScorer:
    """Actor-pool scoring stage: integer fixed-point nll accumulation,
    vectorized (polars explode → replace_strict → int groupby-sum).
    The model dict is resolved from plasma once per actor and unpacked
    into the (old, new) lists replace_strict wants."""

    def __init__(self, model_ref, text_col: str = "text",
                 head_t: int = 0, tail_t: int = 0, carry_cols: tuple = ()):
        model: dict = ray.get(model_ref)
        self.oov = model[OOV]
        self.vocab_w = [w for w in model if w is not OOV and w != OOV]
        self.vocab_q = [model[w] for w in self.vocab_w]
        self.text_col = text_col
        self.head_t = head_t
        self.tail_t = tail_t
        self.carry_cols = tuple(carry_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        df = pl.from_arrow(batch.select([self.text_col])).with_row_index("i")
        toks = _explode_tokens(df, self.text_col).with_columns(
            q=pl.col("w").replace_strict(
                old=self.vocab_w, new=self.vocab_q,
                default=self.oov, return_dtype=pl.Int64,
            )
        )
        agg = toks.group_by("i").agg(
            dl=pl.len().cast(pl.Int64), nll=pl.col("q").sum().cast(pl.Int64)
        )
        dl = np.zeros(n, dtype=np.int64)
        nll = np.zeros(n, dtype=np.int64)
        idx = agg.get_column("i").to_numpy()
        dl[idx] = agg.get_column("dl").to_numpy()
        nll[idx] = agg.get_column("nll").to_numpy()
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

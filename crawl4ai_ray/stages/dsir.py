"""DSIR-style data selection: hashed n-gram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public NeurIPS paper). Every doc gets
``log w(x) = Σ_b c_b(x) · ln(p_target(b) / p_raw(b))`` over K hashed
unigram feature buckets; docs are then resampled ∝ w to tilt a raw crawl
toward a target distribution (here: a boolean target column, e.g.
``lang == 'en'``).

Distribution strategy (nothing heavy ever shuffles):

1. feature counts — map-side Counter per batch emits ≤K ``(bucket,
   n_all, n_target)`` partial rows; ONE ``groupby(bucket).sum`` bounds
   the aggregate at K rows total, independent of corpus size.
2. the driver folds the ≤K rows into per-bucket log-ratios, quantized to
   **fixed-point int64** (``floor(ln(p_t/p_r) · 1e9 + 0.5)``, the
   ``lmscore``/``logreg`` trick) and broadcast via ``ray.put`` — so the
   per-doc weight is a pure INTEGER dot product: order-free, bit-stable
   across any block layout, and reproducible by a DuckDB oracle that
   evaluates the identical float expression tree inside the same
   quantizer (libm ``ln`` on both sides).
3. scoring — an actor-pool ``map_batches`` with a per-actor token→bucket
   memo; the corpus never leaves its blocks.

Feature hash: ``bucket(tok) = md5_lower64(tok) % K`` where md5_lower64
is the LITTLE-ENDIAN integer of the digest's last 8 bytes — exactly
DuckDB's ``md5_number_lower``, which is what makes the oracle possible.
Laplace (+1) smoothing on both distributions; K defaults to 1024 so the
broadcast is ~8 KB at any corpus size.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray

TOKEN_RE = r"[a-z]+"
QUANT = 1e9  # fixed-point scale for the per-bucket log-ratio


def _bucket_of(tok: str, k: int) -> int:
    d = hashlib.md5(tok.encode()).digest()
    return int.from_bytes(d[8:16], "little") % k


def _doc_buckets(text: str, k: int, memo: dict) -> Counter:
    import re

    c: Counter = Counter()
    for tok in re.findall(TOKEN_RE, (text or "").lower()):
        b = memo.get(tok)
        if b is None:
            b = memo[tok] = _bucket_of(tok, k)
        c[b] += 1
    return c


def feature_counts(
    docs: "ray.data.Dataset",
    target_col: str,
    text_col: str = "text",
    k: int = 1024,
) -> "ray.data.Dataset":
    """(bucket, n_all, n_target) — ≤ k rows after the one tiny groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        n_all: Counter = Counter()
        n_t: Counter = Counter()
        targets = batch.column(target_col).to_pylist()
        for t, is_t in zip(batch.column(text_col).to_pylist(), targets):
            c = _doc_buckets(t, k, memo)
            n_all.update(c)
            if is_t:
                n_t.update(c)
        bs = sorted(n_all)
        return pa.table(
            {
                "bucket": pa.array(bs, pa.int64()),
                "n_all": pa.array([n_all[b] for b in bs], pa.int64()),
                "n_target": pa.array([n_t.get(b, 0) for b in bs], pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            ray.data.aggregate.Sum("n_all", alias_name="n_all"),
            ray.data.aggregate.Sum("n_target", alias_name="n_target"),
        )
    )


def fit_log_ratios(counts_rows, k: int = 1024) -> np.ndarray:
    """Fold the ≤k count rows into the fixed-point log-ratio table.
    Identical expression tree to the SQL oracle:
    ``floor(ln(((n_t+1)/(T+k)) / ((n_a+1)/(A+k))) * 1e9 + 0.5)``."""
    n_all = np.zeros(k, np.int64)
    n_t = np.zeros(k, np.int64)
    for r in counts_rows:
        n_all[int(r["bucket"])] = int(r["n_all"])
        n_t[int(r["bucket"])] = int(r["n_target"])
    A = int(n_all.sum())
    T = int(n_t.sum())
    out = np.zeros(k, np.int64)
    for b in range(k):
        p_t = (float(n_t[b]) + 1.0) / float(T + k)
        p_r = (float(n_all[b]) + 1.0) / float(A + k)
        out[b] = int(math.floor(math.log(p_t / p_r) * QUANT + 0.5))
    return out


class DsirScorer:
    """Actor-pool stage: integer dot product of the doc's bucket counts
    with the broadcast fixed-point log-ratios."""

    def __init__(self, ratios_ref, k: int, text_col: str = "text",
                 id_col: str = "doc_id", target_col: str | None = None):
        self.ratios = ray.get(ratios_ref)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.target_col = target_col
        self.memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        logw, n_feat = [], []
        for t in texts:
            c = _doc_buckets(t, self.k, self.memo)
            logw.append(int(sum(n * int(self.ratios[b]) for b, n in c.items())))
            n_feat.append(int(sum(c.values())))
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "n_feat": pa.array(n_feat, pa.int64()),
            "logw_fp": pa.array(logw, pa.int64()),
        }
        if self.target_col is not None:
            cols["is_target"] = batch.column(self.target_col)
        return pa.table(cols)


def dsir_weights(
    docs: "ray.data.Dataset",
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1024,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """→ (doc_id, n_feat, logw_fp, is_target): the DSIR importance
    log-weight in 1e-9 fixed-point units. ``logw_fp > 0`` ⇒ the doc looks
    more like the target slice than the raw corpus."""
    counts = feature_counts(docs, target_col, text_col, k).take_all()
    ratios_ref = ray.put(fit_log_ratios(counts, k))
    return docs.map_batches(
        DsirScorer,
        fn_constructor_kwargs=dict(
            ratios_ref=ratios_ref,
            k=k,
            text_col=text_col,
            id_col=id_col,
            target_col=target_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

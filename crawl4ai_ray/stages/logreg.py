"""Distributed logistic-regression quality classifier — the trainable
sibling of the rule-based filters (`quality_filter`, `gopher_rules`):
production pipelines fit a lightweight classifier (fastText/logreg) on
labeled good/bad pages and score the corpus with it.

Shape: full-batch gradient descent as ITERATIVE BROADCAST-AGGREGATE —
per iteration the weight vector (tiny) is ray.put-broadcast, every batch
computes its gradient contribution map-side, and ONE global aggregate of
5 integers closes the loop. The corpus never shuffles; per-iteration
traffic is O(features), independent of corpus size.

Bit-exactness across any partitioning / cluster shape (the correctness
gate hashes values): a float gradient sum is order-dependent, so each
doc's per-feature contribution is quantized to fixed-point int64
(floor(c·1e9 + 0.5)) and the global sum is an INTEGER sum — exact and
order-free, the `lmscore.py` trick applied to learning. The (few) float
ops that remain — sigmoid, the weight update — run once per doc per
iteration with libm scalars (math.exp, not numpy's SIMD exp, which is
not bit-equal to libm) and once per iteration on the driver, mirrored
expression-for-expression by the SQL oracle's unrolled-CTE replay.

Features (fixed normalization, integer counts underneath):
    x = [1, n_tok/50, n_punct/10, n_digit/10, n_stop/10]
Training label (deterministic, stopword-density): y = [10·n_stop ≥ n_tok].
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from .textstats import STOPWORD_RE  # same stop set as quality_counts

N_FEAT = 5
QUANT = 1e9


def _count_feats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer count features per doc (the quality_counts family)."""
    import re

    texts = batch.column(text_col).to_pylist()
    n_tok = np.zeros(len(texts), np.int64)
    n_punct = np.zeros(len(texts), np.int64)
    n_digit = np.zeros(len(texts), np.int64)
    n_stop = np.zeros(len(texts), np.int64)
    punct_re = re.compile(r"[.,;:!?]")
    digit_re = re.compile(r"[0-9]")
    stop_re = re.compile(STOPWORD_RE)
    for i, t in enumerate(texts):
        t = t or ""
        n_tok[i] = len(t.split())
        n_punct[i] = len(punct_re.findall(t))
        n_digit[i] = len(digit_re.findall(t))
        n_stop[i] = len(stop_re.findall(t.lower()))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tok": pa.array(n_tok, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "n_digit": pa.array(n_digit, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
        }
    )


def _xy(batch: pa.Table):
    """Feature vectors + label from the integer counts. Floats produced by
    the exact expressions the SQL oracle writes."""
    n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False)
    n_punct = batch.column("n_punct").to_numpy(zero_copy_only=False)
    n_digit = batch.column("n_digit").to_numpy(zero_copy_only=False)
    n_stop = batch.column("n_stop").to_numpy(zero_copy_only=False)
    x = [
        np.ones(len(n_tok), np.float64),
        n_tok.astype(np.float64) / 50.0,
        n_punct.astype(np.float64) / 10.0,
        n_digit.astype(np.float64) / 10.0,
        n_stop.astype(np.float64) / 10.0,
    ]
    y = (10 * n_stop >= n_tok).astype(np.float64)
    return x, y


def _sigmoid_scalar(z: float) -> float:
    # libm exp for cross-engine parity; scalar loop is fine at the doc rate
    return 1.0 / (1.0 + math.exp(-z))


def fit_logreg_quality(
    docs: "ray.data.Dataset",
    iters: int = 12,
    lr: float = 2.0,
    pos_weight: float = 6.0,
    text_col: str = "text",
):
    """Fit on the whole corpus; returns (weights, feats_materialized)."""
    feats = docs.map_batches(
        lambda b: _count_feats(b, text_col), batch_format="pyarrow"
    ).materialize()
    n = feats.count()
    w = [0.0] * N_FEAT
    for _ in range(iters):
        w_ref = ray.put(list(w))

        def grad_part(batch: pa.Table) -> pa.Table:
            wv = ray.get(w_ref)
            x, y = _xy(batch)
            g = [0] * N_FEAT
            for i in range(len(y)):
                z = (
                    wv[0] * x[0][i]
                    + wv[1] * x[1][i]
                    + wv[2] * x[2][i]
                    + wv[3] * x[3][i]
                    + wv[4] * x[4][i]
                )
                # class-weighted gradient: the positive class is rare
                # (~14%), unweighted full-batch GD converges to the
                # majority prior and never crosses 0.5
                d = (_sigmoid_scalar(z) - y[i]) * (
                    pos_weight if y[i] == 1.0 else 1.0
                )
                for j in range(N_FEAT):
                    g[j] += int(math.floor(d * x[j][i] * QUANT + 0.5))
            return pa.table({f"g{j}": pa.array([g[j]], pa.int64()) for j in range(N_FEAT)})

        parts = feats.map_batches(grad_part, batch_format="pyarrow")
        agg = parts.aggregate(
            *[ray.data.aggregate.Sum(f"g{j}", alias_name=f"g{j}") for j in range(N_FEAT)]
        )
        w = [
            w[j] - lr * (float(agg[f"g{j}"]) / n) * 1e-9
            for j in range(N_FEAT)
        ]
    return w, feats


def logreg_quality_scores(
    docs: "ray.data.Dataset",
    iters: int = 12,
    lr: float = 2.0,
    pos_weight: float = 6.0,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ (doc_id, p, pred): fitted-model probability (ROUND 8) and the
    ≥0.5 decision per doc."""
    w, feats = fit_logreg_quality(
        docs, iters=iters, lr=lr, pos_weight=pos_weight, text_col=text_col
    )
    w_ref = ray.put(list(w))

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        x, _ = _xy(batch)
        p = np.zeros(batch.num_rows, np.float64)
        for i in range(batch.num_rows):
            z = (
                wv[0] * x[0][i]
                + wv[1] * x[1][i]
                + wv[2] * x[2][i]
                + wv[3] * x[3][i]
                + wv[4] * x[4][i]
            )
            p[i] = round(_sigmoid_scalar(z), 8)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "p": pa.array(p, pa.float64()),
                "pred": pa.array(p >= 0.5, pa.bool_()),
            }
        )

    return feats.map_batches(score, batch_format="pyarrow")


def logreg_calibration(
    docs: "ray.data.Dataset",
    iters: int = 12,
    lr: float = 2.0,
    pos_weight: float = 6.0,
    text_col: str = "text",
    bins: int = 10,
) -> "ray.data.Dataset":
    """Reliability table for the fitted classifier: per fixed-width
    probability bin, (n, n_pos, Σp as fixed-point int) — the calibration
    readout (predicted mass vs observed positives per bin) that closes
    the quality-model loop the way recall_at_k closes the ANN loop.

    Integer discipline: bin = min(floor(p·bins), bins−1) on the SAME
    round-8 double p the scores query emits, Σp carried as
    round(p·1e8) int64 partials — both engines aggregate exact ints, so
    value hashes match bit-for-bit. One partial map + one tiny groupby;
    the corpus is touched once."""
    w, feats = fit_logreg_quality(
        docs, iters=iters, lr=lr, pos_weight=pos_weight, text_col=text_col
    )
    w_ref = ray.put(list(w))

    def partial(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        x, y = _xy(batch)
        out: dict[int, list[int]] = {}
        for i in range(batch.num_rows):
            z = (
                wv[0] * x[0][i]
                + wv[1] * x[1][i]
                + wv[2] * x[2][i]
                + wv[3] * x[3][i]
                + wv[4] * x[4][i]
            )
            p = round(_sigmoid_scalar(z), 8)
            b = min(int(p * bins), bins - 1)
            acc = out.setdefault(b, [0, 0, 0])
            acc[0] += 1
            acc[1] += int(y[i] == 1.0)
            acc[2] += int(round(p * 1e8))
        ks = sorted(out)
        return pa.table(
            {
                "bin": pa.array(ks, pa.int64()),
                "n": pa.array([out[k][0] for k in ks], pa.int64()),
                "n_pos": pa.array([out[k][1] for k in ks], pa.int64()),
                "sum_p_fp": pa.array([out[k][2] for k in ks], pa.int64()),
            }
        )

    agg = (
        feats.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("n_pos", alias_name="n_pos"),
            ray.data.aggregate.Sum("sum_p_fp", alias_name="sum_p_fp"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "bin": b.column("bin"),
                "n": b.column("n").cast(pa.int64()),
                "n_pos": b.column("n_pos").cast(pa.int64()),
                "sum_p_fp": b.column("sum_p_fp").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def logreg_auc(
    docs: "ray.data.Dataset",
    iters: int = 12,
    lr: float = 2.0,
    pos_weight: float = 6.0,
    text_col: str = "text",
) -> "pa.Table":
    """ROC-AUC of the fitted classifier via the tie-aware Mann-Whitney
    rank sum — the threshold-free eval that complements
    logreg_calibration's reliability table. AUC = (Σ 2·avgrank(pos) −
    n₊(n₊+1)) / (2·n₊·n₋), where a tie group of size g starting after a
    lower-ranked rows contributes n₊g·(2a + g + 1) (2× average rank kept
    INTEGER so the whole numerator is exact).

    Scale shape: scores are quantized to their round-8 grid (q =
    round(p·1e8), the same grid the scores query emits), so the rank
    fold runs over the DISTINCT-SCORE histogram — one tiny groupby +
    a driver fold over ≤1e8 (in practice a few hundred) histogram rows;
    no per-doc row is ever globally sorted or collected."""
    w, feats = fit_logreg_quality(
        docs, iters=iters, lr=lr, pos_weight=pos_weight, text_col=text_col
    )
    w_ref = ray.put(list(w))

    def partial(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        x, y = _xy(batch)
        out: dict[int, list[int]] = {}
        for i in range(batch.num_rows):
            z = (
                wv[0] * x[0][i]
                + wv[1] * x[1][i]
                + wv[2] * x[2][i]
                + wv[3] * x[3][i]
                + wv[4] * x[4][i]
            )
            q = int(round(round(_sigmoid_scalar(z), 8) * 1e8))
            acc = out.setdefault(q, [0, 0])
            acc[0] += 1
            acc[1] += int(y[i] == 1.0)
        ks = sorted(out)
        return pa.table(
            {
                "q": pa.array(ks, pa.int64()),
                "g": pa.array([out[k][0] for k in ks], pa.int64()),
                "np": pa.array([out[k][1] for k in ks], pa.int64()),
            }
        )

    hist = (
        feats.map_batches(partial, batch_format="pyarrow")
        .groupby("q")
        .aggregate(
            ray.data.aggregate.Sum("g", alias_name="g"),
            ray.data.aggregate.Sum("np", alias_name="np"),
        )
        .take_all()
    )
    hist.sort(key=lambda r: r["q"])
    a = auc2 = npos = 0
    for r in hist:
        g, np_ = int(r["g"]), int(r["np"])
        auc2 += np_ * (2 * a + g + 1)
        a += g
        npos += np_
    nneg = a - npos
    # single-class corpus → AUC undefined; NULL, not a ZeroDivisionError
    # (the SQL branch mirrors with the same CASE)
    auc = (
        float(auc2 - npos * (npos + 1)) / float(2 * npos * nneg)
        if npos > 0 and nneg > 0
        else None
    )
    return pa.table(
        {
            "n_pos": pa.array([npos], pa.int64()),
            "n_neg": pa.array([nneg], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
        }
    )

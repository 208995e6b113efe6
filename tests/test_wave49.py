"""Forty-ninth-wave tests: Dawid-Skene EM, conformal intervals,
McNemar gate test."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave49 import (
    _CF_RQ,
    _DS_ACC,
    _DS_TQ,
    q_conformal_interval,
    q_dawid_skene,
    q_mcnemar_gates,
)


def test_dawid_skene_recovers_annotator_ordering(ray_session, sf_dir):
    df = q_dawid_skene(sf_dir).to_pandas()
    # full A x K x K grid
    K = df["k"].nunique()
    assert len(df) == 3 * K * K
    # per-(a, k) confusion rows renormalize to ~1 (floor rounding only)
    sums = df.groupby(["a", "k"])["t_q"].sum()
    assert ((sums > _DS_TQ - K) & (sums <= _DS_TQ)).all()
    # EM must order the annotators by their true simulated accuracy:
    # mean diagonal mass a=1 (85%) > a=2 (70%) > a=3 (55%)
    diag = (
        df[df["k"] == df["l"]].groupby("a")["t_q"].mean().sort_index()
    )
    assert diag[1] > diag[2] > diag[3]
    # and the recovered diagonals should be in the right ballpark
    for a, acc in _DS_ACC.items():
        assert abs(diag[a] / _DS_TQ - acc / 100) < 0.15


def test_conformal_quantile_and_coverage(ray_session, sf_dir):
    row = q_conformal_interval(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    docs["n_tok"] = docs["text"].str.split().str.len()
    tr = docs[docs["doc_id"] % 3 == 0]
    ratio_q = int(tr["n_chars"].sum()) * _CF_RQ // int(tr["n_tok"].sum())
    assert row["ratio_q"] == ratio_q
    resid = (
        docs["n_chars"].astype(np.int64) * _CF_RQ
        - docs["n_tok"].astype(np.int64) * ratio_q
    ).abs()
    cal = np.sort(resid[docs["doc_id"] % 3 == 1].to_numpy())
    k = (9 * (len(cal) + 1) + 9) // 10
    assert row["n_cal"] == len(cal) and row["kth"] == k
    assert row["q_resid"] == cal[k - 1]
    test_r = resid[docs["doc_id"] % 3 == 2].to_numpy()
    assert row["covered"] == int((test_r <= cal[k - 1]).sum())
    # split-conformal marginal guarantee: coverage should be near 0.9
    assert 0.75 <= row["coverage"] <= 1.0


def test_mcnemar_counts_partition_corpus(ray_session, sf_dir):
    row = q_mcnemar_gates(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert (
        row["both_keep"]
        + row["g_only"]
        + row["c_only"]
        + row["neither_keep"]
        == n
    )
    b, c = int(row["g_only"]), int(row["c_only"])
    if b + c:
        assert row["chi2"] == float((b - c) ** 2) / float(b + c)
    assert (row[["both_keep", "g_only", "c_only", "neither_keep"]] >= 0).all()

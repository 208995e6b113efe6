"""Fifty-ninth-wave tests: Bloom intersection, RANSAC, QTE."""

import math

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave59 import (
    _BI_K,
    _BI_M,
    _RA_OUT_MOD,
    _RA_OUT_SHIFT,
    _RA_TOL,
    _QTE_PCTS,
    q_bloom_intersect_est,
    q_qte_quantiles,
    q_ransac_line,
)


def test_bloom_intersection_estimate_is_close(ray_session, sf_dir):
    row = q_bloom_intersect_est(sf_dir).to_pandas().iloc[0]
    # bit counts bounded by k * set size and by m
    assert row["t_a"] <= min(_BI_K * row["n_a"], _BI_M)
    assert row["t_union"] >= max(row["t_a"], row["t_b"])
    # estimates close to truth at this load factor (t/m ~ 0.3)
    for est, true in (
        ("est_a", "n_a"), ("est_b", "n_b"), ("est_inter", "n_inter"),
    ):
        assert abs(row[est] - row[true]) / max(row[true], 1) < 0.25
    # inclusion-exclusion consistency of the estimator itself
    assert row["est_inter"] == row["est_a"] + row["est_b"] - (
        -(_BI_M / _BI_K) * math.log(1 - row["t_union"] / _BI_M)
    )


def test_ransac_rejects_planted_outliers(ray_session, sf_dir):
    row = q_ransac_line(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    x = np.array([len(t.split()) for t in docs["text"]], np.int64)
    y = docs["n_chars"].to_numpy(np.int64) + _RA_OUT_SHIFT * (
        docs["doc_id"].to_numpy(np.int64) % _RA_OUT_MOD == 0
    )
    # recompute the winning model's inlier count
    dx, dy = row["x2"] - row["x1"], row["y2"] - row["y1"]
    lhs = np.abs((y - row["y1"]) * dx - (x - row["x1"]) * dy)
    assert row["inliers"] == int((lhs <= _RA_TOL * abs(dx)).sum())
    n = len(docs)
    n_out = int((docs["doc_id"] % _RA_OUT_MOD == 0).sum())
    # consensus must cover most clean points (chars ~ 6.2x tokens is
    # near-deterministic in the synthetic corpus)...
    assert row["inliers"] > 0.9 * (n - n_out)
    # ...and the support points themselves are clean (not shifted)
    assert row["y1"] < 4000 and row["y2"] < 4000
    # slope near the true chars-per-token ratio
    assert 4.0 < row["slope_q"] / 1e6 < 9.0


def test_qte_order_statistics(ray_session, sf_dir):
    df = q_qte_quantiles(sf_dir).to_pandas()
    assert len(df) == len(_QTE_PCTS)
    con = duckdb.connect()
    u = con.execute(
        f"SELECT user_id, SUM(CAST(floor(value*100e0+5e-1) AS BIGINT)) s"
        f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY user_id"
    ).fetchdf()
    treat = np.sort(u.loc[u["user_id"] % 5 == 0, "s"].to_numpy())
    ctrl = np.sort(u.loc[u["user_id"] % 5 != 0, "s"].to_numpy())
    for _, r in df.iterrows():
        kt = (r["p_num"] * len(treat) + r["p_den"] - 1) // r["p_den"]
        kc = (r["p_num"] * len(ctrl) + r["p_den"] - 1) // r["p_den"]
        assert r["k_t"] == kt and r["k_c"] == kc
        assert r["q_t"] == treat[kt - 1] and r["q_c"] == ctrl[kc - 1]
        assert r["qte"] == r["q_t"] - r["q_c"]
    # quantiles are monotone in p within each cohort
    assert df["q_t"].is_monotonic_increasing
    assert df["q_c"].is_monotonic_increasing

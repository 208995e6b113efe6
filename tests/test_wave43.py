"""Forty-third-wave tests: RBO, Holt forecast, odds ratio."""

import numpy as np

from crawl4ai_ray.pipelines.queries_wave43 import (
    _HO_ALPHA,
    _HO_BETA,
    q_gate_odds_ratio,
    q_holt_forecast,
    q_rbo_rankings,
)


def test_rbo_monotone_and_bounded(ray_session, sf_dir):
    df = q_rbo_rankings(sf_dir).to_pandas().sort_values("depth")
    assert df["depth"].tolist() == list(range(1, 11))
    # cumulative RBO is non-decreasing and <= 1
    r = df["rbo_q"].to_numpy()
    assert (np.diff(r) >= 0).all()
    assert r[-1] <= 1e12
    assert (df["overlap"] <= df["depth"]).all()


def test_holt_recurrence_identity(ray_session, sf_dir):
    df = q_holt_forecast(sf_dir).to_pandas().sort_values("day")
    x = df["x"].to_numpy(float)
    l = df["level"].to_numpy()
    b = df["trend"].to_numpy()
    f = df["forecast"].to_numpy()
    assert l[0] == x[0] and b[0] == x[1] - x[0] and f[0] == x[0]
    for i in range(1, len(df)):
        assert f[i] == l[i - 1] + b[i - 1]
        l_new = _HO_ALPHA * x[i] + (1 - _HO_ALPHA) * (l[i - 1] + b[i - 1])
        assert l[i] == l_new
        assert b[i] == _HO_BETA * (l_new - l[i - 1]) + (1 - _HO_BETA) * b[i - 1]


def test_gate_odds_ratio_ci_brackets(ray_session, sf_dir):
    row = q_gate_odds_ratio(sf_dir).to_pandas().iloc[0]
    assert row["ci_lo_q"] <= row["or_q"] <= row["ci_hi_q"]
    # kappa 0.125 at sf0.01 implies a positive but modest association
    assert row["or_q"] > 1e9  # OR > 1
    assert row["n11"] + row["n10"] + row["n01"] + row["n00"] == 500

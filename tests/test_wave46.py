"""Forty-sixth-wave tests: Neyman allocation, TTL optimization, burn
rate."""

import numpy as np

from crawl4ai_ray.pipelines.queries_wave46 import (
    _EB_BUDGET_DEN,
    _NA_BUDGET,
    q_error_budget_burn,
    q_neyman_allocation,
    q_ttl_optimize,
)


def test_neyman_allocation_sums_to_budget(ray_session, sf_dir):
    df = q_neyman_allocation(sf_dir).to_pandas()
    assert df["alloc"].sum() == _NA_BUDGET
    assert (df["alloc"] >= 0).all()
    assert (df["var_num"] >= 0).all()
    # higher weight never gets strictly less than a much lower weight
    s = df.sort_values("weight", ascending=False)
    assert s["alloc"].iloc[0] >= s["alloc"].iloc[-1]


def test_ttl_sqrt_law(ray_session, sf_dir):
    df = q_ttl_optimize(sf_dir).to_pandas()
    assert len(df) == 50
    # higher change rate -> shorter TTL (monotone in lam_num)
    g = df.groupby("lam_num")["ttl_q"].first().sort_index()
    assert (np.diff(g.to_numpy()) < 0).all()
    # sqrt law: ttl(lam)^2 * lam constant across hosts
    t = df["ttl_q"].to_numpy() / 1e6
    lam = df["lam_num"].to_numpy() / 7.0
    k = t * t * lam
    assert np.allclose(k, k[0], rtol=1e-5)


def test_error_budget_burn_consistency(ray_session, sf_dir):
    df = q_error_budget_burn(sf_dir).to_pandas()
    assert (df["fails"] <= df["n"]).all()
    # alert flag agrees with the exact integer comparison
    expect = (df["fails"] * _EB_BUDGET_DEN > 2 * df["n"]).astype(int)
    assert (df["alert"] == expect).all()
    assert df["win"].between(0, 3).all()
    # every host contributes at least one window
    assert df["host"].nunique() == 50

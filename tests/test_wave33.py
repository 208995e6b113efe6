"""Thirty-third-wave tests: Kendall tau, Bloom FPR curve, ring
rebalance disruption."""

from crawl4ai_ray.pipelines.queries_wave33 import (
    q_bloom_fpr_curve,
    q_kendall_tau,
    q_ring_rebalance_eval,
)


def test_kendall_tau_bounds(ray_session, sf_dir):
    row = q_kendall_tau(sf_dir).to_pandas().iloc[0]
    assert row["n_docs"] == 10
    assert row["concordant"] + row["discordant"] == 45
    assert -1.0 <= row["tau"] <= 1.0
    assert row["tau"] == (row["concordant"] - row["discordant"]) / 45.0


def test_bloom_fpr_near_theory(ray_session, sf_dir):
    row = q_bloom_fpr_curve(sf_dir).to_pandas().iloc[0]
    assert row["n_inserted"] == 500
    assert row["n_probes"] == 500
    assert 0 < row["n_bits_set"] <= 2048
    theory = row["theory_q"] / 1e12
    # at m=2048,k=4,n=500: theory ~ 0.39; measurement within a loose band
    assert 0.1 < theory < 0.8
    assert abs(row["fpr"] - theory) < 0.15
    # a filter with that much load definitely has SOME false positives
    assert row["n_fp"] > 0


def test_ring_rebalance_minimal_disruption(ray_session, sf_dir):
    row = q_ring_rebalance_eval(sf_dir).to_pandas().iloc[0]
    assert row["n_hosts"] == 50
    # every host on the removed worker moved; it is included in n_moved
    assert row["n_moved"] >= row["n_on_removed"]
    # the headline property: collateral movement is a small fraction
    # (mod-N hashing would move ~ (N-1)/N of everything)
    assert row["collateral_frac"] < 0.25
    assert 0.0 <= row["moved_frac"] <= 1.0

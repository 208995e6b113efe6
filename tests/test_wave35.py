"""Thirty-fifth-wave tests: PageRank convergence, negative sampling,
Benford audit."""

import numpy as np

from crawl4ai_ray.pipelines.queries_wave35 import (
    _NS_DRAWS,
    q_benford_audit,
    q_neg_sampling_dist,
    q_pagerank_convergence,
)


def test_pagerank_residual_decreases(ray_session, sf_dir):
    df = q_pagerank_convergence(sf_dir).to_pandas().sort_values("iter")
    assert df["iter"].tolist() == [1, 2, 3, 4, 5]
    r = df["residual_q8"].to_numpy()
    # power iteration contracts: the residual shrinks monotonically
    assert (np.diff(r) < 0).all()
    assert r[0] > 0
    # most nodes still move at iteration 5 on a 500-node graph, but the
    # TOTAL movement is tiny relative to iteration 1
    assert r[-1] < r[0] // 5


def test_neg_sampling_matches_expectation(ray_session, sf_dir):
    df = q_neg_sampling_dist(sf_dir).to_pandas()
    assert df["actual"].sum() == _NS_DRAWS
    # each token's actual draws within a generous multinomial band
    err = (df["actual"] - df["expected"]).abs()
    sd = np.sqrt(df["expected"].clip(lower=1.0))
    assert (err < 6 * sd + 5).all()
    # the ^0.75 power compresses: most-common token's weight share is
    # SMALLER than its count share
    top = df.sort_values("c", ascending=False).iloc[0]
    assert top["wq"] / df["wq"].sum() < top["c"] / df["c"].sum()


def test_benford_uniform_keys_fail_benford(ray_session, sf_dir):
    df = q_benford_audit(sf_dir).to_pandas().sort_values("digit")
    assert df["digit"].tolist() == list(range(1, 10))
    assert abs(df["obs_rate"].sum() - 1.0) < 1e-9
    benford = df["benford_q"].to_numpy() / 1e12
    assert abs(benford.sum() - 1.0) < 1e-6
    # synthetic sequential orderkeys are NOT Benford: total variation
    # distance is large (the audit fires)
    tv = 0.5 * float(np.abs(df["obs_rate"].to_numpy() - benford).sum())
    assert tv > 0.1

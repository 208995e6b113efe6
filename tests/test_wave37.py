"""Thirty-seventh-wave tests: TrustRank delta, Markov next-event eval,
deleted interpolation."""

import numpy as np

from crawl4ai_ray.pipelines.queries_wave37 import (
    _DI_ITERS,
    q_deleted_interpolation,
    q_markov_next_eval,
    q_trustrank_delta,
)


def test_trustrank_delta_flags_far_nodes(ray_session, sf_dir):
    df = q_trustrank_delta(sf_dir).to_pandas()
    assert len(df) == 20
    assert (df["delta_q8"] == df["pr_q8"] - df["tr_q8"]).all()
    d = df["delta_q8"].tolist()
    assert all(d[i] >= d[i + 1] for i in range(len(d) - 1))
    # the trusted seeds themselves can never top the spam list: their
    # trustrank is inflated by the restart mass
    assert not set(df["node"].head(3)) & {0, 1, 2}


def test_markov_eval_structure(ray_session, sf_dir):
    df = q_markov_next_eval(sf_dir).to_pandas()
    assert len(df) == 5  # five event types as contexts
    assert (df["n_correct"] <= df["n_eval"]).all()
    assert ((df["accuracy"] >= 0) & (df["accuracy"] <= 1)).all()
    # with 5 roughly-uniform types, accuracy sits near 1/5, not near 1
    assert df["accuracy"].mean() < 0.5


def test_deleted_interpolation_converges(ray_session, sf_dir):
    df = q_deleted_interpolation(sf_dir).to_pandas().sort_values("iter")
    assert df["iter"].tolist() == list(range(1, _DI_ITERS + 1))
    lam = df["lambda_out"].to_numpy()
    assert ((lam > 0) & (lam < 1)).all()
    # EM steps shrink: |lam_3 - lam_2| <= |lam_2 - lam_1|
    assert abs(lam[2] - lam[1]) <= abs(lam[1] - lam[0]) + 1e-12
    assert (df["n_used"] > 0).all()


def test_deleted_interpolation_dual_path_parity(ray_session, sf_dir):
    """r5: the size-guarded driver fold (bounded by small_threshold)
    and the broadcast-free distributed join plan produce bit-identical
    EM trajectories."""
    from crawl4ai_ray.pipelines.queries_wave37 import q_deleted_interpolation

    fast = q_deleted_interpolation(sf_dir).to_pandas()
    dist = q_deleted_interpolation(sf_dir, small_threshold=0).to_pandas()
    assert fast.equals(dist)

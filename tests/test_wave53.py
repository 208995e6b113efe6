"""Fifty-third-wave tests: AMS F2 sketch, PCA power iteration, CUPED."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave53 import (
    _AMS_K,
    _CUPED_Q,
    _PCA_FP,
    _PCA_VS,
    q_ams_f2,
    q_cuped_adjustment,
    q_pca_power_iteration,
)


def test_ams_estimates_f2(ray_session, sf_dir):
    row = q_ams_f2(sf_dir).to_pandas().iloc[0]
    f2 = int(row["f2_exact"])
    assert f2 > 0
    # AMS guarantee: Var(S^2) <= 2*F2^2, so median-of-16 lands within
    # a small constant factor with overwhelming probability
    assert 0.2 * f2 < row["est_median"] < 5 * f2
    assert row["est_mean"] > 0


def test_pca_matches_numpy_eigenvector(ray_session, sf_dir):
    df = q_pca_power_iteration(sf_dir).to_pandas().sort_values("dim")
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchdf()["embedding"]
    eq = np.array(
        [[np.floor(float(x) * _PCA_FP) for x in v] for v in vecs]
    )
    n, d = eq.shape
    cov = n * (eq.T @ eq) - np.outer(eq.sum(0), eq.sum(0))
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    # orient like the query: largest-|coordinate| positive
    anchor = int(np.argmax(np.abs(top)))
    if top[anchor] < 0:
        top = -top
    got = df["loading_q"].to_numpy() / _PCA_VS
    got = got / np.linalg.norm(got)
    # the synthetic embeddings are near-isotropic (eigengap ~1.07), so
    # judge convergence by the Rayleigh quotient: the found direction
    # must capture >=97% of the top eigenvalue's variance
    rq = float(got @ cov @ got) / float(w[-1])
    assert rq > 0.98
    assert abs(float(np.dot(got, top))) > 0.9
    # loadings bounded by the max-normalization
    assert np.abs(df["loading_q"]).max() == _PCA_VS


def test_cuped_moments_and_bounds(ray_session, sf_dir):
    row = q_cuped_adjustment(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, value, date_part('day', ts) AS day "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchdf()
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    ev["post"] = (ev["day"] >= 15).astype(int)
    u = ev.assign(
        x=ev["cents"] * (1 - ev["post"]), y=ev["cents"] * ev["post"]
    ).groupby("user_id")[["x", "y"]].sum()
    n = len(u)
    sx, sy = int(u["x"].sum()), int(u["y"].sum())
    cov = n * int((u["x"] * u["y"]).sum()) - sx * sy
    vx = n * int((u["x"] ** 2).sum()) - sx * sx
    vy = n * int((u["y"] ** 2).sum()) - sy * sy
    assert row["n_users"] == n
    assert row["cov_num"] == cov and row["vx_num"] == vx
    assert row["vy_num"] == vy
    # Cauchy-Schwarz: rho^2 in [0, 1e6]
    assert 0 <= row["rho2_q"] <= _CUPED_Q
    # theta sign matches covariance sign
    assert (row["theta_q"] >= 0) == (cov >= 0)

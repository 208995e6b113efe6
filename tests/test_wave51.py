"""Fifty-first-wave tests: IPF raking, Hill tail index, DiD."""

import math

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave51 import (
    _DID_CUT_DAY,
    _DID_MQ,
    _HILL_K,
    _HILL_Q,
    _IPF_WS,
    q_diff_in_diff,
    q_hill_tail_index,
    q_ipf_raking,
)


def test_ipf_marginals_converge(ray_session, sf_dir):
    df = q_ipf_raking(sf_dir).to_pandas()
    assert (df["w_q"] > 0).all()
    # after the final COLUMN scaling, weighted column marginals must
    # match their targets almost exactly (integer floor slack only)
    col = df.assign(wsum=df["c_sample"] * df["w_q"]).groupby("lang").agg(
        wsum=("wsum", "sum"), ct=("col_target", "first"),
        ncell=("w_q", "size"),
    )
    for _, r in col.iterrows():
        target = r["ct"] * _IPF_WS
        # each cell's floor loses < c_sample * 1 weight units
        assert 0 <= target - r["wsum"] < r["ncell"] * _IPF_WS
        assert abs(r["wsum"] / target - 1.0) < 1e-3
    # row marginals approximately match too (raking converges fast)
    row = df.assign(wsum=df["c_sample"] * df["w_q"]).groupby("source").agg(
        wsum=("wsum", "sum"), rt=("row_target", "first")
    )
    ratios = row["wsum"] / (row["rt"] * _IPF_WS)
    assert (np.abs(ratios - 1.0) < 0.05).all()


def test_hill_matches_brute_order_stats(ray_session, sf_dir):
    row = q_hill_tail_index(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    x = np.sort(
        con.execute(
            f"SELECT n_chars FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchdf()["n_chars"].to_numpy()
    )[::-1]
    thr = int(x[_HILL_K])
    assert row["x_thr"] == thr
    lqs = [
        math.floor(math.log(float(v) / float(thr)) * float(_HILL_Q))
        for v in x[:_HILL_K]
    ]
    xi = sum(lqs) // _HILL_K
    assert row["xi_q"] == xi
    assert row["alpha_q"] == _HILL_Q * _HILL_Q // max(xi, 1)
    assert row["xi_q"] > 0  # lengths do have a spread tail


def test_did_cells_and_estimate(ray_session, sf_dir):
    row = q_diff_in_diff(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, value, date_part('day', ts) AS day FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchdf()
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    ev["treated"] = (ev["user_id"] % 5 == 0).astype(int)
    ev["post"] = (ev["day"] >= _DID_CUT_DAY).astype(int)
    m = {}
    for t in (0, 1):
        for p in (0, 1):
            g = ev[(ev["treated"] == t) & (ev["post"] == p)]
            assert row[f"n_{'t' if t else 'c'}_{'post' if p else 'pre'}"] == len(g)
            m[(t, p)] = int(g["cents"].sum()) * _DID_MQ // len(g)
    assert row["m_t_post_q"] == m[(1, 1)]
    assert row["did_q"] == (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    # synthetic stream has no real treatment: DiD should be small
    # relative to the overall mean level (same cents*1e6 units)
    overall_q = ev["cents"].mean() * _DID_MQ
    assert abs(row["did_q"]) < overall_q / 2

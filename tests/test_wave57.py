"""Fifty-seventh-wave tests: BH FDR, overdispersion, Copeland."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave57 import (
    _BH_ALPHA_DEN,
    _BH_ALPHA_NUM,
    _OD_DAYS,
    _OD_Q,
    q_bh_fdr,
    q_copeland_fusion,
    q_overdispersion,
)


def test_bh_discoveries_form_a_step_up_prefix(ray_session, sf_dir):
    df = q_bh_fdr(sf_dir).to_pandas().sort_values("rank")
    m = len(df)
    assert (df["m"] == m).all()
    # p-numerators are valid empirical p-values: rank <= p_num <= m
    assert (df["p_num"] >= df["rank"]).all()
    assert (df["p_num"] <= m).all()
    # discoveries are exactly ranks <= k*, where k* is the LAST rank
    # satisfying the BH inequality (step-up, not step-down)
    ok = df["p_num"] * _BH_ALPHA_DEN <= df["rank"] * _BH_ALPHA_NUM
    kstar = int(df.loc[ok, "rank"].max()) if ok.any() else 0
    assert (df["discovery"] == (df["rank"] <= kstar).astype(int)).all()
    # the heavy-hitter host must be discovered; most hosts must not be
    assert df.iloc[0]["discovery"] == 1
    assert df["discovery"].sum() < m // 2


def test_overdispersion_moments(ray_session, sf_dir):
    df = q_overdispersion(sf_dir).to_pandas()
    con = duckdb.connect()
    daily = con.execute(
        f"SELECT user_id, epoch_us(ts)//86400000000 AS day, count(*) c"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        f" GROUP BY user_id, day"
    ).fetchdf()
    g = daily.assign(c2=daily["c"] ** 2).groupby("user_id").agg(
        s=("c", "sum"), s2=("c2", "sum")
    )
    assert len(df) == len(g)
    for _, r in df.iterrows():
        s, s2 = int(g.loc[r["user_id"], "s"]), int(g.loc[r["user_id"], "s2"])
        assert r["s"] == s and r["s2"] == s2
        assert r["d_q"] == (_OD_DAYS * s2 - s * s) * _OD_Q // (_OD_DAYS * s)
        vm = _OD_DAYS * s2 - s * s - _OD_DAYS * s
        if vm > 0:
            assert r["under"] == 0
            assert r["nb_r_q"] == s * s * _OD_Q // vm
        else:
            assert r["under"] == 1 and r["nb_r_q"] == -1
    # uniform-ish synthetic arrivals: dispersion near 1 on average
    d = df["d_q"].to_numpy() / _OD_Q
    assert 0.5 < d.mean() < 2.0


def test_copeland_is_condorcet_consistent(ray_session, sf_dir):
    df = q_copeland_fusion(sf_dir).to_pandas()
    n = len(df)
    # scores bounded by the duel count and sum to <= 0 asymmetries
    assert (df["copeland"].abs() <= n - 1).all()
    assert df["copeland"].sum() == 0 or df["copeland"].sum() < n
    # ranking sorted by (copeland DESC, doc_id)
    s = df.sort_values(["copeland", "doc_id"], ascending=[False, True])
    assert list(s["rank"]) == list(range(1, n + 1))
    assert list(df["rank"]) == list(range(1, n + 1))
    # a candidate that every ranker puts first would be rank 1; at
    # minimum the winner must have a positive Copeland score here
    assert df.iloc[0]["copeland"] > 0

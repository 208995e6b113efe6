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
    import hashlib

    df = q_bh_fdr(sf_dir).to_pandas().sort_values("rank")
    m = int(df["m"].iloc[0])
    # brute-force the step-up over ALL documents
    pv = []
    for d in range(m):
        h = int(hashlib.md5(f"bh|{d}".encode()).hexdigest()[:13], 16)
        pl = int(d % 97 == 0)
        pv.append((h // 1024 if pl else h, d, pl))
    pv.sort()
    kstar = 0
    for k, (u, _, _) in enumerate(pv, start=1):
        if u * _BH_ALPHA_DEN * m <= k * _BH_ALPHA_NUM * (1 << 52):
            kstar = k
    assert len(df) == kstar
    assert list(df["doc_id"]) == [d for _, d, _ in pv[:kstar]]
    assert list(df["u52"]) == [u for u, _, _ in pv[:kstar]]
    # power: BH must find most planted anomalies...
    n_planted = sum(pl for _, _, pl in pv)
    assert df["planted"].sum() >= n_planted - 2
    # ...while controlling the false fraction near alpha (generous
    # bound: observed FDR below 0.5 on this seed)
    assert (1 - df["planted"].mean()) <= 0.5


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

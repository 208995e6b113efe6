"""Sixty-seventh-wave tests: STL-lite, ICC/DEFF, Lindley waits."""

import hashlib

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave67 import (
    _LW_ARRIVAL_GAP,
    _LW_MAXK,
    _STL_P,
    _W67_Q,
    q_icc_design_effect,
    q_lindley_waits,
    q_stl_decompose,
)


def test_stl_removes_seasonal_variance(ray_session, sf_dir):
    df = q_stl_decompose(sf_dir).to_pandas()
    assert len(df) == _STL_P
    # seasonal components average ~0 by construction of detrending
    assert abs(df["seasonal_q"].mean()) < 2 * _W67_Q
    # the decomposition is useful iff removing the seasonal never
    # increases the (scale-adjusted) variance materially: compare
    # var_rem (z in d*1000 units) against var_det * 1000^2
    var_det = int(df["var_det_num"].iloc[0])
    var_rem = int(df["var_rem_num"].iloc[0])
    assert var_rem <= var_det * 1000 * 1000
    # brute recompute of the seasonal means
    con = duckdb.connect()
    series = con.execute(
        f"SELECT epoch_us(ts)//3600000000 hb, count(*) x FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY hb ORDER BY hb"
    ).fetchall()
    hbs = [int(h) for h, _ in series]
    x = [int(v) for _, v in series]
    T = len(x)
    half = _STL_P // 2
    csum = np.concatenate([[0], np.cumsum(x)])
    sea_sum = {h: 0 for h in range(_STL_P)}
    sea_n = {h: 0 for h in range(_STL_P)}
    for i in range(half, T - half):
        d = _STL_P * x[i] - int(csum[i + half] - csum[i - half])
        sea_sum[hbs[i] % _STL_P] += d
        sea_n[hbs[i] % _STL_P] += 1
    for _, r in df.iterrows():
        h = int(r["hour"])
        s, n = sea_sum[h], max(sea_n[h], 1)
        mag = abs(s) * _W67_Q // n
        assert r["seasonal_q"] == (-mag if s < 0 else mag)
        assert r["n_obs"] == sea_n[h]


def test_icc_positive_and_deff_inflates(ray_session, sf_dir):
    row = q_icc_design_effect(sf_dir).to_pandas().iloc[0]
    assert row["k_users"] > 1 and row["n_events"] > row["k_users"]
    assert row["ssb_q"] >= 0 and row["ssw_q"] >= 0
    # ICC is a correlation: |icc| <= 1 (quantized)
    assert abs(row["icc_q"]) <= _W67_Q
    # DEFF = 1 + (mbar-1)*ICC: recompute the linkage
    mbar_q = row["n_events"] * _W67_Q // row["k_users"]
    icc = int(row["icc_q"])
    gain = (mbar_q - _W67_Q) * abs(icc) // _W67_Q
    expect = _W67_Q - gain if icc < 0 else _W67_Q + gain
    assert row["deff_q"] == expect


def test_lindley_matches_brute_recursion(ray_session, sf_dir):
    df = q_lindley_waits(sf_dir).to_pandas()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    streams: dict = {}
    for d in range(n):
        hid = 0 if d % 7 == 0 else d % 50
        streams.setdefault(f"site{hid}.example.com", []).append(d)
    assert len(df) == len(streams)
    for _, r in df.iterrows():
        ids = sorted(streams[r["host"]])[:_LW_MAXK]
        w = wmax = wtot = 0
        for j in range(len(ids)):
            if j > 0:
                svc = 1 + int(
                    hashlib.md5(
                        f"svc|{ids[j - 1]}".encode()
                    ).hexdigest()[:8],
                    16,
                ) % 79
                w = max(0, w + svc - _LW_ARRIVAL_GAP)
            wmax = max(wmax, w)
            wtot += w
        assert r["n_jobs"] == len(ids)
        assert r["w_final"] == w and r["w_max"] == wmax
        assert r["w_total"] == wtot
    # mean service 40 == arrival gap (critical load): queues do form
    assert (df["w_max"] > 0).any()

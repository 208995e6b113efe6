"""Forty-eighth-wave tests: DP Laplace release, Burrows' Delta,
changepoint."""

import hashlib
import math

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave48 import (
    _BD_FQ,
    _BD_TOP,
    _BD_TQ,
    _CP_D,
    _DP_B,
    q_burrows_delta,
    q_changepoint_binseg,
    q_dp_host_counts,
)


def test_dp_noise_is_seeded_laplace(ray_session, sf_dir):
    df = q_dp_host_counts(sf_dir).to_pandas()
    assert len(df) == 50
    assert ((df["u"] > 0) & (df["u"] < 1)).all()
    for _, r in df.iterrows():
        h52 = int(
            hashlib.md5(f"dp|{r['host']}".encode()).hexdigest()[:13], 16
        )
        u = (float(h52) + 0.5) / 4503599627370496.0
        noise = (
            _DP_B * math.log(2.0 * u)
            if u < 0.5
            else -_DP_B * math.log(2.0 * (1.0 - u))
        )
        assert r["noise"] == noise
        assert r["released"] == float(r["n"]) + noise
    # Laplace is symmetric and unbounded: both signs should appear
    assert (df["noise"] > 0).any() and (df["noise"] < 0).any()


def test_burrows_delta_brute_pair(ray_session, sf_dir):
    df = q_burrows_delta(sf_dir).to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    cst: dict = {}
    for _, r in docs.iterrows():
        for tok in r["text"].split():
            cst[(r["source"], tok)] = cst.get((r["source"], tok), 0) + 1
    srcs = sorted({s for s, _ in cst})
    k = len(srcs)
    assert len(df) == k * (k - 1) // 2
    ns = {s: sum(c for (ss, _), c in cst.items() if ss == s) for s in srcs}
    glob: dict = {}
    for (_, t), c in cst.items():
        glob[t] = glob.get(t, 0) + c
    top = sorted(glob, key=lambda t: (-glob[t], t))[:_BD_TOP]
    fq = {
        (s, t): cst.get((s, t), 0) * _BD_FQ // ns[s]
        for s in srcs
        for t in top
    }
    sig = {}
    for t in top:
        mq = sum(fq[(s, t)] for s in srcs) // k
        vn = sum((fq[(s, t)] - mq) ** 2 for s in srcs)
        sig[t] = max(
            int(math.floor(math.sqrt(float(vn) / float(k)) + 0.5)), 1
        )
    a, b = srcs[0], srcs[1]
    expect = (
        sum(abs(fq[(a, t)] - fq[(b, t)]) * _BD_TQ // sig[t] for t in top)
        // len(top)
    )
    got = df.loc[(df["a"] == a) & (df["b"] == b), "delta_q"].iloc[0]
    assert got == expect
    assert (df["delta_q"] >= 0).all()


def test_changepoint_is_global_argmin(ray_session, sf_dir):
    row = q_changepoint_binseg(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    series = con.execute(
        f"SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 hb,"
        f" count(*) x FROM read_parquet('{sf_dir}/events.parquet')"
        f" GROUP BY hb ORDER BY hb"
    ).fetchall()
    hbs = [int(h) for h, _ in series]
    x = [int(v) for _, v in series]
    T = len(x)
    assert row["n_left"] + row["n_right"] == T
    S, S2 = sum(x), sum(v * v for v in x)
    best = None
    SL = S2L = 0
    for tau in range(1, T):
        SL += x[tau - 1]
        S2L += x[tau - 1] ** 2
        nL, nR = tau, T - tau
        SR, S2R = S - SL, S2 - S2L
        num = (nL * S2L - SL * SL) * nR + (nR * S2R - SR * SR) * nL
        cq = num * _CP_D // (nL * nR)
        if best is None or cq < best[0]:
            best = (cq, tau)
    assert row["cost_q"] == best[0]
    assert row["tau_hb"] == hbs[best[1]]
    # splitting must never beat the unsplit SSE scaled the same way
    unsplit = (T * S2 - S * S) * _CP_D // T
    assert row["cost_q"] <= unsplit

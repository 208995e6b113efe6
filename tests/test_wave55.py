"""Fifty-fifth-wave tests: QLD retrieval, log-rank, EDF feasibility."""

import math

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave55 import (
    _EDF_CAP_Q,
    _LR_Q,
    _QLD_MU,
    _QLD_TERMS,
    q_edf_feasibility,
    q_logrank_test,
    q_qld_topk,
)


def test_qld_matches_brute_scoring(ray_session, sf_dir):
    df = q_qld_topk(sf_dir).to_pandas()
    assert list(df["rank"]) == list(range(1, 11))
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    toks = [t.lower().split() for t in docs["text"]]
    clen = sum(len(t) for t in toks)
    cfs = [sum(t.count(q) for t in toks) for q in _QLD_TERMS]
    scores = {}
    for did, t in zip(docs["doc_id"], toks):
        s = 0.0
        for i, q in enumerate(_QLD_TERMS):
            s = s + math.log(
                (float(t.count(q)) + _QLD_MU * (float(cfs[i]) / float(clen)))
                / (float(len(t)) + _QLD_MU)
            )
        scores[int(did)] = round(s, 8)
    order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(df["doc_id"]) == [d for d, _ in order]
    assert list(df["score"]) == [s for _, s in order]
    # smoothing sanity: a doc with more query-term mass ranks higher
    assert df["score"].iloc[0] >= df["score"].iloc[-1]


def test_logrank_brute_life_table(ray_session, sf_dir):
    row = q_logrank_test(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    u = con.execute(
        f"SELECT user_id, (epoch_us(MAX(ts)) - epoch_us(MIN(ts)))"
        f" // 86400000000 AS life"
        f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY user_id"
    ).fetchdf()
    u["grp"] = (u["user_id"] % 5 == 0).astype(int)
    assert row["n_treat"] == int(u["grp"].sum())
    at1, at = int(u["grp"].sum()), len(u)
    o1 = e1 = var = 0
    for life in sorted(u["life"].unique()):
        g = u[u["life"] == life]
        d = len(g)
        d1 = int(g["grp"].sum())
        e1 += d * at1 * _LR_Q // at
        if at > 1:
            var += (
                d * at1 * (at - at1) * (at - d) * _LR_Q
                // (at * at * (at - 1))
            )
        o1 += d1
        at1 -= d1
        at -= d
    assert row["o1"] == o1 and row["e1_q"] == e1 and row["var_q"] == var
    num = o1 * _LR_Q - e1
    assert row["chi2"] == float(num) * float(num) / (
        float(var) * float(_LR_Q)
    )
    # no real treatment in the synthetic stream: chi2 should be modest
    assert row["chi2"] < 15.0


def test_edf_admission_prefix(ray_session, sf_dir):
    df = q_edf_feasibility(sf_dir).to_pandas()
    assert len(df) == 50
    # utilizations follow 1e13 // ttl exactly
    assert (df["util_q"] == 10**13 // df["ttl_q"]).all()
    # admitted rows form a prefix in cumulative order
    s = df.sort_values("cum_util_q")
    admits = s["admit"].to_numpy()
    if (admits == 0).any():
        first_reject = int(np.argmax(admits == 0))
        assert (admits[:first_reject] == 1).all()
        assert (admits[first_reject:] == 0).all()
    assert (s["admit"] == (s["cum_util_q"] <= _EDF_CAP_Q).astype(int)).all()

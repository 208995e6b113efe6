"""Thirty-second-wave tests: WFQ order, table profiling, Rocchio
expansion."""

import numpy as np
import pyarrow as pa

from crawl4ai_ray.pipelines.queries_wave32 import (
    _RC_QUERY,
    _WFQ_LIMIT,
    q_rocchio_expansion,
    q_table_profile,
    q_wfq_order,
)


def test_wfq_weight_proportional_admission(ray_session, sf_dir):
    df = q_wfq_order(sf_dir).to_pandas()
    assert len(df) == _WFQ_LIMIT
    # finish times non-decreasing in admission order
    assert (np.diff(df["finish_q"]) >= 0).all()
    # weight-3 hosts (hid % 3 == 2) admit ~3x weight-1 hosts early on:
    # count admissions by weight class in the first 100
    hid = df["host"].str.extract(r"site(\d+)")[0].astype(int)
    w = 1 + (hid % 3)
    per_host = df.assign(w=w).groupby("host").agg(n=("w", "size"), w=("w", "first"))
    mean_by_w = per_host.groupby("w")["n"].mean()
    assert mean_by_w.loc[3] > mean_by_w.loc[1]


def test_wfq_within_host_fifo(ray_session, sf_dir):
    df = q_wfq_order(sf_dir).to_pandas()
    for _, g in df.groupby("host"):
        assert (np.diff(g["doc_id"]) > 0).all()  # FIFO per host


def test_table_profile_values(ray_session, sf_dir):
    df = q_table_profile(sf_dir).to_pandas().set_index("column")
    n = int(df["n_rows"].iloc[0])
    assert (df["n_rows"] == n).all()
    assert (df["n_null"] == 0).all()  # synthetic lineitem has no nulls
    assert df.loc["l_returnflag", "ndv"] <= 3  # A/N/R
    assert df.loc["l_orderkey", "ndv"] <= n
    assert (df["ndv"] >= 1).all()


def test_rocchio_excludes_query_terms(ray_session, sf_dir):
    df = q_rocchio_expansion(sf_dir).to_pandas()
    assert len(df) == 10
    assert not set(df["term"]) & set(_RC_QUERY)
    # weights sorted descending with term tiebreak
    w = df["weight_q"].tolist()
    assert all(w[i] >= w[i + 1] for i in range(len(w) - 1))
    assert (df["tf_fb"] > 0).all()
    assert (df["df"] > 0).all()

"""Sixty-fifth-wave tests: W1 source matrix, percolation, Erlang B."""

import hashlib

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave65 import (
    _EB_CAP,
    _EB_CHANNELS,
    _PERC_KEEPS,
    _W65_Q,
    q_erlang_b,
    q_percolation_curve,
    q_w1_source_matrix,
)


def test_w1_matrix_metric_properties(ray_session, sf_dir):
    df = q_w1_source_matrix(sf_dir).to_pandas()
    con = duckdb.connect()
    srcs = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT source FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY source"
        ).fetchall()
    ]
    k = len(srcs)
    assert len(df) == k * (k - 1) // 2
    assert (df["w1_q"] >= 0).all()
    # spot-check one pair against the wasserstein_1d-style brute
    docs = con.execute(
        f"SELECT source, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    a, b = srcs[0], srcs[1]
    xa = np.sort(docs.loc[docs["source"] == a, "n_chars"].to_numpy())
    xb = np.sort(docs.loc[docs["source"] == b, "n_chars"].to_numpy())
    vals = np.unique(np.concatenate([xa, xb]))
    s = 0
    for i in range(len(vals) - 1):
        ca = int((xa <= vals[i]).sum())
        cb = int((xb <= vals[i]).sum())
        s += abs(ca * len(xb) - cb * len(xa)) * int(
            vals[i + 1] - vals[i]
        )
    expect = s * _W65_Q // (len(xa) * len(xb))
    got = df.loc[(df["a"] == a) & (df["b"] == b), "w1_q"].iloc[0]
    assert got == expect
    # medoid minimizes the total distance
    med = df["medoid"].iloc[0]
    totals = {}
    for _, r in df.iterrows():
        totals[r["a"]] = totals.get(r["a"], 0) + r["w1_q"]
        totals[r["b"]] = totals.get(r["b"], 0) + r["w1_q"]
    assert totals[med] == min(totals.values())


def test_percolation_monotone_fragmentation(ray_session, sf_dir):
    df = (
        q_percolation_curve(sf_dir).to_pandas().set_index("keep_pct")
    )
    assert list(df.index) == list(_PERC_KEEPS)
    # fewer surviving edges => never fewer components, never a larger
    # giant component
    assert df.loc[80, "n_edges"] > df.loc[50, "n_edges"] > df.loc[20, "n_edges"]
    assert (
        df.loc[80, "n_components"]
        <= df.loc[50, "n_components"]
        <= df.loc[20, "n_components"]
    )
    assert (
        df.loc[80, "largest_cc"]
        >= df.loc[50, "largest_cc"]
        >= df.loc[20, "largest_cc"]
    )
    # random failure on this expander-ish graph: giant component
    # survives 50% failure (contrast graph_robustness's hub attack)
    assert df.loc[50, "largest_frac_q"] > 0.9 * _W65_Q


def test_erlang_b_recursion_and_monotonicity(ray_session, sf_dir):
    df = q_erlang_b(sf_dir).to_pandas()
    for _, r in df.iterrows():
        a = r["n"] / float(_EB_CAP)
        assert r["a"] == a
        b = 1.0
        for k, col in zip(range(1, _EB_CHANNELS + 1), ("b1", "b2", "b3")):
            b = a * b / (float(k) + a * b)
            assert r[col] == b
    # more channels => strictly less blocking
    assert (df["b2"] < df["b1"]).all()
    assert (df["b3"] < df["b2"]).all()
    # heavier host => more blocking at fixed channels
    s = df.sort_values("n")
    assert s["b3"].is_monotonic_increasing

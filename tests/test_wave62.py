"""Sixty-second-wave tests: pooled QC, SRM check, winsorized means."""

import hashlib

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave62 import (
    _PQ_MAXK,
    _W62_Q,
    _WM_P_DEN,
    _WM_P_NUM,
    q_pooled_qc,
    q_srm_check,
    q_winsorized_means,
)


def test_pooled_qc_saves_tests_and_kstar_optimal(ray_session, sf_dir):
    row = q_pooled_qc(sf_dir).to_pandas().iloc[0]
    n, f = int(row["n"]), int(row["fails"])
    p = f / n
    # k* is the argmin of the Dorfman expected rate
    rates = {
        k: 1.0 / k + 1.0 - (1.0 - p) ** k
        for k in range(2, _PQ_MAXK + 1)
    }
    assert row["kstar"] == min(rates, key=lambda k: (rates[k], k))
    assert row["exp_rate"] == rates[int(row["kstar"])]
    # accounting identity and actual savings at this defect rate
    assert row["total_tests"] == row["n_pools"] + row["retests"]
    assert row["saved_vs_naive"] == n - row["total_tests"]
    # Dorfman only helps when p is modest; with ~50% gopher fails the
    # savings can be negative — just require the simulation consistent
    # with a brute pool scan
    import functools

    from crawl4ai_ray.stages import textstats

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    import pyarrow as pa

    keep = (
        functools.partial(textstats.gopher_rules_batch, min_stops=1)(
            pa.table(
                {
                    "doc_id": pa.array(docs["doc_id"], pa.int64()),
                    "text": pa.array(docs["text"], pa.string()),
                }
            )
        )
        .column("keep")
        .to_numpy(zero_copy_only=False)
    )
    fail = ~keep
    k = int(row["kstar"])
    pools = {}
    for d, fl in zip(docs["doc_id"], fail):
        pools.setdefault(d // k, []).append(fl)
    retests = sum(len(v) for v in pools.values() if any(v))
    assert row["n_pools"] == len(pools)
    assert row["retests"] == retests


def test_srm_passes_on_fair_splitter(ray_session, sf_dir):
    row = q_srm_check(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()["doc_id"]
    a = sum(
        1
        for d in ids
        if int(hashlib.md5(f"ab|{d}".encode()).hexdigest()[:8], 16) % 2
        == 0
    )
    assert row["arm_a"] == a and row["arm_b"] == len(ids) - a
    assert row["chi2"] == (row["arm_a"] - row["arm_b"]) ** 2 / len(ids)
    # the md5 splitter is fair: no SRM alarm
    assert row["srm"] == 0


def test_winsorized_means_clip_and_robustness(ray_session, sf_dir):
    df = q_winsorized_means(sf_dir).to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    for _, r in df.iterrows():
        xs = np.sort(
            docs.loc[docs["source"] == r["source"], "n_chars"].to_numpy()
        )
        n = len(xs)
        k_lo = (_WM_P_NUM * n + _WM_P_DEN - 1) // _WM_P_DEN
        k_hi = (
            (_WM_P_DEN - _WM_P_NUM) * n + _WM_P_DEN - 1
        ) // _WM_P_DEN
        assert r["lo"] == xs[k_lo - 1] and r["hi"] == xs[k_hi - 1]
        wins = np.clip(xs, r["lo"], r["hi"]).sum()
        assert r["wins_mean_q"] == int(wins) * _W62_Q // n
        assert r["raw_mean_q"] == int(xs.sum()) * _W62_Q // n
        # clipping bounds the estimate between the clip bounds
        assert r["lo"] * _W62_Q <= r["wins_mean_q"] <= r["hi"] * _W62_Q

"""Forty-second-wave tests: Viterbi bursts, seasonal naive, entropy
rate."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave42 import (
    q_hmm_viterbi_bursts,
    q_markov_entropy_rate,
    q_seasonal_naive_eval,
)


def test_viterbi_decodes_planted_burst(ray_session, tmp_path):
    # 10 quiet days at 100, 5 burst days at 200 (= 2x median), 5 quiet
    day = 86_400_000_000
    base = 1_600_000_000_000_000
    ts = []
    xs = [100] * 10 + [200] * 5 + [100] * 5
    for d, x in enumerate(xs):
        ts += [base + d * day + i * 1000 for i in range(x)]
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_hmm_viterbi_bursts(str(tmp_path)).to_pandas().sort_values("day")
    states = df["state"].tolist()
    assert states[:10] == [0] * 10
    assert states[10:15] == [1] * 5
    assert states[15:] == [0] * 5


def test_viterbi_uniform_stays_normal(ray_session, sf_dir):
    df = q_hmm_viterbi_bursts(sf_dir).to_pandas()
    assert df["state"].isin([0, 1]).all()
    # a uniform-rate stream never pays the switch cost
    assert (df["state"] == 0).all()
    # costs are non-decreasing over time
    assert (np.diff(df.sort_values("day")["cost0"]) >= 0).all()


def test_seasonal_naive_consistency(ray_session, sf_dir):
    row = q_seasonal_naive_eval(sf_dir).to_pandas().iloc[0]
    assert row["n_days"] > 0
    assert row["sae_lag1"] >= 0 and row["sae_lag7"] >= 0
    if row["sae_lag1"]:
        assert row["ratio"] == row["sae_lag7"] / row["sae_lag1"]


def test_entropy_rate_near_iid_bound(ray_session, sf_dir):
    df = q_markov_entropy_rate(sf_dir).to_pandas()
    assert len(df) == 5
    h = float(df["h_rate"].iloc[0])
    # uniform-ish 5-type events: entropy rate close to ln(5), never above
    assert 0.9 * math.log(5) < h <= math.log(5) + 1e-9
    assert (df["h_cond_q"] >= 0).all()
    assert df["h_rate"].nunique() == 1

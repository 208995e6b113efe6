"""Forty-fourth-wave tests: ACF, decision stump, feature hashing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave44 import (
    _FH_BUCKETS,
    q_acf_daily,
    q_decision_stump,
    q_feature_hash_audit,
)


def test_acf_uniform_stream_near_zero(ray_session, sf_dir):
    df = q_acf_daily(sf_dir).to_pandas()
    assert len(df) == 7
    # a rate-uniform stream has no autocorrelation structure
    assert (df["acf"].abs() < 0.6).all()
    assert ((df["acf"] >= -1.001) & (df["acf"] <= 1.001)).all()


def test_acf_alternating_signal(ray_session, tmp_path):
    # alternating 50/150 daily counts -> acf(1) strongly negative,
    # acf(2) strongly positive
    day = 86_400_000_000
    base = 1_600_000_000_000_000
    ts = []
    for d in range(14):
        x = 150 if d % 2 else 50
        ts += [base + d * day + i * 1000 for i in range(x)]
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_acf_daily(str(tmp_path)).to_pandas().set_index("lag")
    assert df.loc[1, "acf"] < -0.8
    assert df.loc[2, "acf"] > 0.7


def test_stump_prefers_informative_split(ray_session, sf_dir):
    row = q_decision_stump(sf_dir).to_pandas().iloc[0]
    n = row["n_left"] + row["n_right"]
    assert n == 500
    # longer docs are likelier to contain any given token: the right
    # side has a higher positive rate
    rate_l = row["pos_left"] / row["n_left"]
    rate_r = row["pos_right"] / row["n_right"]
    assert rate_r > rate_l
    assert row["gini_q"] >= 0


def test_feature_hash_matches_birthday(ray_session, sf_dir):
    row = q_feature_hash_audit(sf_dir).to_pandas().iloc[0]
    assert row["n_buckets"] == _FH_BUCKETS
    assert row["n_occupied"] <= min(row["n_features"], _FH_BUCKETS)
    assert (
        row["n_collided"] == row["n_features"] - row["n_occupied"]
    )
    expect = row["expect_occupied_q"] / 1e6
    # measured occupancy within a few percent of the birthday bound
    assert abs(row["n_occupied"] - expect) < 0.1 * expect

"""Twenty-seventh-wave tests: k-center coreset, isotonic calibration,
CUSUM alarms."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave27 import (
    _KC_K,
    q_cusum_alarm,
    q_isotonic_calibration,
    q_kcenter_coreset,
)


def test_kcenter_hand_case(ray_session, tmp_path):
    # 1-d points on a line: 0, 1, 10, 100 (padded to 2 dims)
    vals = [0.0, 1.0, 10.0, 100.0]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(
                [[v, 0.0] for v in vals], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    df = q_kcenter_coreset(str(tmp_path)).to_pandas().sort_values("t")
    # greedy from 0: farthest is 100 (id 3), then 10 (id 2), then 1 (id 1)
    picks = df["vec_id"].tolist()[: _KC_K]
    assert picks[:4] == [0, 3, 2, 1]
    # coverage radius non-increasing after t=1
    d = df["dist_fp"].tolist()
    assert all(d[i] >= d[i + 1] for i in range(1, len(d) - 1))


def test_kcenter_radius_monotone(ray_session, sf_dir):
    df = q_kcenter_coreset(sf_dir).to_pandas().sort_values("t")
    assert len(df) == _KC_K
    assert df["t"].tolist() == list(range(_KC_K))
    d = df["dist_fp"].tolist()
    assert d[0] == 0
    assert all(d[i] >= d[i + 1] for i in range(1, len(d) - 1))
    assert df["vec_id"].nunique() == _KC_K  # no re-picks


def test_isotonic_fit_is_monotone_and_pooled(ray_session, sf_dir):
    df = q_isotonic_calibration(sf_dir).to_pandas().sort_values("bucket")
    f = df["fit"].to_numpy()
    assert (np.diff(f) >= -1e-12).all()  # monotone non-decreasing
    # the fit preserves the overall mass: sum fit*n == sum pos (PAVA
    # block means average within pools)
    assert abs((f * df["n"].to_numpy()).sum() - df["pos"].sum()) < 1e-6
    assert ((f >= 0) & (f <= 1)).all()


def test_cusum_detects_planted_burst(ray_session, tmp_path):
    # 10 quiet days of 10 events, then 3 days of 50 -> alarm in the burst
    day = 86_400_000_000
    base = 1_600_000_000_000_000
    ts = []
    for d in range(10):
        ts += [base + d * day + i * 1000 for i in range(10)]
    for d in range(10, 13):
        ts += [base + d * day + i * 1000 for i in range(50)]
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_cusum_alarm(str(tmp_path)).to_pandas().sort_values("day")
    assert len(df) == 13
    assert df.head(10)["alarm"].sum() == 0  # quiet period clean
    assert df.tail(2)["alarm"].sum() >= 1  # burst flagged
    # CUSUM statistic is never negative
    assert (df["s"] >= 0).all()


def test_cusum_uniform_rate_no_alarm(ray_session, sf_dir):
    df = q_cusum_alarm(sf_dir).to_pandas()
    assert (df["s"] >= 0).all()
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert df["x"].sum() == n_events

"""Forty-fifth-wave tests: Theil-Sen, Mann-Kendall, capture-recapture."""

import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave45 import (
    q_capture_recapture,
    q_mann_kendall,
    q_theil_sen_trend,
)


def _mk_daily(tmp_path, xs):
    day = 86_400_000_000
    base = 1_600_000_000_000_000
    ts = []
    for d, x in enumerate(xs):
        ts += [base + d * day + i * 1000 for i in range(x)]
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_theil_sen_linear_trend(ray_session, tmp_path):
    # x = 100 + 5d with one wild outlier: Theil-Sen still reads slope 5
    xs = [100 + 5 * d for d in range(15)]
    xs[7] = 500
    _mk_daily(tmp_path, xs)
    row = q_theil_sen_trend(str(tmp_path)).to_pandas().iloc[0]
    assert row["slope"] == 5.0
    assert row["med_num"] / row["med_den"] == 5.0


def test_theil_sen_flat_stream(ray_session, sf_dir):
    row = q_theil_sen_trend(sf_dir).to_pandas().iloc[0]
    assert row["n_pairs"] > 0
    assert abs(row["slope"]) < 5.0  # no drift on the uniform stream


def test_mann_kendall_detects_trend(ray_session, tmp_path):
    _mk_daily(tmp_path, [100 + 10 * d for d in range(15)])
    row = q_mann_kendall(str(tmp_path)).to_pandas().iloc[0]
    assert row["s"] == 15 * 14 // 2  # every pair increasing
    assert row["z_q"] / 1e9 > 3.0  # decisive trend


def test_mann_kendall_null_on_uniform(ray_session, sf_dir):
    row = q_mann_kendall(sf_dir).to_pandas().iloc[0]
    assert abs(row["z_q"] / 1e9) < 2.5
    assert row["var18"] > 0


def test_capture_recapture_estimates_universe(ray_session, sf_dir):
    row = q_capture_recapture(sf_dir).to_pandas().iloc[0]
    assert row["n_true"] == 500
    assert row["overlap"] <= min(row["n1"], row["n2"])
    # LP estimate within 20% of truth at ~40% sampling
    assert abs(row["n_est"] - 500) < 100

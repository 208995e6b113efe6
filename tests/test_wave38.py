"""Thirty-eighth-wave tests: runs test, EWMA forecast, permutation
test."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave38 import (
    _EW_ALPHA,
    _PT_B,
    q_ewma_forecast,
    q_permutation_test,
    q_shuffle_runs_test,
)


def test_runs_test_random_order_near_zero_z(ray_session, sf_dir):
    row = q_shuffle_runs_test(sf_dir).to_pandas().iloc[0]
    assert row["n1"] + row["n0"] == 500
    assert 1 <= row["runs"] <= 500
    # md5 order is a good shuffle of parities: |z| small
    assert abs(row["z_q"] / 1e9) < 3.0
    assert abs(row["mu"] - (1 + 2 * row["n1"] * row["n0"] / 500)) < 1e-9


def test_ewma_recurrence_identity(ray_session, sf_dir):
    df = q_ewma_forecast(sf_dir).to_pandas().sort_values("day")
    x = df["x"].to_numpy(float)
    s = df["s"].to_numpy()
    f = df["forecast"].to_numpy()
    assert f[0] == x[0] and s[0] == x[0]
    for i in range(1, len(df)):
        assert f[i] == s[i - 1]
        assert s[i] == s[i - 1] + _EW_ALPHA * (x[i] - s[i - 1])
    assert np.allclose(df["resid"], x - f)


def test_permutation_test_null_is_insignificant(ray_session, sf_dir):
    row = q_permutation_test(sf_dir).to_pandas().iloc[0]
    # doc parity is independent of length: p should NOT be extreme
    assert row["p_value"] > 0.01
    assert 0 < row["p_value"] <= 1
    assert 0 <= row["n_ge"] <= _PT_B


def test_permutation_test_detects_planted_shift(ray_session, tmp_path):
    # odd docs 3x longer -> tiny p-value
    n = 200
    ids = np.arange(n)
    n_chars = np.where(ids % 2 == 1, 300, 100)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = q_permutation_test(str(tmp_path)).to_pandas().iloc[0]
    assert row["p_value"] == 1.0 / (_PT_B + 1)  # no permutation reaches it
    assert row["n_ge"] == 0

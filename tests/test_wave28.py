"""Twenty-eighth-wave tests: priority sampling estimator, grouped
quantiles, facility-location selection."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave28 import (
    _FS_ROUNDS,
    _PS_K,
    q_facility_select,
    q_lang_length_quantiles,
    q_priority_sample_est,
)


def test_priority_sample_estimator_accuracy(ray_session, sf_dir):
    df = q_priority_sample_est(sf_dir).to_pandas()
    assert len(df) == _PS_K
    est = float(df["est_total"].iloc[0])
    true = float(df["true_total"].iloc[0])
    # DLT estimator is unbiased; at k=32 over 500 iid weights the
    # relative error is typically well under 50%
    assert abs(est - true) / true < 0.5
    # every kept item's adjusted weight >= its raw weight is NOT
    # guaranteed, but w_hat >= min(w, tau) is; check w_hat >= w OR
    # w_hat == round(tau) pattern via: w_hat_q >= w (scaled) for small w
    assert (df["priority"].to_numpy() > 0).all()
    assert df["doc_id"].nunique() == _PS_K


def test_priority_sample_exhaustive_small(ray_session, tmp_path):
    # fewer docs than k: everything is kept and tau = 0 -> w_hat = w
    tbl = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(["x" * (i + 1) for i in range(5)], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_priority_sample_est(str(tmp_path)).to_pandas()
    assert len(df) == 5
    assert float(df["est_total"].iloc[0]) == float(df["true_total"].iloc[0])


def test_lang_quantiles_hand(ray_session, tmp_path):
    tbl = pa.table(
        {
            "lang": pa.array(["en"] * 10 + ["fr"] * 3, pa.string()),
            "n_chars": pa.array(
                [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 5, 6, 7],
                pa.int64(),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_lang_length_quantiles(str(tmp_path)).to_pandas()
    en = df[df["lang"] == "en"].iloc[0]
    fr = df[df["lang"] == "fr"].iloc[0]
    # ceil(0.5*10)=5th -> 50; ceil(0.9*10)=9th -> 90
    assert en["p50"] == 50 and en["p90"] == 90
    # ceil(0.5*3)=2nd -> 6; ceil(0.9*3)=3rd -> 7
    assert fr["p50"] == 6 and fr["p90"] == 7


def test_facility_select_monotone_gains(ray_session, sf_dir):
    df = q_facility_select(sf_dir).to_pandas().sort_values("t")
    assert len(df) == _FS_ROUNDS
    g = df["gain"].tolist()
    # submodularity: marginal gains are non-increasing
    assert all(g[i] >= g[i + 1] for i in range(len(g) - 1))
    assert df["vec_id"].nunique() == _FS_ROUNDS
    assert (df["vec_id"] % 10 == 0).all()  # pool membership


def test_facility_select_prefers_duplicated_direction(ray_session, tmp_path):
    # 10 docs clustered near +e1, 2 docs near +e2; candidates = ids % 10
    # == 0 -> {0, 10}. id 0 is in the big cluster, id 10 in the small:
    # round 0 must pick the big-cluster candidate (0).
    vecs = [[1.0, 0.0]] * 10 + [[0.0, 1.0]] * 2
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(10)) + [10, 11], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    df = q_facility_select(str(tmp_path)).to_pandas().sort_values("t")
    assert len(df) == 2  # pool exhausted before _FS_ROUNDS
    assert int(df.iloc[0]["vec_id"]) == 0
    assert int(df.iloc[1]["vec_id"]) == 10

"""Twenty-ninth-wave tests: JL projection eval, consistent-hash ring,
Fellegi-Sunter linkage scores."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave29 import (
    _RING_VNODES,
    _RING_WORKERS,
    q_fellegi_sunter,
    q_jl_projection_eval,
    q_ring_assign,
)


def test_jl_preserves_distances_on_average(ray_session, sf_dir):
    df = q_jl_projection_eval(sf_dir).to_pandas()
    assert len(df) == 100
    ratios = df["ratio_q"].to_numpy() / 1e9
    # E[ratio] = 1; at 16 output dims the mean over 100 pairs is close
    assert 0.7 < ratios.mean() < 1.3
    # no pair collapses to zero or explodes absurdly
    assert (ratios > 0.05).all() and (ratios < 5.0).all()
    assert (df["b"] - df["a"] == 1).all()


def test_jl_identical_vectors_project_identically(ray_session, tmp_path):
    # pair (0, 1) with identical embeddings -> d2_orig = d2_proj = 0
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0], [1.0, 2.0]], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    df = q_jl_projection_eval(str(tmp_path)).to_pandas()
    assert len(df) == 1
    assert int(df["d2_orig"].iloc[0]) == 0
    assert int(df["d2_proj"].iloc[0]) == 0
    assert int(df["ratio_q"].iloc[0]) == 0


def test_ring_assign_is_consistent_and_spread(ray_session, sf_dir):
    df = q_ring_assign(sf_dir).to_pandas()
    # every host maps to exactly one worker
    assert df.groupby("host")["worker"].nunique().max() == 1
    assert df["worker"].between(0, _RING_WORKERS - 1).all()
    # with 8x16 vnodes over 50 hosts, multiple workers get traffic
    assert df["worker"].nunique() >= _RING_WORKERS // 2
    # 500 pages total at both test sfs
    assert df["n_pages"].sum() == 500


def test_ring_vnode_constants_sane():
    assert _RING_WORKERS * _RING_VNODES == 128


def test_fellegi_sunter_separates_matches(ray_session, sf_dir):
    df = q_fellegi_sunter(sf_dir).to_pandas()
    m = df[df["is_match"] == 1]["score_q"]
    u = df[df["is_match"] == 0]["score_q"]
    assert len(m) > 0 and len(u) > 0
    # the match class scores strictly higher on average — the whole
    # point of the log-likelihood-ratio weights
    assert m.mean() > u.mean()
    # agreement bits are binary
    for c in ("g_key", "g_len", "g_ft"):
        assert df[c].isin([0, 1]).all()

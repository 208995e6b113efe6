"""Twentieth-wave operator unit tests: depth-quality profile, CDC
dedup ratio."""

import numpy as np

from crawl4ai_ray.pipelines.queries_wave20 import (
    q_cdc_dedup_ratio,
    q_depth_quality_profile,
)


def test_depth_quality_profile_shape(ray_session, sf_dir):
    df = q_depth_quality_profile(sf_dir).to_pandas().sort_values("depth")
    assert list(df["depth"]) == [0, 1, 2, 3]
    assert df["n_pages"].iloc[0] == 3  # the three seeds
    # BFS fan-out: page counts non-decreasing in the early waves of the
    # doubling graph
    assert df["n_pages"].iloc[1] >= df["n_pages"].iloc[0]
    assert (df["mean_chars"] * df["n_pages"] - df["sum_chars"]).abs().max() < 1e-6
    assert (df["sum_chars"] > 0).all()


def test_cdc_dedup_ratio_bounds(ray_session, sf_dir):
    row = q_cdc_dedup_ratio(sf_dir).to_pandas().iloc[0]
    assert 0 < row["unique_chunks"] <= row["total_chunks"]
    assert 0 < row["unique_chars"] <= row["total_chars"]
    assert 0 < row["chunk_dedup_ratio"] <= 1.0
    assert 0 < row["char_dedup_ratio"] <= 1.0
    # the planted prefix-shifted copies (every 11th doc) guarantee real
    # chunk sharing: the char dedup ratio must be clearly below 1
    assert row["char_dedup_ratio"] < 0.99

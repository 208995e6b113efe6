"""Thirty-ninth-wave tests: strategy overlap, AIMD rates, BM25 MRR."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave39 import (
    _AIMD_CAP,
    _AIMD_START,
    q_aimd_rates,
    q_bm25_mrr,
    q_strategy_overlap,
)


def test_strategy_overlap_consistent(ray_session, sf_dir):
    row = q_strategy_overlap(sf_dir).to_pandas().iloc[0]
    assert row["n_common"] <= min(row["n_bfs"], row["n_best_first"])
    assert 0.0 < row["jaccard"] <= 1.0
    # both strategies share the seed at minimum
    assert row["n_common"] >= 1


def test_aimd_rates_bounds(ray_session, sf_dir):
    df = q_aimd_rates(sf_dir).to_pandas()
    assert len(df) == 50
    assert df["final_rate"].between(1, _AIMD_CAP).all()
    assert (df["min_rate"] <= _AIMD_START).all()
    assert (df["max_rate"] >= _AIMD_START).all()
    assert (df["n_fail"] <= df["n_attempts"]).all()
    # failure-free hosts climb monotonically: final == min(start+n, cap)
    clean = df[df["n_fail"] == 0]
    if len(clean):
        expect = np.minimum(_AIMD_START + clean["n_attempts"], _AIMD_CAP)
        assert (clean["final_rate"] == expect).all()
    # the heavy-hitter host saw the most attempts
    assert df.loc[df["n_attempts"].idxmax(), "host"] == "site0.example.com"


def test_bm25_mrr_first_rank_consistency(ray_session, sf_dir):
    row = q_bm25_mrr(sf_dir).to_pandas().iloc[0]
    if row["first_rel_rank"] > 0:
        assert row["rr"] == 1.0 / row["first_rel_rank"]
        # BM25 should surface an all-terms doc high if one exists
        assert row["first_rel_rank"] <= 10
    assert 0 <= row["p_at_5_num"] <= 5
    assert row["p_at_5"] == row["p_at_5_num"] / 5.0

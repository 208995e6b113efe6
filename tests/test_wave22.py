"""Twenty-second-wave operator unit tests: LSH band curve, vocab
drift chi-square."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave22 import (
    _LBC_CONFIGS,
    _VD_TOP,
    q_lsh_band_curve,
    q_vocab_drift_chi2,
)


def test_lsh_band_curve_monotonicity(ray_session, sf_dir):
    df = (
        q_lsh_band_curve(sf_dir)
        .to_pandas()
        .sort_values("bands", ascending=False)
    )
    assert len(df) == len(_LBC_CONFIGS)
    assert df["n_pairs"].nunique() == 1
    # more bands (shorter rows) => higher candidate probability at any
    # J: both measured and expected counts are non-increasing as bands
    # decrease 8 -> 4 -> 2
    assert (np.diff(df["n_cand"].to_numpy()) <= 0).all()
    assert (np.diff(df["expected_cand"].to_numpy()) <= 1e-9).all()
    # measured within a loose envelope of theory (same pair family)
    for r in df.itertuples():
        assert abs(r.n_cand - r.expected_cand) <= max(
            10, 0.35 * r.n_pairs
        )


def test_vocab_drift_hand(ray_session, tmp_path):
    # even docs say 'aa bb', odd docs say 'aa cc': aa has zero drift,
    # bb/cc maximal for their counts
    texts = ["aa bb", "aa cc", "aa bb", "aa cc"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_vocab_drift_chi2(str(tmp_path)).to_pandas().set_index("tok")
    assert df.loc["aa", "term_q"] == 0
    # bb: (2-0)^2/2 = 2.0 -> q = 2e9
    assert df.loc["bb", "term_q"] == 2_000_000_000
    assert df.loc["cc", "term_q"] == 2_000_000_000
    assert (df["chi2_total_q"] == 4_000_000_000).all()
    assert df["chi2_total"].iloc[0] == 4.0


def test_vocab_drift_bounds(ray_session, sf_dir):
    df = q_vocab_drift_chi2(sf_dir).to_pandas()
    assert len(df) <= _VD_TOP
    # chi2 terms non-negative; movers sorted desc by term_q
    assert (df["term_q"] >= 0).all()
    tq = df.sort_values(["term_q", "tok"], ascending=[False, True])[
        "term_q"
    ].to_numpy()
    assert (np.diff(tq) <= 0).all()
    assert df["chi2_total_q"].nunique() == 1

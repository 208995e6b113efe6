"""change_rate (stages/freshness.py): hand-checked estimates, layout
independence, and the masked-change behavior the estimator corrects for."""

import math

import pyarrow as pa
import pytest

import ray

from crawl4ai_ray.stages.freshness import change_rate


def _snaps(rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "snap": pa.array([r[1] for r in rows], pa.int64()),
            "content_hash": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t)


def test_hand_checked_rates():
    rows = [
        # doc 1: 4 obs, hashes a a b b -> 1 change of 3 comparisons
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"),
        # doc 2: 3 obs, all change -> 2/2
        (2, 0, "x"), (2, 1, "y"), (2, 2, "z"),
        # doc 3: single observation -> NULL rate
        (3, 5, "q"),
    ]
    out = change_rate(_snaps(rows)).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_obs"] == 4 and out.loc[1, "n_changes"] == 1
    assert out.loc[1, "change_ratio"] == pytest.approx(1 / 3)
    assert out.loc[1, "est_rate"] == pytest.approx(-math.log((2 + 0.5) / (3 + 0.5)))
    # every-comparison-changed stays FINITE (the naive -ln(1-r) diverges)
    assert out.loc[2, "est_rate"] == pytest.approx(-math.log(0.5 / 2.5))
    assert out.loc[3, "n_obs"] == 1
    assert out.loc[3, "change_ratio"] is None or out.loc[3].isna()["change_ratio"]


def test_layout_independence():
    rows = [(d, k, f"h{(d * 3 + k * k) % 4}") for d in range(40) for k in range(5)]
    a = change_rate(_snaps(rows)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        change_rate(_snaps(rows).repartition(13))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_masked_changes_undercount_detected_not_estimator():
    # two edits between consecutive observations read as ONE detected
    # change: obs at snaps 0 and 2, content went a -> b -> c
    rows = [(7, 0, "a"), (7, 2, "c")]
    out = change_rate(_snaps(rows)).to_pandas()
    assert out.iloc[0]["n_changes"] == 1  # detected, not true count (2)

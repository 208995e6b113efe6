"""Eighteenth-wave operator unit tests: TextTiling segmentation,
audience overlap, per-source dup rate, shard skew audit."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave18 import (
    _SSK_P,
    _TT_BLOCK,
    _TT_THRESH,
    q_audience_overlap,
    q_dup_rate_by_source,
    q_shard_skew_stats,
    q_text_tiling_segments,
)


def _write_docs(tmp_path, texts, sources=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(
                sources or ["s0"] * len(texts), pa.string()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def test_text_tiling_topic_shift(ray_session, tmp_path):
    # doc 0: two 10-token blocks with DISJOINT vocab -> cos 0 -> boundary
    # doc 1: two identical blocks -> cos 1 -> no boundary
    # doc 2: short single block -> 0 boundaries, 1 segment
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    _write_docs(tmp_path, [a + " " + b, a + " " + a, "one two three"])
    df = (
        q_text_tiling_segments(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
    )
    assert (df.loc[0, "n_blocks"], df.loc[0, "n_segments"]) == (2, 2)
    assert (df.loc[1, "n_blocks"], df.loc[1, "n_segments"]) == (2, 1)
    assert (df.loc[2, "n_blocks"], df.loc[2, "n_segments"]) == (1, 1)


def test_text_tiling_invariants(ray_session, sf_dir):
    df = q_text_tiling_segments(sf_dir).to_pandas()
    assert (df["n_segments"] == df["n_boundaries"] + 1).all()
    assert (df["n_boundaries"] <= np.maximum(df["n_blocks"] - 1, 0)).all()


def _write_events(tmp_path, rows):
    uid, et = zip(*rows)
    tbl = pa.table(
        {
            "user_id": pa.array(list(uid), pa.int64()),
            "event_type": pa.array(list(et), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_audience_overlap_hand(ray_session, tmp_path):
    # users 1,2 do 'a'; users 2,3 do 'b'; user 4 does 'c' only
    rows = [(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "c"), (2, "a")]
    _write_events(tmp_path, rows)
    df = (
        q_audience_overlap(str(tmp_path))
        .to_pandas()
        .set_index(["type_a", "type_b"])
    )
    ab = df.loc[("a", "b")]
    assert (ab["n_both"], ab["n_either"]) == (1, 3)  # {2} / {1,2,3}
    assert ab["jaccard"] == 1.0 / 3.0
    ac = df.loc[("a", "c")]
    assert (ac["n_both"], ac["n_either"]) == (0, 3)
    assert ac["jaccard"] == 0.0


def test_audience_overlap_symmetric_bounds(ray_session, sf_dir):
    df = q_audience_overlap(sf_dir).to_pandas()
    assert (df["n_both"] <= df["n_either"]).all()
    assert ((df["jaccard"] >= 0) & (df["jaccard"] <= 1)).all()
    assert (df["type_a"] < df["type_b"]).all()
    assert len(df) == 10  # 5 types -> C(5,2)


def test_dup_rate_by_source_hand(ray_session, tmp_path):
    _write_docs(
        tmp_path,
        ["x", "x", "y", "z", "z", "z"],
        sources=["s0", "s0", "s0", "s1", "s1", "s1"],
    )
    df = q_dup_rate_by_source(str(tmp_path)).to_pandas().set_index("source")
    s0 = df.loc["s0"]
    assert (s0["n_docs"], s0["n_unique"], s0["n_dups"]) == (3, 2, 1)
    assert s0["dup_rate"] == 1.0 / 3.0
    s1 = df.loc["s1"]
    assert (s1["n_docs"], s1["n_unique"]) == (3, 1)
    assert s1["dup_rate"] == 2.0 / 3.0


def test_shard_skew_brute(ray_session, sf_dir):
    row = q_shard_skew_stats(sf_dir).to_pandas().iloc[0]
    counts = np.zeros(_SSK_P, np.int64)
    for i in range(int(row["n_rows"])):
        counts[int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % _SSK_P] += 1
    assert row["n_rows"] == counts.sum() == 500
    assert row["max_shard"] == counts.max()
    assert row["min_shard"] == counts.min()
    n = int(counts.sum())
    chi2s = int(((np.int64(_SSK_P) * counts - n) ** 2).sum())
    assert row["chi2_scaled"] == chi2s
    assert row["chi2"] == float(chi2s) / (float(_SSK_P) * float(n))

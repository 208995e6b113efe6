"""Thirteenth-wave operator unit tests: stopword induction, sliding
distinct users, Borda quality ensemble, postings delta+varint sizing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave13 import (
    q_borda_quality,
    q_events_sliding_distinct,
    q_postings_delta_size,
    q_stopword_induction,
)


def test_stopword_induction_hand_corpus(ray_session, tmp_path):
    # 3 en docs: "the" in all 3, "cat" in 2, "dog" in 1; 1 fr doc
    tbl = pa.table(
        {
            "lang": pa.array(["en", "en", "en", "fr"], pa.string()),
            "text": pa.array(
                [
                    "the cat sat",
                    "the cat ran the",  # dup 'the' in one doc counts once
                    "the dog",
                    "le chat",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q_stopword_induction(str(tmp_path)).to_pandas()
    en = out[out["lang"] == "en"].sort_values("rank")
    assert list(en["term"])[:2] == ["the", "cat"]
    assert list(en["df"])[:2] == [3, 2]
    # rank-1 per lang, ties broken by term asc
    fr = out[out["lang"] == "fr"].sort_values("rank")
    assert list(fr["term"]) == ["chat", "le"]  # df ties -> lexicographic
    assert list(fr["df"]) == [1, 1]
    assert list(fr["rank"]) == [1, 2]


def test_stopword_topk_bound(ray_session, sf_dir):
    out = q_stopword_induction(sf_dir).to_pandas()
    assert (out["rank"] <= 20).all()
    assert (out.groupby("lang")["rank"].max() <= 20).all()
    # within a lang, df non-increasing with rank
    for _, g in out.groupby("lang"):
        g = g.sort_values("rank")
        assert (np.diff(g["df"].to_numpy()) <= 0).all()


def test_sliding_distinct_hand_events(ray_session, tmp_path):
    # two events same user 10 min apart: union of their windows = 5
    # distinct window starts (4 + 4 overlapping by 3); a second user in
    # one window only
    ts = pa.array(
        [
            pd.Timestamp("2026-01-01 10:07:00"),
            pd.Timestamp("2026-01-01 10:17:00"),
            pd.Timestamp("2026-01-01 10:07:30"),
        ],
        pa.timestamp("us"),
    )
    tbl = pa.table(
        {
            "ts": ts,
            "user_id": pa.array([1, 1, 2], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = (
        q_events_sliding_distinct(str(tmp_path))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # user1 event1 windows start at 09:15..10:00 (4); event2 at 09:30..10:15
    assert len(out) == 5
    # the 3 overlapping windows (09:30,09:45,10:00) have both events but
    # one user; user2 shares user1's first-event windows exactly
    assert out["n_users"].tolist() == [2, 2, 2, 2, 1]


def test_borda_ranks_consistent(ray_session, sf_dir):
    out = q_borda_quality(sf_dir).to_pandas()
    assert len(out) == 50
    assert (out["borda"] == out["r_chars"] + out["r_tok"] + out["r_distinct"]).all()
    # output sorted by (borda, doc_id)
    b = out[["borda", "doc_id"]].to_numpy()
    assert all(tuple(b[i]) <= tuple(b[i + 1]) for i in range(len(b) - 1))
    # rank 1 exists for each signal somewhere in the corpus -> the top
    # doc's borda is at least 3
    assert out["borda"].iloc[0] >= 3


def test_postings_varint_sizes(ray_session, tmp_path):
    # term 'a' in docs 0 and 200: bytes = varint(0) + varint(200) = 1 + 2
    # term 'b' in doc 16384 only: varint(16384) = 3
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 200, 16384], pa.int64()),
            "text": pa.array(["a", "a", "b"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        q_postings_delta_size(str(tmp_path)).to_pandas().set_index("term")
    )
    assert out.loc["a", "df"] == 2 and out.loc["a", "index_bytes"] == 3
    assert out.loc["b", "df"] == 1 and out.loc["b", "index_bytes"] == 3


def test_postings_delta_beats_raw(ray_session, sf_dir):
    # delta coding never exceeds raw varint coding of absolute ids
    out = q_postings_delta_size(sf_dir).to_pandas()
    assert (out["index_bytes"] >= out["df"]).all()  # >=1 byte per posting
    assert (out["index_bytes"] <= out["df"] * 5).all()  # <=5 bytes each

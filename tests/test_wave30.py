"""Thirtieth-wave tests: Kneser-Ney smoothing, Good-Turing estimators,
F1 threshold sweep."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave30 import (
    q_f1_threshold_sweep,
    q_good_turing_vocab,
    q_kneser_ney_bigrams,
)


def test_kneser_ney_hand_case(ray_session, tmp_path):
    # corpus "a b", "a b", "c b": bigrams ab(2), cb(1)
    # c(a.)=2, N1+(a.)=1; c(c.)=1, N1+(c.)=1; N1+(.b)=2; types=2
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(["a b", "a b", "c b"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_kneser_ney_bigrams(str(tmp_path)).to_pandas()
    ab = df[(df["w1"] == "a") & (df["w2"] == "b")].iloc[0]
    # P(b|a) = (2-0.75)/2 + 0.75*1/2 * (2/2) = 1.25/2 + 0.375 = 1.0
    assert ab["kn_q"] == round(1.0 * 1e12)
    cb = df[(df["w1"] == "c") & (df["w2"] == "b")].iloc[0]
    # P(b|c) = (1-0.75)/1 + 0.75*1/1 * (2/2) = 0.25 + 0.75 = 1.0
    assert cb["kn_q"] == round(1.0 * 1e12)


def test_kneser_ney_probabilities_bounded(ray_session, sf_dir):
    df = q_kneser_ney_bigrams(sf_dir).to_pandas()
    assert len(df) == 50
    p = df["kn_q"].to_numpy() / 1e12
    assert (p > 0).all() and (p <= 1.0 + 1e-9).all()
    # counts sorted descending in the top list
    assert (np.diff(df.sort_values(["c"], ascending=False)["c"]) <= 0).all()


def test_good_turing_hand_case(ray_session, tmp_path):
    # tokens: a a a b b c d -> V=4, N=7, N1=2 (c,d), N2=1 (b)
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a a a b b c d"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = q_good_turing_vocab(str(tmp_path)).to_pandas().iloc[0]
    assert row["v_types"] == 4 and row["n_tokens"] == 7
    assert row["n1"] == 2 and row["n2"] == 1
    assert row["p_unseen"] == 2.0 / 7.0
    assert row["chao1"] == 4.0 + 4.0 / 2.0


def test_good_turing_closed_vocab(ray_session, sf_dir):
    row = q_good_turing_vocab(sf_dir).to_pandas().iloc[0]
    # the synthetic corpus reuses a tiny vocab: no singletons at 500 docs
    assert row["n1"] == 0
    assert row["p_unseen"] == 0.0
    assert row["chao1"] == float(row["v_types"])


def test_f1_sweep_structure(ray_session, sf_dir):
    df = q_f1_threshold_sweep(sf_dir).to_pandas().sort_values("threshold_q")
    assert df["best"].sum() == 1
    # recall is non-increasing in the threshold; tp+fn constant
    assert (np.diff(df["recall"]) <= 1e-12).all()
    assert df["tp"].add(df["fn"]).nunique() == 1
    assert ((df["f1"] >= 0) & (df["f1"] <= 1)).all()
    best = df[df["best"] == 1].iloc[0]
    assert best["f1"] == df["f1"].max()

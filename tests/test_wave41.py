"""Forty-first-wave tests: ROUGE, BLEU, NPMI coherence."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave41 import (
    q_bleu_pairs,
    q_rouge_pairs,
    q_term_coherence,
)


def test_rouge_prefix_summary_properties(ray_session, sf_dir):
    df = q_rouge_pairs(sf_dir).to_pandas()
    # the candidate is a PREFIX of the reference: precision is perfect,
    # so overlap == n_cand for every pair and order
    assert (df["overlap"] == df["n_cand"]).all()
    assert (df["overlap"] <= df["n_ref"]).all()
    assert ((df["f1"] > 0) & (df["f1"] <= 1)).all()
    # ROUGE-2 rows have one less candidate n-gram than ROUGE-1 rows
    g = df.pivot_table(index="doc_id", columns="n", values="n_cand")
    assert ((g[1] - g[2]) == 1).all()


def test_rouge_hand_case(ray_session, tmp_path):
    # doc 0: 20 tokens; summary = first 15 -> R1 f1 = 2*15/(15+20)
    toks = [f"w{i}" for i in range(20)]
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(toks)], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_rouge_pairs(str(tmp_path)).to_pandas()
    r1 = df[df["n"] == 1].iloc[0]
    assert r1["overlap"] == 15 and r1["n_ref"] == 20
    assert r1["f1"] == 2 * 15 / 35
    r2 = df[df["n"] == 2].iloc[0]
    assert r2["overlap"] == 14 and r2["n_ref"] == 19


def test_bleu_bounds_and_gaps(ray_session, sf_dir):
    df = q_bleu_pairs(sf_dir).to_pandas()
    bleu = df["bleu_q"].to_numpy() / 1e12
    assert ((bleu > 0) & (bleu <= 1)).all()
    # unigrams all survive (candidate tokens all appear in the ref)
    assert (df["ov1"] == df["n1"]).all()
    # dropping every 3rd token breaks SOME bigrams for most docs
    assert (df["ov2"] < df["n2"]).sum() > len(df) // 2
    assert (df["c_len"] < df["r_len"]).all()


def test_term_coherence_structure(ray_session, sf_dir):
    df = q_term_coherence(sf_dir).to_pandas()
    assert len(df) == 45  # C(10, 2)
    assert (df["term_a"] < df["term_b"]).all()
    assert (df["df_ab"] <= np.minimum(df["df_a"], df["df_b"])).all()
    npmi = df["npmi_q"].to_numpy() / 1e9
    assert ((npmi >= -1.0 - 1e-9) & (npmi <= 1.0 + 1e-9)).all()
    assert df["mean_npmi"].nunique() == 1

"""Thirty-sixth-wave tests: MaxSim retrieval, cascade rerank, prefix
completions."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave36 import (
    _CB_QUERY,
    _tok_vec,
    q_cascade_rerank,
    q_colbert_maxsim,
    q_prefix_completions,
)


def test_maxsim_exact_term_doc_wins(ray_session, tmp_path):
    # doc 0 contains all three query tokens -> its MaxSim is the
    # maximal possible (sum of self-dots); doc 1 contains none of them
    texts = ["table scan merge", "alpha beta gamma"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_colbert_maxsim(str(tmp_path)).to_pandas()
    best = df.sort_values("maxsim", ascending=False).iloc[0]
    assert int(best["doc_id"]) == 0
    self_dot = sum(int(_tok_vec(t) @ _tok_vec(t)) for t in _CB_QUERY)
    assert int(best["maxsim"]) == self_dot


def test_maxsim_topk_sorted(ray_session, sf_dir):
    df = q_colbert_maxsim(sf_dir).to_pandas()
    assert len(df) == 10
    m = df["maxsim"].tolist()
    assert all(m[i] >= m[i + 1] for i in range(len(m) - 1))


def test_cascade_rerank_is_permutation(ray_session, sf_dir):
    df = q_cascade_rerank(sf_dir).to_pandas()
    assert len(df) == 10
    assert sorted(df["bm25_rank"]) == list(range(1, 11))
    assert sorted(df["final_rank"]) == list(range(1, 11))
    # final rank ordered by maxsim desc
    s = df.sort_values("final_rank")
    assert (np.diff(s["maxsim"]) <= 0).all()


def test_prefix_completions_contains_tokens(ray_session, sf_dir):
    df = q_prefix_completions(sf_dir).to_pandas()
    # every completion starts with its prefix
    assert all(t.startswith(p) for p, t in zip(df["prefix"], df["token"]))
    assert df["rank"].between(1, 3).all()
    # within a prefix, counts are non-increasing by rank
    for _, g in df.groupby("prefix"):
        g = g.sort_values("rank")
        assert (np.diff(g["c"]) <= 0).all()
    # the 1-char prefixes of the vocab are all present
    assert (df["prefix"].str.len().isin([1, 2, 3])).all()

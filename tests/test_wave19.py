"""Nineteenth-wave operator unit tests: span-corruption planning,
shard mix entropy, embedding drift."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave19 import (
    _ED_SCALE,
    _SCM_BLOCK,
    _SCM_MIN,
    _SME_SHARDS,
    _scm_h,
    q_embedding_drift,
    q_shard_mix_entropy,
    q_span_corruption_masks,
)


def _write_docs(tmp_path, texts, sources=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources or ["s0"] * len(texts), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def test_span_masks_hand(ray_session, tmp_path):
    # doc 0: 20 tokens = 1 block -> 1 span of 2-4; doc 1: 3 tokens
    # (< min block) -> 0 spans; doc 2: empty -> NULL ratio
    _write_docs(tmp_path, [" ".join(f"t{i}" for i in range(20)), "a b c", ""])
    df = q_span_corruption_masks(str(tmp_path)).to_pandas().set_index("doc_id")
    r0 = df.loc[0]
    assert r0["n_spans"] == 1
    exp_len = 2 + _scm_h(0, 0, "len") % 3
    assert r0["n_masked"] == exp_len
    assert r0["mask_ratio"] == float(exp_len) / 20.0
    assert (df.loc[1, "n_spans"], df.loc[1, "n_masked"]) == (0, 0)
    assert np.isnan(df.loc[2, "mask_ratio"])


def test_span_masks_density(ray_session, sf_dir):
    df = q_span_corruption_masks(sf_dir).to_pandas()
    # corpus-level mask density ~15% (2-4 per 20); hard bounds 10-20%
    total = df["n_masked"].sum() / df["n_tokens"].sum()
    assert 0.08 <= total <= 0.22
    assert (df["n_masked"] <= df["n_tokens"]).all()
    assert (df["n_spans"] * 2 <= df["n_masked"]).all()
    assert (df["n_masked"] <= df["n_spans"] * 4).all()


def test_shard_mix_entropy_shape(ray_session, sf_dir):
    df = q_shard_mix_entropy(sf_dir).to_pandas()
    assert len(df) == _SME_SHARDS
    assert df["n_docs"].sum() == 500
    # entropy within [0, ln(n_sources)]
    ub = np.log(df["n_sources"].to_numpy(dtype=np.float64))
    assert (df["entropy"].to_numpy() >= -1e-12).all()
    assert (df["entropy"].to_numpy() <= ub + 1e-9).all()


def test_shard_mix_entropy_single_source(ray_session, tmp_path):
    _write_docs(tmp_path, [f"doc {i}" for i in range(64)], ["only"] * 64)
    df = q_shard_mix_entropy(str(tmp_path)).to_pandas()
    assert (df["n_sources"] == 1).all()
    assert (df["entropy"] == 0.0).all()  # deterministic one-source mix


def _write_emb(tmp_path, x, ids=None):
    tbl = pa.table(
        {
            "vec_id": pa.array(ids or range(len(x)), pa.int64()),
            "embedding": pa.array([row.tolist() for row in x]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))


def test_embedding_drift_identical_halves(ray_session, tmp_path):
    # even and odd ids carry the SAME vectors -> cosine of means ~1,
    # l2 of mean diff exactly 0 (integer numerator is exactly zero)
    base = np.arange(12, dtype=np.float32).reshape(4, 3) / 7.0
    x = np.repeat(base, 2, axis=0)  # ids 0,1 same row; 2,3 same row...
    _write_emb(tmp_path, x.astype(np.float32))
    row = q_embedding_drift(str(tmp_path)).to_pandas().iloc[0]
    assert (row["n_old"], row["n_new"]) == (4, 4)
    assert row["mean_l2sq"] == 0.0
    assert abs(row["mean_cosine"] - 1.0) < 1e-12


def test_embedding_drift_orthogonal_means(ray_session, tmp_path):
    # even ids along e0, odd along e1 -> mean cosine 0, l2 positive
    x = np.zeros((6, 2), np.float32)
    x[0::2, 0] = 1.0
    x[1::2, 1] = 1.0
    _write_emb(tmp_path, x)
    row = q_embedding_drift(str(tmp_path)).to_pandas().iloc[0]
    assert row["mean_cosine"] == 0.0
    assert row["mean_l2sq"] > 0
    # means are unit vectors apart: l2sq = 2 exactly at this quantization
    assert abs(row["mean_l2sq"] - 2.0) < 1e-9

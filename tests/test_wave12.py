"""Twelfth-wave operator unit tests: soft-dedup weights, host quality
shrinkage, parallel URL pair mining."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave12 import (
    _HQS_PRIOR,
    q_host_quality_shrunk,
    q_parallel_url_pairs,
    q_softdedup_weights,
)


def test_softdedup_rarity_bounds(ray_session, sf_dir):
    out = q_softdedup_weights(sf_dir).to_pandas()
    n_docs = len(pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]))
    assert len(out) == n_docs  # every doc has >=1 gram in this corpus
    # df >= 1 for every gram -> sum_df >= n_grams -> rarity <= ln(N);
    # df <= N -> sum_df <= n*N -> rarity >= 0
    assert (out["sum_df"] >= out["n_grams"]).all()
    assert (out["rarity"] >= -1e-12).all()
    assert (out["rarity"] <= math.log(n_docs) + 1e-12).all()


def test_softdedup_duplicate_docs_less_rare(ray_session, tmp_path):
    # two byte-identical docs + one unique doc: the dup pair's grams all
    # have df=2, the unique doc's df=1 -> strictly lower rarity for dups
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon zeta",
                    "one two three four five six seven",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        q_softdedup_weights(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "rarity"] == out.loc[1, "rarity"]
    assert out.loc[0, "rarity"] < out.loc[2, "rarity"]
    # unique doc: every gram df=1 -> rarity = ln(3)
    assert out.loc[2, "rarity"] == math.log(3.0)
    # dup docs: every gram df=2 -> rarity = ln(3/2)
    assert out.loc[0, "rarity"] == math.log(3.0 * 4.0 / 8.0)


def test_host_quality_shrunk_recompute(ray_session, sf_dir):
    out = q_host_quality_shrunk(sf_dir).to_pandas().set_index("host_id")
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    did = docs["doc_id"].to_numpy()
    host = np.where(did % 7 == 0, 0, did % 50)
    ntok = docs["text"].str.split().str.len().to_numpy()
    ref = pd.DataFrame({"h": host, "t": ntok}).groupby("h")["t"].agg(["count", "sum"])
    gmean = float(ntok.sum()) / float(len(did))
    k = _HQS_PRIOR
    assert sorted(out.index) == sorted(ref.index)
    for h, row in ref.iterrows():
        assert out.loc[h, "n_docs"] == row["count"]
        assert out.loc[h, "sum_tokens"] == row["sum"]
        shr = (float(row["sum"]) + float(k) * gmean) / float(row["count"] + k)
        assert out.loc[h, "shrunk_mean"] == shr
        # shrinkage stays between the raw mean and the global mean
        lo, hi = sorted([out.loc[h, "raw_mean"], gmean])
        assert lo - 1e-9 <= out.loc[h, "shrunk_mean"] <= hi + 1e-9


def test_host_quality_shrunk_big_host_trusts_data(ray_session, sf_dir):
    out = q_host_quality_shrunk(sf_dir).to_pandas()
    gmean = out["sum_tokens"].sum() / out["n_docs"].sum()
    # pull toward the prior is proportionally weaker for bigger hosts:
    # |shrunk-raw| = k/(n+k) * |gmean-raw|
    frac = (out["shrunk_mean"] - out["raw_mean"]).abs() / (
        (gmean - out["raw_mean"]).abs() + 1e-30
    )
    expect = _HQS_PRIOR / (out["n_docs"] + _HQS_PRIOR)
    assert np.allclose(frac, expect, rtol=1e-9)


def test_parallel_url_pairs_bruteforce_parity(ray_session, sf_dir):
    out = (
        q_parallel_url_pairs(sf_dir)
        .to_pandas()
        .sort_values(["host_id", "article", "lang_a", "lang_b"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    did = docs["doc_id"].to_numpy()
    docs["host_id"] = np.where(did % 7 == 0, 0, did % 50)
    docs["article"] = (did // 50) % 3
    reps = docs.groupby(["host_id", "article", "lang"], as_index=False)[
        "doc_id"
    ].min()
    m = reps.merge(reps, on=["host_id", "article"], suffixes=("_a", "_b"))
    m = m[m["lang_a"] < m["lang_b"]].rename(
        columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}
    )
    m = m[["host_id", "article", "lang_a", "lang_b", "doc_a", "doc_b"]]
    m = m.sort_values(["host_id", "article", "lang_a", "lang_b"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(out[m.columns], m, check_dtype=False)


def test_parallel_url_pairs_invariants(ray_session, sf_dir):
    out = q_parallel_url_pairs(sf_dir).to_pandas()
    assert len(out) > 0
    assert (out["lang_a"] < out["lang_b"]).all()
    # each doc really lives on the claimed (host, article)
    for col in ("doc_a", "doc_b"):
        d = out[col].to_numpy()
        host = np.where(d % 7 == 0, 0, d % 50)
        assert (host == out["host_id"].to_numpy()).all()
        assert (((d // 50) % 3) == out["article"].to_numpy()).all()
    # at most one pair per (host, article, lang_a, lang_b)
    assert not out.duplicated(["host_id", "article", "lang_a", "lang_b"]).any()

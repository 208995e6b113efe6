"""Fifteenth-wave operator unit tests: user survival hazard table,
Flesch readability, degree power-law MLE, minhash-LSH banding eval."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave15 import (
    _DPL_DMIN,
    _MLE_THRESHOLDS,
    q_degree_powerlaw_mle,
    q_minhash_lsh_eval,
    q_readability_flesch,
    q_user_survival,
)


def _write_events(tmp_path, rows):
    ts, uid = zip(*rows)
    tbl = pa.table(
        {
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array(list(uid), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


# ---------------------------------------------------------------------------
# user_survival
# ---------------------------------------------------------------------------

DAY = 86_400_000_000


def test_user_survival_hand_lifetimes(ray_session, tmp_path):
    # user 1: 0d, user 2: 2d, user 3: 2d, user 4: 5d (span in us)
    rows = [
        (0, 1),
        (0, 2), (2 * DAY + 7, 2),
        (10, 3), (2 * DAY + 11, 3),
        (5, 4), (5 * DAY + 5, 4),
    ]
    _write_events(tmp_path, rows)
    df = (
        q_user_survival(str(tmp_path))
        .to_pandas()
        .sort_values("days")
        .reset_index(drop=True)
    )
    assert list(df["days"]) == [0, 2, 5]
    assert list(df["n_deaths"]) == [1, 2, 1]
    assert list(df["n_at_risk"]) == [4, 3, 1]
    assert list(df["hazard"]) == [1.0 / 4.0, 2.0 / 3.0, 1.0 / 1.0]
    assert list(df["survival"]) == [4.0 / 4.0, 3.0 / 4.0, 1.0 / 4.0]


def test_user_survival_invariants(ray_session, sf_dir):
    df = q_user_survival(sf_dir).to_pandas().sort_values("days")
    # at-risk non-increasing with days; deaths sum to total
    assert (np.diff(df["n_at_risk"].to_numpy()) <= 0).all()
    assert df["n_deaths"].sum() == df["n_at_risk"].iloc[0]
    assert ((df["hazard"] > 0) & (df["hazard"] <= 1.0)).all()
    assert df["survival"].iloc[0] == 1.0


# ---------------------------------------------------------------------------
# readability_flesch
# ---------------------------------------------------------------------------


def test_flesch_hand_cases(ray_session, tmp_path):
    _write_docs(
        tmp_path,
        [
            "The cat sat. The dog ran!",  # 6 words, 2 sentences
            "",  # 0 words -> NULL score
            "strength",  # 1 word, 1 vowel group
        ],
    )
    df = q_readability_flesch(str(tmp_path)).to_pandas().set_index("doc_id")
    r0 = df.loc[0]
    assert (r0["n_words"], r0["n_sentences"]) == (6, 2)
    # vowel groups: the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
    assert r0["n_syllables"] == 6
    assert r0["flesch"] == 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert df.loc[1, "n_words"] == 0 and np.isnan(df.loc[1, "flesch"])
    r2 = df.loc[2]
    # 'strength': one vowel group 'e'; sentences clamp to 1
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 1)


def test_flesch_full_corpus_ranges(ray_session, sf_dir):
    df = q_readability_flesch(sf_dir).to_pandas()
    assert (df["n_syllables"] <= df["n_words"] * 10).all()
    assert df["flesch"].notna().all()  # synthetic docs are non-empty
    assert (df["n_sentences"] >= 1).all()


# ---------------------------------------------------------------------------
# degree_powerlaw_mle
# ---------------------------------------------------------------------------


def test_powerlaw_mle_brute_force(ray_session, tmp_path):
    n = 40
    _write_docs(tmp_path, [f"d{i}" for i in range(n)])
    # brute degrees of the synthetic undirected simple graph
    edges = set()
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            if s != d:
                edges.add((min(s, d), max(s, d)))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = [d for d in deg.values() if d >= _DPL_DMIN]
    s_q = sum(
        math.floor(math.log(float(d) / float(_DPL_DMIN)) * 1e9 + 0.5)
        for d in tail
    )
    alpha = 1.0 + float(len(tail)) / (float(s_q) / 1e9)
    row = q_degree_powerlaw_mle(str(tmp_path)).to_pandas().iloc[0]
    assert row["n_tail"] == len(tail)
    assert row["sum_q"] == s_q
    assert row["alpha"] == alpha
    assert row["sigma"] == (alpha - 1.0) / math.sqrt(float(len(tail)))


# ---------------------------------------------------------------------------
# minhash_lsh_eval
# ---------------------------------------------------------------------------


def test_lsh_eval_confusion_consistency(ray_session, sf_dir):
    df = q_minhash_lsh_eval(sf_dir).to_pandas().sort_values("j_threshold")
    assert list(df["j_threshold"]) == sorted(_MLE_THRESHOLDS)
    # same pair set at every threshold; candidates threshold-independent
    assert df["n_pairs"].nunique() == 1
    assert df["n_cand"].nunique() == 1
    # confusion identities
    assert (df["tp"] + df["fp"] == df["n_cand"]).all()
    assert (df["tp"] + df["fn"] == df["n_true"]).all()
    # n_true non-increasing as the threshold rises
    assert (np.diff(df["n_true"].to_numpy()) <= 0).all()
    # planted near-copies are VERY similar: recall at 0.5 should be high
    r = df.iloc[0]
    assert r["n_true"] > 0 and r["recall"] > 0.9


def test_lsh_eval_identical_docs_all_candidates(ray_session, tmp_path):
    # identical text minus first token -> J < 1 but sigs mostly agree;
    # use long docs so the drop-one-token shingle diff is tiny
    _write_docs(
        tmp_path,
        [" ".join(f"w{(i * j) % 23}" for j in range(60)) for i in range(1, 6)],
    )
    df = q_minhash_lsh_eval(str(tmp_path)).to_pandas()
    assert (df["n_pairs"] == 5).all()
    assert (df["n_cand"] <= 5).all() and (df["n_cand"] >= 0).all()
    assert (df["tp"] <= df["n_cand"]).all()

"""Sixtieth-wave tests: naive Bayes lang ID, Merkle root, Cochran Q."""

import hashlib

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave60 import (
    q_cochran_q,
    q_merkle_root,
    q_naive_bayes_langid,
)


def test_naive_bayes_confusion_shape_and_en_bias(ray_session, sf_dir):
    df = q_naive_bayes_langid(sf_dir).to_pandas()
    con = duckdb.connect()
    n_test = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        f" WHERE doc_id % 2 = 1"
    ).fetchone()[0]
    assert df["n"].sum() == n_test
    langs = set(
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT lang FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    assert set(df["true_lang"]) <= langs
    assert set(df["pred_lang"]) <= langs
    # the synthetic text is en-like vocabulary for EVERY metadata
    # lang, so predictions must be dominated by the majority class
    # (the confusion matrix MEASURES this gap — lang_confusion lesson)
    pred_counts = df.groupby("pred_lang")["n"].sum()
    assert pred_counts.idxmax() == "en"


def test_merkle_root_matches_brute_and_detects_change(
    ray_session, sf_dir
):
    row = q_merkle_root(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    level = [
        hashlib.md5(
            f"{d}|{hashlib.md5(t.encode()).hexdigest()}".encode()
        ).hexdigest()
        for d, t in zip(docs["doc_id"], docs["text"])
    ]
    assert row["n_leaves"] == len(level)

    def root_of(level):
        while len(level) > 1:
            nxt = []
            for i in range(0, len(level), 2):
                if i + 1 < len(level):
                    nxt.append(
                        hashlib.md5(
                            (level[i] + level[i + 1]).encode()
                        ).hexdigest()
                    )
                else:
                    nxt.append(level[i])
            level = nxt
        return level[0]

    assert row["root"] == root_of(list(level))
    # avalanche: flipping ONE leaf changes the root
    mutated = list(level)
    mutated[3] = hashlib.md5(b"tampered").hexdigest()
    assert root_of(mutated) != row["root"]


def test_cochran_q_pieces(ray_session, sf_dir):
    row = q_cochran_q(sf_dir).to_pandas().iloc[0]
    g1, g2, g3 = int(row["g1"]), int(row["g2"]), int(row["g3"])
    # sr is g1+g2+g3 by construction (same docs, summed flags)
    sr = g1 + g2 + g3
    assert row["q_num"] == 2 * (
        3 * (g1 * g1 + g2 * g2 + g3 * g3) - sr * sr
    )
    assert row["q"] == row["q_num"] / row["q_den"]
    # the three gates pass very different fractions here: Q large
    assert row["q"] > 10.0

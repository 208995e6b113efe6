"""Fiftieth-wave tests: PBM click model, PSI drift, k-anonymity."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave50 import (
    _KA_K,
    _KA_W,
    _PBM_POS,
    _PBM_QS,
    _PBM_WEEKS,
    _PSI_BUCKETS,
    q_k_anonymity,
    q_pbm_click_model,
    q_psi_drift,
)


def test_pbm_recovers_position_decay_and_tiers(ray_session, sf_dir):
    df = q_pbm_click_model(sf_dir).to_pandas()
    exam = df[df["kind"] == "exam"].sort_values("idx")
    rel = df[df["kind"] == "rel"].sort_values("idx")
    assert len(exam) == _PBM_POS and len(rel) == 2
    # impressions: every doc x week accounted for
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert exam["n_imp"].sum() == n * _PBM_WEEKS
    assert rel["n_imp"].sum() == n * _PBM_WEEKS
    # EM must recover the generative structure from clicks alone:
    # examination decays with position (check ends, noisy middle ok)
    ex = exam["v_q"].to_numpy()
    assert ex[0] > ex[-1]
    assert ex[0] > ex[4] > ex[-1]
    # tier 1 (true alpha 3/4) beats tier 0 (true alpha 1/4)
    rl = rel.set_index("idx")["v_q"]
    assert rl[1] > rl[0]
    # parameters stay inside (0, 1)
    assert ((df["v_q"] > 0) & (df["v_q"] <= _PBM_QS)).all()


def test_psi_contributions_nonneg_and_counts(ray_session, sf_dir):
    df = q_psi_drift(sf_dir).to_pandas()
    assert len(df) == _PSI_BUCKETS
    # (p-q)ln(p/q) >= 0 always; zero iff equal shares
    assert (df["contrib"] >= 0).all()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert df["c_a"].sum() + df["c_b"].sum() == n
    # smoothed shares each sum to 1
    assert abs(df["p_a"].sum() - 1.0) < 1e-9
    assert abs(df["p_b"].sum() - 1.0) < 1e-9


def test_k_anonymity_groups(ray_session, sf_dir):
    df = q_k_anonymity(sf_dir).to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, lang, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    docs["len_b"] = docs["n_chars"] // _KA_W
    brute = (
        docs.groupby(["source", "lang", "len_b"]).size().reset_index(name="n")
    )
    assert len(df) == len(brute)
    assert df["n"].sum() == len(docs)
    m = df.merge(brute, on=["source", "lang", "len_b"], suffixes=("", "_b"))
    assert (m["n"] == m["n_b"]).all()
    assert (df["risky"] == (df["n"] < _KA_K).astype(int)).all()
    # the audit must actually find risky classes on this corpus
    assert df["risky"].sum() > 0

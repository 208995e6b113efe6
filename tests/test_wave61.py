"""Sixty-first-wave tests: IPS de-biasing, zone maps, l-diversity."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave61 import (
    _IPS_Q,
    _LD_L,
    _LD_W,
    _ZM_B,
    _ZM_HI,
    _ZM_LO,
    q_ips_debias,
    q_l_diversity,
    q_zone_map_pruning,
)


def test_ips_recovers_tier_relevances(ray_session, sf_dir):
    df = q_ips_debias(sf_dir).to_pandas().set_index("tier")
    # true relevances: tier0 = 1/4, tier1 = 3/4 (wave50 generator)
    for tier, alpha in ((0, 0.25), (1, 0.75)):
        raw = df.loc[tier, "raw_ctr_q"] / _IPS_Q
        ips = df.loc[tier, "ips_q"] / _IPS_Q
        # raw CTR is crushed by the 1/p examination bias...
        assert raw < alpha * 0.6
        # ...while IPS lands near the truth
        assert abs(ips - alpha) < 0.12
    # ordering preserved by both, but IPS restores the SCALE
    assert df.loc[1, "ips_q"] > df.loc[0, "ips_q"]


def test_zone_map_sorted_prunes_more(ray_session, sf_dir):
    df = q_zone_map_pruning(sf_dir).to_pandas().set_index("layout")
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    v = docs["n_chars"].to_numpy(np.int64)
    n = len(v)
    # brute physical blocks
    pruned_p = 0
    nb_p = (n + _ZM_B - 1) // _ZM_B
    for b in range(nb_p):
        blk = v[
            (docs["doc_id"] // _ZM_B == b).to_numpy()
        ]
        if blk.max() < _ZM_LO or blk.min() > _ZM_HI:
            pruned_p += 1
    assert df.loc["physical", "pruned"] == pruned_p
    # brute sorted blocks
    sv = np.sort(v)
    pruned_s = 0
    nb_s = (n + _ZM_B - 1) // _ZM_B
    for b in range(nb_s):
        blk = sv[b * _ZM_B : (b + 1) * _ZM_B]
        if blk.max() < _ZM_LO or blk.min() > _ZM_HI:
            pruned_s += 1
    assert df.loc["sorted", "pruned"] == pruned_s
    # sorting a selective predicate's column prunes strictly more here
    assert df.loc["sorted", "pruned"] > df.loc["physical", "pruned"]
    # physical layout has interleaved values: nothing prunable
    assert df.loc["physical", "pruned_frac_q"] < df.loc[
        "sorted", "pruned_frac_q"
    ]


def test_l_diversity_matches_brute(ray_session, sf_dir):
    df = q_l_diversity(sf_dir).to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, lang, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    docs["len_b"] = docs["n_chars"] // _LD_W
    brute = docs.groupby(["source", "len_b"]).agg(
        n=("lang", "size"), n_langs=("lang", "nunique")
    ).reset_index()
    assert len(df) == len(brute)
    m = df.merge(brute, on=["source", "len_b"], suffixes=("", "_b"))
    assert (m["n"] == m["n_b"]).all()
    assert (m["n_langs"] == m["n_langs_b"]).all()
    assert (df["risky"] == (df["n_langs"] < _LD_L).astype(int)).all()
    # small classes are necessarily lang-poor: the audit fires
    assert df["risky"].sum() > 0
    # a class can be k-large yet l-risky (the reason l-diversity
    # exists): check at least one class with n >= 3 but < l langs
    assert ((df["n"] >= 3) & (df["risky"] == 1)).any()

"""Sixty-sixth-wave tests: Holm step-down, MI ranking, affinity."""

import hashlib

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave66 import (
    _AF_SHARDS,
    _HB_ALPHA_DEN,
    _HB_ALPHA_NUM,
    _mi_features,
    q_affinity_gain,
    q_holm_bonferroni,
    q_mi_feature_ranking,
)


def test_holm_stricter_than_bh(ray_session, sf_dir):
    from crawl4ai_ray.pipelines.queries_wave57 import q_bh_fdr

    holm = q_holm_bonferroni(sf_dir).to_pandas()
    bh = q_bh_fdr(sf_dir).to_pandas()
    # FWER control is never more powerful than FDR control on the
    # same p-values, and the Holm set is a prefix of the BH set
    assert len(holm) <= len(bh)
    assert list(holm["doc_id"]) == list(bh["doc_id"])[: len(holm)]
    # brute-force the step-down
    m = int(holm["m"].iloc[0]) if len(holm) else None
    if m:
        pv = []
        for d in range(m):
            h = int(
                hashlib.md5(f"bh|{d}".encode()).hexdigest()[:13], 16
            )
            pl = d % 97 == 0
            pv.append((h // 1024 if pl else h, d))
        pv.sort()
        kstop = 0
        for k, (u, _) in enumerate(pv, start=1):
            if u * _HB_ALPHA_DEN * (m - k + 1) <= _HB_ALPHA_NUM * (
                1 << 52
            ):
                kstop = k
            else:
                break
        assert len(holm) == kstop
    # the FWER-vs-FDR power gap is visible: Holm rejects strictly
    # fewer than BH on the same field
    assert len(holm) < len(bh)


def test_mi_ranking_picks_the_repetition_signal(ray_session, sf_dir):
    df = q_mi_feature_ranking(sf_dir).to_pandas()
    assert set(df["feat"]) == {"len_b", "types_b", "maxrun_b"}
    assert (df["mi_q"] >= 0).all()
    assert list(df["rank"]) == [1, 2, 3]
    # feature kernel sanity on a known string
    f = _mi_features("a a a b", 7)
    assert f["maxrun_b"] == 3
    # MI ordering is strict on this corpus (no degenerate ties)
    assert df["mi_q"].iloc[0] > df["mi_q"].iloc[-1]


def test_affinity_gain_dominates_random(ray_session, sf_dir):
    df = q_affinity_gain(sf_dir).to_pandas().set_index("scheme")
    # affine sharding co-locates every host's pages entirely
    assert df.loc["affine", "within_pairs"] == df.loc[
        "affine", "total_pairs"
    ]
    # random sharding keeps only ~1/S of same-host pairs together
    frac = df.loc["random", "frac_q"] / 1e6
    assert abs(frac - 1 / _AF_SHARDS) < 0.1
    assert (
        df.loc["affine", "within_pairs"]
        > df.loc["random", "within_pairs"]
    )

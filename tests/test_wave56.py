"""Fifty-sixth-wave tests: graph robustness, MAD outliers, RM3."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave56 import (
    _GR_K,
    _MAD_K,
    _RM3_SCALE,
    q_graph_robustness,
    q_mad_outliers,
    q_rm3_expansion,
)


def _brute_cc_sizes(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    return Counter(find(i) for i in range(n))


def test_graph_robustness_matches_union_find(ray_session, sf_dir):
    df = q_graph_robustness(sf_dir).to_pandas().set_index("scenario")
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    edges = set()
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            if s != d:
                edges.add((min(s, d), max(s, d)))
    sizes = _brute_cc_sizes(n, edges)
    assert df.loc["before", "n_nodes"] == n
    assert df.loc["before", "n_components"] == len(sizes)
    assert df.loc["before", "largest_cc"] == max(sizes.values())
    # attack: remove top-K degree nodes
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    removed = set(
        sorted(deg, key=lambda v: (-deg[v], v))[:_GR_K]
    )
    kept = [v for v in range(n) if v not in removed]
    remap = {v: i for i, v in enumerate(kept)}
    e2 = [
        (remap[a], remap[b])
        for a, b in edges
        if a not in removed and b not in removed
    ]
    sizes2 = _brute_cc_sizes(len(kept), e2)
    assert df.loc["after", "n_nodes"] == n - _GR_K
    assert df.loc["after", "n_components"] == len(sizes2)
    assert df.loc["after", "largest_cc"] == max(sizes2.values())


def test_mad_outliers_breakdown_resistance(ray_session, sf_dir):
    df = q_mad_outliers(sf_dir).to_pandas()
    xs = sorted(df["n"])
    k = (len(xs) + 1) // 2
    med = xs[k - 1]
    mad = sorted(abs(x - med) for x in df["n"])[k - 1]
    assert (df["med"] == med).all() and (df["mad"] == mad).all()
    assert (df["outlier"] == (df["dev"] > _MAD_K * mad).astype(int)).all()
    # the heavy-hitter host (site0, ~16% of pages) must be flagged,
    # and it carries the maximal deviation (breakdown resistance: its
    # own mass cannot pull the median/MAD toward itself)
    s0 = df.loc[df["host"] == "site0.example.com"].iloc[0]
    assert s0["outlier"] == 1
    assert s0["dev"] == df["dev"].max()
    # the median reflects the majority of hosts, not the heavy hitter
    assert med < s0["n"]


def test_rm3_excludes_query_terms_and_is_integer_exact(
    ray_session, sf_dir
):
    from crawl4ai_ray.pipelines.queries_wave55 import (
        _QLD_TERMS,
        q_qld_topk,
    )

    df = q_rm3_expansion(sf_dir).to_pandas()
    assert len(df) == 10
    assert not set(df["term"]) & set(_QLD_TERMS)
    assert list(df["rank"]) == list(range(1, 11))
    # brute recompute from the QLD top-10
    top = q_qld_topk(sf_dir).to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf().set_index("doc_id")
    scores: dict = {}
    for _, r in top.iterrows():
        toks = docs.loc[int(r["doc_id"]), "text"].lower().split()
        dl, rk = len(toks), int(r["rank"])
        from collections import Counter

        for w, tf in Counter(toks).items():
            if w in _QLD_TERMS:
                continue
            scores[w] = scores.get(w, 0) + tf * _RM3_SCALE // (dl * rk)
    order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(df["term"]) == [t for t, _ in order]
    assert list(df["weight_q"]) == [w for _, w in order]

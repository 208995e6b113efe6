"""Fifty-eighth-wave tests: LTM cascade, Shapley gates, RLE runs."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave58 import (
    _LTM_ROUNDS,
    _LTM_SEEDS,
    _RLE_W,
    _ltm_theta,
    q_cascade_ltm,
    q_rle_runs,
    q_shapley_gates,
)


def test_cascade_matches_brute_simulation(ray_session, sf_dir):
    df = q_cascade_ltm(sf_dir).to_pandas().set_index("node")
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    adj = {v: set() for v in range(n)}
    from collections import Counter

    deg = Counter()
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            if s != d and d not in adj[s]:
                adj[s].add(d)
                adj[d].add(s)
    for v in range(n):
        deg[v] = len(adj[v])
    seeds = sorted(range(n), key=lambda v: (-deg[v], v))[:_LTM_SEEDS]
    active = {s: 0 for s in seeds}
    for rnd in range(1, _LTM_ROUNDS + 1):
        newly = []
        for v in range(n):
            if v in active:
                continue
            c = sum(1 for u in adj[v] if u in active)
            if c >= _ltm_theta(v):
                newly.append(v)
        for v in newly:
            active[v] = rnd
    for v in range(n):
        assert df.loc[v, "round"] == active.get(v, -1)
        assert df.loc[v, "theta"] == _ltm_theta(v)
    # seeds activate the cascade beyond themselves
    assert (df["round"] > 0).sum() > 0
    # monotone horizon: activations only at rounds 0..R
    assert df["round"].max() <= _LTM_ROUNDS


def test_shapley_efficiency_identity(ray_session, sf_dir):
    df = q_shapley_gates(sf_dir).to_pandas()
    n = int(df["n"].iloc[0])
    k123 = int(df["all_pass"].iloc[0])
    # efficiency: Shapley values sum exactly to v(full) - v(empty)
    assert df["phi6"].sum() == 6 * (k123 - n)
    # gates only remove documents: every phi is non-positive
    assert (df["phi6"] <= 0).all()
    # a gate passing everything would have phi 0; each real gate
    # removes something here
    assert (df["phi6"] < 0).all()


def test_rle_runs_sorted_never_worse(ray_session, sf_dir):
    df = q_rle_runs(sf_dir).to_pandas().set_index("layout")
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, lang, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    keys = [
        f"{s}|{l}|{c // _RLE_W}"
        for s, l, c in zip(docs["source"], docs["lang"], docs["n_chars"])
    ]
    runs_phys = 1 + sum(
        1 for i in range(1, len(keys)) if keys[i] != keys[i - 1]
    )
    assert df.loc["physical", "runs"] == runs_phys
    assert df.loc["sorted", "runs"] == len(set(keys))
    # sorting can never increase the run count
    assert df.loc["sorted", "runs"] <= df.loc["physical", "runs"]
    assert (df["n"] == len(keys)).all()

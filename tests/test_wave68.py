"""Sixty-eighth-wave tests: SALSA, Markov stationary, Hoover index."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave68 import (
    _MS_Q,
    _SALSA_ROUNDS,
    _W68_Q,
    q_hoover_index,
    q_markov_stationary,
    q_salsa_scores,
)


def test_salsa_mass_and_degree_bias(ray_session, sf_dir):
    df = q_salsa_scores(sf_dir).to_pandas()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n
    # integer floors only LOSE mass: total auth/hub <= initial mass
    assert df["auth_q"].sum() <= n * _W68_Q
    assert df["hub_q"].sum() <= n * _W68_Q
    # ...but not much of it (the walk is mass-preserving up to floors)
    assert df["auth_q"].sum() > 0.999 * n * _W68_Q
    # SALSA authority converges toward indegree/total: the correlation
    # with indegree must be strongly positive
    edges = set()
    for s in range(n):
        if s >= 1:
            edges.add((s, s // 2))
        edges.add((s, (s * s + 1) % n))
    deg = np.zeros(n, np.int64)
    for _, d in edges:
        deg[d] += 1
    a = df.sort_values("node")["auth_q"].to_numpy(np.float64)
    if deg.std() == 0:
        # the synthetic graph is indegree-regular (the documented
        # degenerate-graph trap): SALSA's fixpoint is then uniform —
        # authorities must be tightly clustered around the mean
        assert a.std() / a.mean() < 0.2
    else:
        r = np.corrcoef(a, deg.astype(np.float64))[0, 1]
        assert r > 0.7


def test_markov_stationary_sums_and_dominance(ray_session, sf_dir):
    df = q_markov_stationary(sf_dir).to_pandas()
    # pi is a (quantized) distribution
    s = df["pi_q"].sum()
    assert abs(s - _MS_Q) < len(df) * 10  # floor slack only
    assert (df["pi_q"] > 0).all()
    # on this near-uniform synthetic chain, pi tracks the incoming
    # transition shares closely
    inc = df["incoming"].to_numpy(np.float64)
    inc = inc / inc.sum()
    pi = df["pi_q"].to_numpy(np.float64) / df["pi_q"].sum()
    assert np.abs(inc - pi).max() < 0.02


def test_hoover_matches_brute_and_bounds(ray_session, sf_dir):
    row = q_hoover_index(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    from collections import Counter

    c = Counter(
        0 if d % 7 == 0 else d % 50 for d in range(n)
    )
    m = len(c)
    num = sum(abs(v * m - n) for v in c.values())
    assert row["n_hosts"] == m and row["n_pages"] == n
    assert row["abs_num"] == num
    assert row["hoover_q"] == num * 10**6 // (2 * n * m)
    # 0 <= Hoover < 1; the heavy-hitter host forces it well above 0
    assert 0 < row["hoover_q"] < 10**6
    assert row["hoover_q"] > 50_000  # site0 ~16% of a 2% fair share

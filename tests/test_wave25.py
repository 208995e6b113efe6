"""Twenty-fifth-wave tests: sampled harmonic centrality, UCB1 crawl
scheduling, per-source percent rank."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave25 import (
    _HC_SEEDS,
    _UCB_ROUNDS,
    q_harmonic_centrality,
    q_source_percent_rank,
    q_ucb_crawl_sched,
)


def _brute_harmonic(n):
    """Brute-force per-seed BFS over the synthetic edge rule."""
    adj = [[] for _ in range(n)]
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            adj[s].append(d)
    out = {}
    for seed in _HC_SEEDS:
        dist = {seed: 0}
        frontier = [seed]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        for v, d in dist.items():
            if d >= 1:
                nq, hq = out.get(v, (0, 0))
                out[v] = (nq + 1, hq + 1_000_000_000 // d)
    return out


def test_harmonic_centrality_brute_force(ray_session, tmp_path):
    n = 37
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_harmonic_centrality(str(tmp_path)).to_pandas()
    got = {
        int(r.node): (int(r.n_seeds), int(r.harmonic_q))
        for r in df.itertuples()
    }
    assert got == _brute_harmonic(n)


def test_ucb_trajectory_properties(ray_session, sf_dir):
    df = q_ucb_crawl_sched(sf_dir).to_pandas()
    assert len(df) == _UCB_ROUNDS
    assert list(df.sort_values("t")["t"]) == list(range(_UCB_ROUNDS))
    arms = sorted(df["source"].unique())
    # initialization phase pulls every arm once, lexicographic order
    init = df.sort_values("t").head(len(arms))["source"].tolist()
    assert init == arms
    # deterministic: a second run gives the identical trajectory
    df2 = q_ucb_crawl_sched(sf_dir).to_pandas()
    assert df.sort_values("t")["source"].tolist() == df2.sort_values("t")[
        "source"
    ].tolist()
    assert df["reward"].isin([0, 1]).all()


def test_source_percent_rank_hand(ray_session, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "source": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "n_chars": pa.array([30, 10, 20, 7, 5], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_source_percent_rank(str(tmp_path)).to_pandas()
    pr = dict(zip(df["doc_id"], df["pr"]))
    assert pr[1] == 0.0 and pr[2] == 0.5 and pr[0] == 1.0
    assert pr[4] == 0.0 and pr[3] == 1.0


def test_source_percent_rank_bounds(ray_session, sf_dir):
    df = q_source_percent_rank(sf_dir).to_pandas()
    assert len(df) == 500
    g = df.groupby("source")["pr"]
    assert (g.min() == 0.0).all()
    assert (g.max() == 1.0).all()

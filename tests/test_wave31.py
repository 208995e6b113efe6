"""Thirty-first-wave tests: k-truss, onion layers, rich club."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave31 import (
    q_ktruss_edges,
    q_onion_layers,
    q_rich_club,
)


def _brute_truss(n, k):
    ids = np.arange(n)
    src = np.concatenate([ids, ids, ids])
    dst = np.concatenate([(2 * ids + 1) % n, (2 * ids + 2) % n, (7 * ids + 3) % n])
    m = src != dst
    E = set(
        zip(
            np.minimum(src[m], dst[m]).tolist(),
            np.maximum(src[m], dst[m]).tolist(),
        )
    )
    while True:
        adj = {}
        for x, y in E:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        supp = {e: len(adj[e[0]] & adj[e[1]]) for e in E}
        drop = {e for e, s in supp.items() if s < k - 2}
        if not drop:
            return {e: s for e, s in supp.items()}
        E -= drop


def test_ktruss_brute_force(ray_session, sf_dir):
    df = q_ktruss_edges(sf_dir).to_pandas()
    got = {(int(r.a), int(r.b)): int(r.support) for r in df.itertuples()}
    assert got == _brute_truss(500, 3)
    assert len(got) == 65
    assert all(s >= 1 for s in got.values())


def test_onion_layers_structure(ray_session, sf_dir):
    df = q_onion_layers(sf_dir).to_pandas()
    # core nodes (layer 0) are exactly the kcore survivors; peel layers
    # 1..R partition the rest of the edge-incident nodes
    assert (df["layer"] >= 0).all()
    assert (df["layer"] == 0).sum() > 0
    assert (df["layer"] >= 1).sum() > 0
    # layers are contiguous from 1
    peel = sorted(df[df["layer"] > 0]["layer"].unique())
    assert peel == list(range(1, len(peel) + 1))


def test_onion_core_matches_kcore(ray_session, sf_dir):
    from crawl4ai_ray.pipelines.queries_wave8 import q_kcore

    onion = q_onion_layers(sf_dir).to_pandas()
    core_nodes = set(onion[onion["layer"] == 0]["node"])
    kc = q_kcore(sf_dir).to_pandas()
    assert core_nodes == set(kc["node"])


def test_rich_club_monotone_n(ray_session, sf_dir):
    df = q_rich_club(sf_dir).to_pandas().sort_values("k")
    # N_k and E_k are non-increasing in k
    assert (np.diff(df["n_k"]) <= 0).all()
    assert (np.diff(df["e_k"]) <= 0).all()
    assert ((df["phi"] >= 0) & (df["phi"] <= 1.0 + 1e-9)).all()
    # k=0 row covers every node with degree >= 1
    assert df.iloc[0]["k"] == 0

"""Property tests for the kernels rewritten/added in round 4 — random
inputs vs scalar brute-force references, locking the Arrow-native and
distributed forms against regressions beyond their oracle fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    n_users=st.integers(2, 8),
    n_events=st.integers(1, 60),
    gap_min=st.integers(1, 40),
    seed=st.integers(0, 10_000),
)
def test_sessionize_matches_brute_force(ray_session, n_users, n_events, gap_min, seed):
    """The pyarrow-kernel sessionize (r4 conversion) against a pure-python
    per-user walk: identical session indices for random event streams
    with duplicate timestamps and unordered input."""
    from crawl4ai_ray.stages.windows import sessionize

    rng = np.random.RandomState(seed)
    uid = rng.randint(0, n_users, n_events).astype(np.int64)
    ts_us = rng.randint(0, 3_000_000_000, n_events).astype(np.int64) * 1000
    eid = rng.permutation(n_events).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            }
        )
    ).repartition(3)
    got = {
        int(r["event_id"]): (int(r["user_id"]), int(r["session_idx"]))
        for r in sessionize(ds, gap_minutes=gap_min).take_all()
    }

    # brute force: per user, sort (ts, event_id), break on gap > gap_min
    gap_us = gap_min * 60_000_000
    want = {}
    for u in set(uid.tolist()):
        rows = sorted(
            [(int(t), int(e)) for t, e, uu in zip(ts_us, eid, uid) if uu == u]
        )
        sidx = 0
        prev = None
        for t, e in rows:
            if prev is None or t - prev > gap_us:
                sidx += 1
            want[e] = (u, sidx)
            prev = t
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(2, 14),
    m=st.integers(1, 30),
    rounds=st.integers(1, 4),
    seed=st.integers(0, 10_000),
)
def test_salsa_matches_brute_force(ray_session, n, m, rounds, seed):
    """Distributed-and-local SALSA against a scalar push loop on random
    digraphs (duplicate-free), q small enough that floor losses bite."""
    from crawl4ai_ray.stages.graph import salsa

    rng = np.random.RandomState(seed)
    edges = {(int(a), int(b)) for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m))}
    src = sorted(edges)
    q = 1000
    # scalar reference
    h = {v: q for v in range(n)}
    a = {v: 0 for v in range(n)}
    od = {}
    idg = {}
    for s, d in src:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    for _ in range(rounds):
        a = {v: 0 for v in range(n)}
        for s, d in src:
            a[d] += h[s] // od[s]
        h = {v: 0 for v in range(n)}
        for s, d in src:
            h[s] += a[d] // idg[d]

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    )
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in src], pa.int64()),
                "dst": pa.array([d for _, d in src], pa.int64()),
            }
        )
    )
    for small in (10**6, 0):  # local fast path AND distributed path
        if not src and small == 0:
            continue  # edgeless distributed graph: nothing to exercise
        got = {
            int(r["node"]): (int(r["auth_q"]), int(r["hub_q"]))
            for r in salsa(nodes, eds, n_iters=rounds, q=q,
                           small_threshold=small).take_all()
        }
        assert got == {v: (a[v], h[v]) for v in range(n)}, f"small={small}"


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(2, 12),
    m=st.integers(1, 25),
    rounds=st.integers(1, 5),
    seed=st.integers(0, 10_000),
)
def test_bounded_sssp_matches_brute_force(ray_session, n, m, rounds, seed):
    """bounded_sssp (both paths) against a scalar synchronous
    Bellman-Ford with the same fixed horizon on random weighted
    digraphs."""
    from crawl4ai_ray.stages.graph import bounded_sssp

    rng = np.random.RandomState(seed)
    eset = {
        (int(a), int(b)): int(w)
        for a, b, w in zip(
            rng.randint(0, n, m), rng.randint(0, n, m), rng.randint(1, 10, m)
        )
    }
    INF = 1 << 40
    d = {v: INF for v in range(n)}
    d[0] = 0
    for _ in range(rounds):
        nd = dict(d)
        for (s, t), w in eset.items():
            if d[s] < INF and d[s] + w < nd[t]:
                nd[t] = min(nd[t], d[s] + w)
        # synchronous: all relaxations read the PREVIOUS round's d
        for (s, t), w in eset.items():
            if d[s] < INF:
                nd[t] = min(nd[t], d[s] + w)
        d = nd
    want = {v: (d[v] if d[v] < INF else -1) for v in range(n)}

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    )
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in eset], pa.int64()),
                "dst": pa.array([t for _, t in eset], pa.int64()),
                "w": pa.array(list(eset.values()), pa.int64()),
            }
        )
    )
    for small in (10**6, 0):
        got = {
            int(r["node"]): int(r["dist"])
            for r in bounded_sssp(nodes, eds, source=0, rounds=rounds,
                                  small_threshold=small).take_all()
        }
        assert got == want, f"small={small}"


@settings(max_examples=10, deadline=None)
@given(
    nkeys=st.integers(1, 24),
    levels=st.integers(5, 8),
    seed=st.integers(0, 10_000),
)
def test_merkle_root_matches_brute_force(ray_session, nkeys, levels, seed):
    """merkle_root (both paths) against a scalar fold over random sparse
    key sets — key order, odd promotions and level count all exercised."""
    import hashlib as hl

    from crawl4ai_ray.stages.merkle import merkle_root

    rng = np.random.RandomState(seed)
    keys = sorted(set(rng.randint(0, 10_000, nkeys).tolist()))
    hashes = {k: hl.md5(f"leaf{k}".encode()).hexdigest() for k in keys}
    lv = [hashes[k] for k in keys]
    for _ in range(levels):
        lv = [
            hl.md5((lv[i] + lv[i + 1]).encode()).hexdigest()
            if i + 1 < len(lv) else lv[i]
            for i in range(0, len(lv), 2)
        ]
    want = (len(keys), lv[0])

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(keys, pa.int64()),
                "h": pa.array([hashes[k] for k in keys], pa.string()),
            }
        )
    ).repartition(3)
    assert merkle_root(ds, levels=levels) == want
    assert merkle_root(ds, levels=levels, small_threshold=0,
                       num_partitions=3) == want


@settings(max_examples=12, deadline=None)
@given(
    nrows=st.integers(1, 60),
    nkeys=st.integers(1, 9),
    seed=st.integers(0, 10_000),
)
def test_bucketed_lookup_join_random(ray_session, nrows, nkeys, seed):
    """bucketed_lookup_join on random probe multisets: every probe row
    keeps its payload and gains exactly its key's value."""
    from crawl4ai_ray.stages.agg import bucketed_lookup_join

    rng = np.random.RandomState(seed)
    keys = [f"k{i}" for i in range(nkeys)]
    probe_keys = [keys[i] for i in rng.randint(0, nkeys, nrows)]
    rows = ray.data.from_arrow(
        pa.table(
            {
                "w": pa.array(probe_keys, pa.string()),
                "payload": pa.array(np.arange(nrows, dtype=np.int64)),
            }
        )
    ).repartition(4)
    lk = ray.data.from_arrow(
        pa.table(
            {
                "w": pa.array(keys, pa.string()),
                "val": pa.array([hash(k) % 997 for k in keys], pa.int64()),
            }
        )
    )
    out = bucketed_lookup_join(rows, lk, key="w", value_col="val").take_all()
    assert len(out) == nrows
    vmap = {k: hash(k) % 997 for k in keys}
    seen_payloads = set()
    for r in out:
        assert int(r["val"]) == vmap[r["w"]]
        seen_payloads.add(int(r["payload"]))
    assert seen_payloads == set(range(nrows))  # no row lost or duplicated


@settings(max_examples=10, deadline=None)
@given(
    ndocs=st.integers(1, 30),
    vocab_k=st.integers(1, 12),
    seed=st.integers(0, 10_000),
)
def test_lm_vocab_selection_random(ray_session, ndocs, vocab_k, seed):
    """The distributed exact top-k vocab selection (r4 rewrite) against a
    scalar Counter on random corpora — tie-breaks (count desc, token asc)
    and totals must match for any vocab_k, including k > |vocab|."""
    from collections import Counter

    from crawl4ai_ray.stages.lmscore import _select_vocab, token_counts

    rng = np.random.RandomState(seed)
    words = [f"w{i:02d}" for i in range(15)]
    docs = [
        {
            "doc_id": i,
            "text": " ".join(words[j] for j in rng.randint(0, 15, rng.randint(0, 12))),
        }
        for i in range(ndocs)
    ]
    truth = Counter()
    for d in docs:
        truth.update(d["text"].split())
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]

    ds = ray.data.from_items(docs).repartition(3)
    kept, n_total, v_distinct = _select_vocab(token_counts(ds), vocab_k)
    assert kept == expect
    assert n_total == sum(truth.values())
    assert v_distinct == len(truth)

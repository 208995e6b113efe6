"""Ninth-wave operator tests: hand-computed parity on tiny inputs."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from crawl4ai_ray.pipelines.queries_wave9 import (
    q_assoc_rules,
    q_cocitation_pairs,
    q_token_entropy,
)


def _write_docs(tmp_path, ids, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["src0"] * len(ids), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_token_entropy_hand_cases(ray_session, tmp_path):
    """Uniform distribution -> ln(k); single repeated token -> 0;
    mixed case matches the scalar formula with fixed-point quantization."""
    sf = _write_docs(
        tmp_path,
        [0, 1, 2],
        ["a b c d", "x x x x", "a a b"],
    )
    rows = {r["doc_id"]: r for r in q_token_entropy(sf).take_all()}

    # doc 0: 4 distinct, each c=1 -> acc=0 -> H = ln 4
    assert rows[0]["n_tok"] == 4 and rows[0]["n_types"] == 4
    assert rows[0]["entropy"] == math.log(4.0)
    # doc 1: one token c=4 -> H = ln 4 - (4 ln 4)/4 = 0 (exactly, via fp)
    acc = math.floor(4.0 * math.log(4.0) * 1e9 + 0.5)
    assert rows[1]["entropy"] == math.log(4.0) - acc / 1e9 / 4.0
    assert abs(rows[1]["entropy"]) < 1e-9
    # doc 2: c = {a:2, b:1} -> acc = fp(2 ln 2); H = ln 3 - acc/1e9/3
    acc2 = math.floor(2.0 * math.log(2.0) * 1e9 + 0.5)
    assert rows[2]["entropy"] == math.log(3.0) - acc2 / 1e9 / 3.0


def test_assoc_rules_hand_baskets(ray_session, tmp_path):
    """25 baskets {A,B}, 25 baskets {A}: rule A->B has conf 25/50,
    B->A conf 1.0, lift = 50*25/(50*25) = 1.0 vs 2.0."""
    users, days, types = [], [], []
    ts_base = 1_700_000_000_000_000  # us
    day_us = 86_400_000_000
    for u in range(50):
        users.append(u), days.append(u), types.append("A")
        if u < 25:
            users.append(u), days.append(u), types.append("B")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(users)), pa.int64()),
                "ts": pa.array(
                    [ts_base + d * day_us for d in days], pa.timestamp("us")
                ),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array([1.0] * len(users), pa.float64()),
                "props": pa.array(["{}"] * len(users), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in q_assoc_rules(str(tmp_path)).take_all()
    }
    ab, ba = rows[("A", "B")], rows[("B", "A")]
    assert ab["n_xy"] == 25 and ab["n_x"] == 50 and ab["n_y"] == 25
    assert ab["n_baskets"] == 50
    assert ab["confidence"] == 0.5 and ba["confidence"] == 1.0
    assert ab["lift"] == 1.0 and ba["lift"] == 1.0
    assert ab["support"] == 0.5


def test_cocitation_pairs_bruteforce_parity(ray_session, tmp_path):
    """The query's output over a small corpus equals a brute-force
    recomputation of co-citation/coupling from the same edge formula."""
    n = 40
    sf = _write_docs(tmp_path, list(range(n)), ["w"] * n)
    got = {
        (r["a"], r["b"]): (r["cocitation"], r["coupling"])
        for r in q_cocitation_pairs(sf).take_all()
    }

    edges = set()
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            if s != d:
                edges.add((s, d))
    from collections import defaultdict

    outs, ins = defaultdict(set), defaultdict(set)
    for s, d in edges:
        outs[s].add(d)
        ins[d].add(s)
    want = defaultdict(lambda: [0, 0])
    for s in outs:  # co-citation: pairs of dsts sharing citing page s
        nb = sorted(outs[s])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                want[(nb[i], nb[j])][0] += 1
    for d in ins:  # coupling: pairs of srcs citing the same d
        nb = sorted(ins[d])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                want[(nb[i], nb[j])][1] += 1
    assert got == {k: tuple(v) for k, v in want.items()}

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


def _brute_lpa_modularity(n):
    """Independent python recomputation: seeded LPA (4 sweeps, majority
    vote over in-neighbors, ties -> smallest label, seeds clamped) then
    per-community modularity terms over the undirected simple graph."""
    from collections import Counter, defaultdict

    edges = set()
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            edges.add((s, d))
    lab = {i: (i if i < 5 else None) for i in range(n)}
    for _ in range(4):
        votes = defaultdict(Counter)
        for s, d in edges:
            if lab[s] is not None:
                votes[d][lab[s]] += 1
        new = dict(lab)
        for node, cnt in votes.items():
            if node < 5:
                continue
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[node] = best
        lab = new
    labeled = {k: v for k, v in lab.items() if v is not None}
    ue = {
        (min(s, d), max(s, d))
        for s, d in edges
        if s != d and s in labeled and d in labeled
    }
    m = len(ue)
    l_c, d_c, n_nodes = Counter(), Counter(), Counter(labeled.values())
    for a, b in ue:
        d_c[labeled[a]] += 1
        d_c[labeled[b]] += 1
        if labeled[a] == labeled[b]:
            l_c[labeled[a]] += 1
    out = {}
    for c in n_nodes:
        q_num = 4 * m * l_c[c] - d_c[c] * d_c[c]
        out[c] = (n_nodes[c], l_c[c], d_c[c], q_num, q_num / float(4 * m * m))
    return out


def test_community_modularity_bruteforce_parity(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.queries_wave9 import q_community_modularity

    n = 60
    sf = _write_docs(tmp_path, list(range(n)), ["w"] * n)
    got = {
        r["community"]: (
            r["n_nodes"],
            r["l_c"],
            r["d_c"],
            r["q_num"],
            r["q_term"],
        )
        for r in q_community_modularity(sf).take_all()
    }
    assert got == _brute_lpa_modularity(n)


def test_hard_negatives_nearest_other_label_and_ties(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.queries_wave9 import q_hard_negatives

    # query = vec 0 (label 0). vec 1 shares its label (excluded even though
    # nearest); vecs 2 and 3 are equidistant with label 1 -> lowest id wins.
    vecs = [
        [0.0, 0.0],   # 0: query, label 0
        [0.1, 0.0],   # 1: label 0 (nearest but same label)
        [1.0, 0.0],   # 2: label 1
        [-1.0, 0.0],  # 3: label 1 (same distance as 2)
        [5.0, 5.0],   # 4: label 2 (far)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(5), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0, 0, 1, 1, 2], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = q_hard_negatives(str(tmp_path)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["query_id"] == 0 and r["query_label"] == 0
    assert r["neg_id"] == 2 and r["neg_label"] == 1
    assert r["dist_fp"] == (1 << 20) ** 2


def test_containment_stage_catches_truncation_jaccard_misses(ray_session):
    """A 10-token prefix of a 20-token doc: containment 1.0 (caught),
    Jaccard = 8/18 (far below 0.8 — the symmetric metric misses it)."""
    from crawl4ai_ray.stages.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    base = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [base, " ".join(base.split()[:10]), "z0 z1 z2 z3 z4"],
                    pa.string(),
                ),
            }
        )
    )
    got = {(r["a"], r["b"]): r for r in ngram_containment_pairs(docs, tau=0.8).take_all()}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert r["inter"] == 8 and r["sa"] == 18 and r["sb"] == 8
    assert r["containment"] == 1.0
    assert ngram_jaccard_pairs(docs, tau=0.8).take_all() == []


def test_random_walks_bruteforce_parity(ray_session, tmp_path):
    import hashlib

    from crawl4ai_ray.pipelines.queries_wave9 import q_random_walks

    n = 120  # seeds 0 and 97
    sf = _write_docs(tmp_path, list(range(n)), ["w"] * n)
    got = {
        (r["walk_id"], r["step"]): r["node"]
        for r in q_random_walks(sf).take_all()
    }

    adj = {}
    for s in range(n):
        for d in {(2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n}:
            if s != d:
                adj.setdefault(s, set()).add(d)
    want = {}
    for wid in (0, 97):
        node = wid
        want[(wid, 0)] = node
        for i in range(4):
            node = min(
                adj[node],
                key=lambda d: (
                    hashlib.md5(f"{wid}|{i}|{d}".encode()).hexdigest(),
                    d,
                ),
            )
            want[(wid, i + 1)] = node
    assert got == want


def test_vocab_growth_hand_positions(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.queries_wave9 import q_vocab_growth

    # doc0 tokens [a b c d] -> grams abc@0 bcd@1; doc1 [a b c x y] ->
    # abc@4 (dup) bcx@5 cxy@6. T = 9; marks {1, 2, 3, 5, 9}.
    sf = _write_docs(tmp_path, [0, 1], ["a b c d", "a b c x y"])
    got = {r["n_tokens"]: r["vocab"] for r in q_vocab_growth(sf).take_all()}
    assert got == {1: 1, 2: 2, 3: 2, 5: 2, 9: 4}


def test_length_bucket_batching_waste(ray_session, tmp_path, monkeypatch):
    from crawl4ai_ray.pipelines import queries_wave9 as w9

    # 64 docs, half length 2, half length 50, interleaved by doc_id:
    # arrival batches mix lengths (waste = 16*(50-2) per batch); length
    # batches are homogeneous (waste 0).
    texts = [("a b" if i % 2 == 0 else " ".join(["w"] * 50)) for i in range(64)]
    sf = _write_docs(tmp_path, list(range(64)), texts)
    rows = w9.q_length_bucket_batching(sf).take_all()
    by = {(r["scheme"], r["batch_id"]): r for r in rows}
    for b in (0, 1):
        r = by[("length", b)]
        assert r["n_docs"] == 32 and r["waste"] == 0
    for b in (0, 1):
        r = by[("arrival", b)]
        assert r["n_docs"] == 32
        assert r["max_len"] == 50 and r["waste"] == 32 * 50 - (16 * 2 + 16 * 50)


def _write_events(tmp_path, user_ids, ts_us):
    n = len(user_ids)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(user_ids, pa.int64()),
                "event_type": pa.array(["view"] * n, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_interarrival_stats_hand_gaps(ray_session, tmp_path):
    """user 1: ts {0, 10, 25} -> gaps {10, 15}; user 2: one event -> no
    gaps, zeroed min/max/mean; user 3: duplicate ts -> one 0 gap."""
    from crawl4ai_ray.pipelines.queries_wave9 import q_interarrival_stats

    sf = _write_events(
        tmp_path,
        [1, 1, 1, 2, 3, 3],
        [10, 0, 25, 7, 5, 5],  # deliberately unsorted within user 1
    )
    rows = {r["user_id"]: r for r in q_interarrival_stats(sf).take_all()}
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert (r1["n_events"], r1["n_gaps"]) == (3, 2)
    assert (r1["min_gap_us"], r1["max_gap_us"]) == (10, 15)
    assert r1["mean_gap_us"] == 25.0 / 2.0
    r2 = rows[2]
    assert (r2["n_events"], r2["n_gaps"]) == (1, 0)
    assert (r2["min_gap_us"], r2["max_gap_us"], r2["mean_gap_us"]) == (0, 0, 0.0)
    r3 = rows[3]
    assert (r3["n_events"], r3["n_gaps"]) == (2, 1)
    assert (r3["min_gap_us"], r3["max_gap_us"], r3["mean_gap_us"]) == (0, 0, 0.0)


def test_bigram_logprob_hand_model(ray_session, tmp_path):
    """Corpus 'a b a b' + 'a b' + 'z': c(ab)=3, c(ba)=1; w1 counts
    a=3, b=1; V=2. Per-term fp quantization mirrored exactly; the
    single-token doc emits no bigrams and is absent from the output."""
    from crawl4ai_ray.pipelines.queries_wave9 import q_bigram_logprob

    sf = _write_docs(tmp_path, [0, 1, 2], ["a b a b", "a b", "z"])
    rows = {r["doc_id"]: r for r in q_bigram_logprob(sf).take_all()}
    assert set(rows) == {0, 1}

    def fp(p):
        return math.floor(math.log(p) * 1e9 + 0.5)

    t_ab = fp((3 + 1) / (3 + 2))  # ln(4/5)
    t_ba = fp((1 + 1) / (1 + 2))  # ln(2/3)
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["avg_logprob"] == (2 * t_ab + t_ba) / 1e9 / 3.0
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["avg_logprob"] == t_ab / 1e9 / 1.0


def test_random_walks_shuffle_path_parity(ray_session, tmp_path, monkeypatch):
    """Force the bucketed union+groupby path (cap 0) and assert it emits
    the identical trajectories as the broadcast path."""
    from crawl4ai_ray.pipelines import queries_wave9 as w9

    n = 120
    sf = _write_docs(tmp_path, list(range(n)), ["w"] * n)
    fast = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in w9.q_random_walks(sf).take_all()
    )
    monkeypatch.setattr(w9, "_RW_BROADCAST_CAP", 0)
    slow = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in w9.q_random_walks(sf).take_all()
    )
    assert fast == slow and len(fast) == 10

"""Fourteenth-wave operator unit tests: link-farm HHI, shingle-cosine
all-pairs similarity, NDCG@10 ranking evaluation, host-balanced
interleave ordering."""

import math
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave14 import (
    _SCP_DF_CAP,
    _SCP_N,
    _SCP_THRESH,
    q_host_balanced_order,
    q_link_farm_hhi,
    q_ndcg_bm25,
    q_shingle_cosine_pairs,
)


def _write_docs(tmp_path, texts, n_chars=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array(
                n_chars or [len(t) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


# ---------------------------------------------------------------------------
# link_farm_hhi
# ---------------------------------------------------------------------------


def _brute_hhi(n):
    edges = set()
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            edges.add((s, d))
    host = lambda x: 0 if x % 7 == 0 else x % 50
    pc = Counter((host(s), host(d)) for s, d in edges)
    out = {}
    for sh in sorted({k[0] for k in pc}):
        cs = [c for (a, _), c in pc.items() if a == sh]
        tot, ssq = sum(cs), sum(c * c for c in cs)
        out[sh] = (tot, len(cs), ssq, float(ssq) / (float(tot) * float(tot)))
    return out

def test_link_farm_hhi_brute_force(ray_session, tmp_path):
    n = 60
    _write_docs(tmp_path, [f"doc {i}" for i in range(n)])
    got = q_link_farm_hhi(str(tmp_path)).to_pandas().set_index("src_host")
    exp = _brute_hhi(n)
    assert set(got.index) == set(exp)
    for sh, (tot, nt, ssq, hhi) in exp.items():
        row = got.loc[sh]
        assert (row["total_links"], row["n_target_hosts"], row["sum_sq"]) == (
            tot,
            nt,
            ssq,
        )
        assert row["hhi"] == hhi


def test_link_farm_hhi_bounds(ray_session, sf_dir):
    df = q_link_farm_hhi(sf_dir).to_pandas()
    # HHI ∈ [1/n_targets, 1]
    assert (df["hhi"] <= 1.0 + 1e-12).all()
    assert (df["hhi"] >= 1.0 / df["n_target_hosts"] - 1e-12).all()
    assert (df["sum_sq"] <= df["total_links"] ** 2).all()


# ---------------------------------------------------------------------------
# shingle_cosine_pairs
# ---------------------------------------------------------------------------


def _brute_cosine_pairs(texts):
    tfs = []
    for t in texts:
        toks = t.lower().split()
        tfs.append(
            Counter(
                " ".join(toks[i : i + _SCP_N])
                for i in range(len(toks) - _SCP_N + 1)
            )
        )
    df = Counter(g for c in tfs for g in c)
    kept = [{g: v for g, v in c.items() if df[g] <= _SCP_DF_CAP} for c in tfs]
    out = {}
    for a, b in combinations(range(len(texts)), 2):
        dot = sum(v * kept[b].get(g, 0) for g, v in kept[a].items())
        if dot == 0:
            continue
        na = sum(v * v for v in kept[a].values())
        nb = sum(v * v for v in kept[b].values())
        cos = float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))
        if cos >= _SCP_THRESH:
            out[(a, b)] = (dot, cos)
    return out


def test_shingle_cosine_identical_docs(ray_session, tmp_path):
    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta epsilon",
        "zeta eta theta iota kappa lambda",
    ]
    _write_docs(tmp_path, texts)
    df = q_shingle_cosine_pairs(str(tmp_path)).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    # identical docs: dot == na == nb; the mirrored IEEE expression is
    # n/(sqrt(n)*sqrt(n)), which is 1.0 up to one ulp — compare to the
    # exact same expression, not to the algebraic 1.0
    n = float(r["dot"])
    assert r["cos"] == n / (math.sqrt(n) * math.sqrt(n))
    assert abs(r["cos"] - 1.0) < 1e-12


def test_shingle_cosine_df_cap_excludes_boilerplate(ray_session, tmp_path):
    # one boilerplate shingle in df_cap+2 docs; every doc otherwise unique
    n = _SCP_DF_CAP + 2
    texts = [f"common header line u{i} v{i} w{i}" for i in range(n)]
    _write_docs(tmp_path, texts)
    df = q_shingle_cosine_pairs(str(tmp_path)).to_pandas()
    assert len(df) == 0  # the shared shingles are over the df cap


def test_shingle_cosine_brute_force_parity(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(vocab[rng.randint(len(vocab))] for _ in range(14))
        for _ in range(30)
    ]
    _write_docs(tmp_path, texts)
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.dot), float(r.cos))
        for r in q_shingle_cosine_pairs(str(tmp_path))
        .to_pandas()
        .itertuples()
    }
    exp = _brute_cosine_pairs(texts)
    assert got == exp


# ---------------------------------------------------------------------------
# ndcg_bm25
# ---------------------------------------------------------------------------


def test_ndcg_bm25_invariants(ray_session, sf_dir):
    df = q_ndcg_bm25(sf_dir).to_pandas().sort_values("pos")
    assert list(df["pos"]) == list(range(1, 11))
    ln2 = math.log(2.0)
    for r in df.itertuples():
        assert r.gain == round(
            (2**r.rel - 1) / (math.log(r.pos + 1.0) / ln2), 8
        )
    assert df["dcg"].nunique() == 1 and df["idcg"].nunique() == 1
    dcg, idcg, ndcg = df.iloc[0][["dcg", "idcg", "ndcg"]]
    assert 0.0 < ndcg <= 1.0 + 1e-12
    assert dcg <= idcg + 1e-12
    assert ndcg == dcg / idcg


def test_ndcg_bm25_perfect_ranking(ray_session, tmp_path):
    # 12 docs of EQUAL length: bm25 is monotone in tf at fixed dl, so the
    # bm25 order equals the rel order and NDCG@10 == 1.0
    filler = ["pad"] * 8
    texts = []
    for i in range(12):
        k = max(0, 3 - i // 2)  # rel grades 3,3,2,2,1,1,0,...
        toks = (["table"] * k + filler)[:8]
        texts.append(" ".join(toks + ["tail"] * (8 - len(toks))))
    _write_docs(tmp_path, texts)
    df = q_ndcg_bm25(str(tmp_path)).to_pandas()
    assert df["ndcg"].iloc[0] == 1.0


# ---------------------------------------------------------------------------
# host_balanced_order
# ---------------------------------------------------------------------------


def test_host_balanced_order_interleave(ray_session, sf_dir):
    df = q_host_balanced_order(sf_dir).to_pandas().sort_values("pos")
    # every rank-1 row precedes every rank-2 row; hosts ascend within rank
    ranks = df["rank"].to_numpy()
    assert (np.diff(ranks) >= 0).all()
    for _, g in df.groupby("rank"):
        hosts = g.sort_values("pos")["host_id"].to_numpy()
        assert (np.diff(hosts) > 0).all()
    assert list(df["pos"]) == list(range(1, len(df) + 1))


def test_host_balanced_order_per_host_topk(ray_session, tmp_path):
    # 8 docs over hosts (doc%7==0 -> host 0 else doc%50): known n_chars
    n_chars = [10, 50, 40, 30, 20, 60, 5, 70]
    _write_docs(tmp_path, [f"d{i}" for i in range(8)], n_chars=n_chars)
    df = q_host_balanced_order(str(tmp_path)).to_pandas()
    # brute-force per-host top-2 by (n_chars desc, doc_id asc)
    host = lambda d: 0 if d % 7 == 0 else d % 50
    byhost = {}
    for d, nc in enumerate(n_chars):
        byhost.setdefault(host(d), []).append((-nc, d))
    exp = set()
    for h, rows in byhost.items():
        for rank, (_, d) in enumerate(sorted(rows)[:2], start=1):
            exp.add((h, d, rank))
    got = {
        (int(r.host_id), int(r.doc_id), int(r.rank)) for r in df.itertuples()
    }
    assert got == exp

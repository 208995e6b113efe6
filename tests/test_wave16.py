"""Sixteenth-wave operator unit tests: bowtie decomposition, embedding
dimension stats, transition entropy, host coverage curve."""

import math
from collections import deque

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave16 import (
    _EDS_SCALE,
    q_bowtie_components,
    q_embedding_dim_stats,
    q_host_coverage_curve,
    q_transition_entropy,
)


def _write_docs(tmp_path, n):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"d{i}" for i in range(n)], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


# ---------------------------------------------------------------------------
# bowtie_components
# ---------------------------------------------------------------------------


def _brute_bowtie(n):
    fwd_adj, bwd_adj = {}, {}
    for s in range(n):
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n):
            fwd_adj.setdefault(s, set()).add(d)
            bwd_adj.setdefault(d, set()).add(s)

    def reach(adj):
        seen = {0}
        q = deque([0])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        return seen

    f, b = reach(fwd_adj), reach(bwd_adj)
    out = {}
    for v in range(n):
        if v in f and v in b:
            out[v] = "scc"
        elif v in f:
            out[v] = "out"
        elif v in b:
            out[v] = "in"
        else:
            out[v] = "other"
    return out


def test_bowtie_brute_force(ray_session, tmp_path):
    n = 40
    _write_docs(tmp_path, n)
    got = {
        int(r.doc_id): r.comp
        for r in q_bowtie_components(str(tmp_path)).to_pandas().itertuples()
    }
    assert got == _brute_bowtie(n)


def test_bowtie_pivot_is_scc(ray_session, sf_dir):
    df = q_bowtie_components(sf_dir).to_pandas()
    assert df.loc[df["doc_id"] == 0, "comp"].iloc[0] == "scc"
    assert set(df["comp"]) <= {"scc", "in", "out", "other"}
    assert len(df) == 500


# ---------------------------------------------------------------------------
# embedding_dim_stats
# ---------------------------------------------------------------------------


def test_embedding_dim_stats_brute(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    x = rng.randn(37, 5).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(37), pa.int64()),
            "embedding": pa.array([row.tolist() for row in x]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    df = (
        q_embedding_dim_stats(str(tmp_path))
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    q = np.floor(x.astype(np.float64) * _EDS_SCALE + 0.5).astype(np.int64)
    assert list(df["dim"]) == [1, 2, 3, 4, 5]
    assert (df["n"] == 37).all()
    assert list(df["sum_q"]) == list(q.sum(axis=0))
    assert list(df["sumsq_q"]) == list((q * q).sum(axis=0))
    for i in range(5):
        sq, sqq = float(q[:, i].sum()), float((q[:, i] ** 2).sum())
        mean = (sq / 37.0) / _EDS_SCALE
        var = (sqq / 37.0 - (sq / 37.0) * (sq / 37.0)) / (_EDS_SCALE * _EDS_SCALE)
        assert df.loc[i, "mean"] == mean
        assert df.loc[i, "var"] == var


def test_embedding_dim_stats_full(ray_session, sf_dir):
    df = q_embedding_dim_stats(sf_dir).to_pandas()
    assert len(df) == 64
    assert (df["var"] >= 0).all()
    assert df["n"].nunique() == 1


# ---------------------------------------------------------------------------
# transition_entropy
# ---------------------------------------------------------------------------


def _write_events(tmp_path, rows):
    ts, uid, et, eid = zip(*rows)
    tbl = pa.table(
        {
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array(list(uid), pa.int64()),
            "event_type": pa.array(list(et), pa.string()),
            "event_id": pa.array(list(eid), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_transition_entropy_hand(ray_session, tmp_path):
    # user 1: a->b, b->a, a->b ; user 2: a->c
    # from 'a': {b:2, c:1}; from 'b': {a:1}
    rows = [
        (0, 1, "a", 1),
        (1, 1, "b", 2),
        (2, 1, "a", 3),
        (3, 1, "b", 4),
        (0, 2, "a", 5),
        (1, 2, "c", 6),
    ]
    _write_events(tmp_path, rows)
    df = q_transition_entropy(str(tmp_path)).to_pandas().set_index("src_type")
    assert df.loc["b", "entropy"] == 0.0  # deterministic successor
    a = df.loc["a"]
    assert (a["n_out"], a["n_dst_types"]) == (3, 2)
    q_b = math.floor(math.log(2.0 / 3.0) * 1e9 + 0.5)
    q_c = math.floor(math.log(1.0 / 3.0) * 1e9 + 0.5)
    s = 2 * q_b + 1 * q_c
    assert a["sum_q"] == s
    assert a["entropy"] == -(float(s) / 3.0) / 1e9
    # uniform over 2 would be ln 2; this is slightly below
    assert 0 < a["entropy"] < math.log(2.0) + 1e-9


def test_transition_entropy_bounds(ray_session, sf_dir):
    df = q_transition_entropy(sf_dir).to_pandas()
    # H in [0, ln(n_dst_types)]
    assert (df["entropy"] >= -1e-12).all()
    ub = np.log(df["n_dst_types"].to_numpy(dtype=np.float64))
    assert (df["entropy"].to_numpy() <= ub + 1e-9).all()


# ---------------------------------------------------------------------------
# host_coverage_curve
# ---------------------------------------------------------------------------


def test_host_coverage_curve_props(ray_session, sf_dir):
    df = q_host_coverage_curve(sf_dir).to_pandas().sort_values("rank")
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    # pages non-increasing; cum strictly increasing to total; share ends at 1
    assert (np.diff(df["n_pages"].to_numpy()) <= 0).all()
    assert (np.diff(df["cum_pages"].to_numpy()) > 0).all()
    assert df["cum_pages"].iloc[-1] == df["n_pages"].sum() == 500
    assert df["cum_share"].iloc[-1] == 1.0
    # heavy-hitter host 0 is rank 1 (doc%7==0 adds ~1/7 of the corpus)
    assert df["host_id"].iloc[0] == 0

"""Twenty-fourth-wave tests: distributed global rank (TeraSort
composition), sorted-neighborhood pairs, watermark lateness, Poisson
bootstrap CI, simhash radius curve."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from crawl4ai_ray.stages.rank import ranked_by_key, windowed_pairs
from crawl4ai_ray.pipelines.queries_wave24 import (
    q_bootstrap_mean_ci,
    q_events_watermark,
    q_simhash_radius_eval,
    q_snm_pairs,
)


def _mk_keyed_ds(n=500, seed=3):
    rng = np.random.RandomState(seed)
    keys = ["k%03d" % rng.randint(0, 80) for _ in range(n)]  # heavy ties
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {"id": pa.array(ids, pa.int64()), "key": pa.array(keys, pa.string())}
    )
    return ray.data.from_arrow(tbl).repartition(7), list(zip(keys, ids))


def test_ranked_by_key_matches_sorted_order(ray_session):
    ds, rows = _mk_keyed_ds()
    out = ranked_by_key(ds, "key", "id", num_buckets=5).to_pandas()
    expect = {
        rid: r
        for r, (_, rid) in enumerate(sorted((k, i) for k, i in rows))
    }
    got = dict(zip(out["id"], out["rank"]))
    assert got == expect
    # dense 0..n-1
    assert sorted(out["rank"]) == list(range(len(rows)))


def test_ranked_by_key_single_bucket_and_empty_sample(ray_session):
    # 3 rows, sample_rate larger than any id -> only id 0 sampled;
    # num_buckets=1 -> no boundaries at all
    tbl = pa.table(
        {
            "id": pa.array([2, 0, 1], pa.int64()),
            "key": pa.array(["b", "c", "a"], pa.string()),
        }
    )
    out = ranked_by_key(
        ray.data.from_arrow(tbl), "key", "id", num_buckets=1
    ).to_pandas()
    assert dict(zip(out["id"], out["rank"])) == {1: 0, 2: 1, 0: 2}


def test_windowed_pairs_brute_force_parity(ray_session):
    # chunk intentionally tiny (8) so spill replication is exercised hard
    ds, rows = _mk_keyed_ds(n=120, seed=11)
    ranked = ranked_by_key(ds, "key", "id", num_buckets=4)
    w = 3
    out = windowed_pairs(ranked, window=w, id_col="id", chunk=8).to_pandas()
    got = set(zip(out["a"], out["b"], out["rank_dist"]))
    order = [rid for _, rid in sorted((k, i) for k, i in rows)]
    expect = set()
    for r2 in range(len(order)):
        for d in range(1, w + 1):
            if r2 - d >= 0:
                expect.add((order[r2 - d], order[r2], d))
    assert got == expect


def test_snm_recovers_exact_dup_keys(ray_session, tmp_path):
    # distinct single-token docs + one doc whose first token recurs, so
    # its near-copy keeps an identical key and must pair within window
    texts = ["alpha beta alpha", "gamma", "delta", "epsilon"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_snm_pairs(str(tmp_path)).to_pandas()
    same = df[df["same_key"] == 1][["a", "b"]].itertuples(index=False)
    assert (0, 4) in {(a, b) for a, b in same}  # doc 0 and its copy id 0+4


def test_events_watermark_hand_case(ray_session, tmp_path):
    # construct 3 events: e0 at base, e1 300s later, e2 at +100s but with
    # the largest arrival jitter -> e2 arrives after e1 and its event
    # time is >60s behind the watermark: late
    # jitter(event_id) = ((id*2654435761) % 1000003) * 600 us
    jit = lambda i: ((i * 2654435761) % 1000003) * 600
    base = 1_700_000_000_000_000  # us epoch
    ts = {0: base, 1: base + 300_000_000, 2: base + 100_000_000}
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(
                [ts[i] for i in range(3)], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    # arrival order sanity: e2 must arrive after e1 (else not late)
    assert ts[2] + jit(2) > ts[1] + jit(1)
    df = q_events_watermark(str(tmp_path)).to_pandas()
    assert int(df["n_total"].sum()) == 3
    # e2's window; its ts is 200s behind the watermark base (>60s) => late
    late_win = (base + 100_000_000) // 600_000_000
    row = df[df["win_id"] == late_win].iloc[0]
    assert int(row["n_late"]) == 1
    assert int(df["n_late"].sum()) == 1


def test_bootstrap_ci_constant_data(ray_session, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "n_chars": pa.array([42] * 100, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = q_bootstrap_mean_ci(str(tmp_path)).to_pandas().iloc[0]
    assert row["n_resamples"] == 64
    assert row["ci_lo"] == 42.0 == row["ci_hi"] == row["mean_all"]


def test_bootstrap_ci_brackets_mean(ray_session, sf_dir):
    row = q_bootstrap_mean_ci(sf_dir).to_pandas().iloc[0]
    assert row["ci_lo"] < row["mean_all"] < row["ci_hi"]
    # CI width for n=500 iid lengths is a few percent of the mean
    assert (row["ci_hi"] - row["ci_lo"]) < 0.25 * row["mean_all"]


def test_simhash_radius_hand_case(ray_session, tmp_path):
    # "w w" vs "w": identical single-token vote signs -> hamming 0, J=1
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["w w"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_simhash_radius_eval(str(tmp_path)).to_pandas()
    assert len(df) == 1
    assert int(df["hamming"].iloc[0]) == 0
    assert float(df["mean_j"].iloc[0]) == 1.0


def test_simhash_radius_structure(ray_session, sf_dir):
    df = q_simhash_radius_eval(sf_dir).to_pandas()
    assert int(df["n_pairs"].sum()) == 500  # every doc has >= 2 tokens
    assert df["hamming"].between(0, 48).all()
    assert df["mean_j"].between(0.0, 1.0).all()

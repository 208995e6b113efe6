"""Twenty-sixth-wave tests: decayed counts, blocking eval, SURT keys."""

import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave26 import (
    _surt_one,
    q_blocking_eval,
    q_decayed_counts,
    q_surt_keys,
)


def test_decayed_counts_hand(ray_session, tmp_path):
    # 3 events of type A: today, 1 day old, 2 days old -> 1 + 1/2 + 1/4
    day = 86_400_000_000
    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_type": pa.array(["A", "A", "A", "B"], pa.string()),
            "ts": pa.array(
                [base + 2 * day, base + day, base, base + 2 * day],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_decayed_counts(str(tmp_path)).to_pandas()
    d = dict(zip(df["event_type"], df["decayed"]))
    assert d["A"] == 1.0 + 0.5 + 0.25
    assert d["B"] == 1.0


def test_decayed_counts_truncates_old(ray_session, tmp_path):
    day = 86_400_000_000
    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_type": pa.array(["old", "new"], pa.string()),
            "ts": pa.array(
                [base, base + 50 * day], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_decayed_counts(str(tmp_path)).to_pandas()
    d = dict(zip(df["event_type"], df["decayed"]))
    assert d["old"] == 0.0  # beyond 40 half-lives
    assert d["new"] == 1.0


def test_blocking_eval_bounds(ray_session, sf_dir):
    row = q_blocking_eval(sf_dir).to_pandas().iloc[0]
    assert row["n_truth"] == 500
    assert 0.0 <= row["pair_completeness"] <= 1.0
    assert 0.0 < row["reduction_ratio"] < 1.0
    # window blocking examines a vanishing fraction of all pairs
    assert row["reduction_ratio"] > 0.99
    # the planted same-key copies are recovered at a meaningful rate
    assert row["n_recovered"] > 0
    assert row["n_candidates"] <= 4 * 2 * 500  # <= window * corpus size


def test_surt_one_forms():
    assert _surt_one("https://site3.example.com/page/7") == (
        "com,example,site3)/page/7",
        "com,example",
    )
    assert _surt_one("http://WWW.Example.COM") == (
        "com,example)/",
        "com,example",
    )
    assert _surt_one("https://example.com/a?b=1") == (
        "com,example)/a?b=1",
        "com,example",
    )


def test_surt_keys_cluster_by_domain(ray_session, sf_dir):
    df = q_surt_keys(sf_dir).to_pandas()
    assert len(df) == 500
    # the whole synthetic corpus is one registrable domain
    assert set(df["surt_prefix"]) == {"com,example"}
    # sorting by surt clusters each host contiguously
    s = df.sort_values("surt")["surt"].tolist()
    hosts = [x.split(")")[0] for x in s]
    seen, prev = set(), None
    for h in hosts:
        if h != prev:
            assert h not in seen
            seen.add(h)
            prev = h

"""resolve_redirects (stages/redirects.py): chains, odd-length cycles
(pointer doubling never stabilizes pointers there — only settle counts
converge), drains into cycles, dangling targets, long chains."""

import pyarrow as pa

import ray

from crawl4ai_ray.stages.redirects import resolve_redirects


def _resolve(rows, **kw):
    t = pa.table(
        {
            "node": pa.array([r[0] for r in rows], pa.int64()),
            "target": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = resolve_redirects(ray.data.from_arrow(t), **kw).to_pandas()
    return out.set_index("node").sort_index()


def test_chain_and_terminal():
    # 3 -> 2 -> 1 -> 0 (terminal), 9 terminal
    out = _resolve([(0, None), (1, 0), (2, 1), (3, 2), (9, None)])
    assert out.loc[3, "final_id"] == 0 and out.loc[3, "hops"] == 3
    assert out.loc[1, "final_id"] == 0 and out.loc[1, "hops"] == 1
    assert out.loc[0, "final_id"] == 0 and out.loc[0, "hops"] == 0
    assert not out["is_cycle"].any()


def test_three_cycle_and_drain():
    # 10 -> 11 -> 12 -> 10 (cycle, odd length), 13 -> 10 drains in,
    # 14 -> 13 drains in two hops back; 0 is an honest terminal
    rows = [(10, 11), (11, 12), (12, 10), (13, 10), (14, 13), (0, None)]
    out = _resolve(rows)
    for n in (10, 11, 12, 13, 14):
        assert bool(out.loc[n, "is_cycle"])
        assert out.loc[n].isna()["final_id"] and out.loc[n].isna()["hops"]
    assert not out.loc[0, "is_cycle"]


def test_two_cycle():
    out = _resolve([(1, 2), (2, 1), (3, 1), (5, None)])
    assert bool(out.loc[1, "is_cycle"]) and bool(out.loc[2, "is_cycle"])
    assert bool(out.loc[3, "is_cycle"])
    assert not out.loc[5, "is_cycle"]


def test_dangling_target_is_terminal():
    # 1 -> 999 where 999 has no row: resolves to 999
    out = _resolve([(1, 999), (2, 1)])
    assert out.loc[1, "final_id"] == 999 and out.loc[1, "hops"] == 1
    assert out.loc[2, "final_id"] == 999 and out.loc[2, "hops"] == 2


def test_long_chain_log_rounds():
    # chain of 40 -> settles despite cap ~ log2(41)+2 = 7 rounds
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 41)]
    out = _resolve(rows)
    assert out.loc[40, "final_id"] == 0 and out.loc[40, "hops"] == 40
    assert (out["final_id"] == 0).all()


def test_layout_independence():
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 20)] + [(50, 51), (51, 50)]
    t = pa.table(
        {
            "node": pa.array([r[0] for r in rows], pa.int64()),
            "target": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    a = resolve_redirects(ray.data.from_arrow(t)).to_pandas().sort_values("node").reset_index(drop=True)
    b = (
        resolve_redirects(ray.data.from_arrow(t).repartition(9), num_buckets=5)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert a.equals(b)

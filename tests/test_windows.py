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

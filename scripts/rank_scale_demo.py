"""Scale demo for stages/rank.py: global rank + windowed pairs over
tens of millions of arbitrary string keys.

Validation is exact WITHOUT materializing the output on the driver:
- ranks dense 0..n-1  ⇔  count == n AND min == 0 AND max == n-1 AND
  sum(rank) == n(n-1)/2 (one distributed aggregate)
- windowed pairs complete ⇔ pair count == n·w − w(w+1)/2 and every
  rank_dist ∈ [1, w] (one aggregate)

Keys are splitmix64 hex strings (maximally unsorted input). The
boundary sample rate here is 1-in-1009 (driver sort ~20k keys at 20M
rows); at north-star scale widen the sample stride with the data so
the driver sort stays ~1e6 keys.

Usage: python scripts/rank_scale_demo.py [n_rows] [n_buckets]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, "/root/repo")

from crawl4ai_ray.stages.rank import ranked_by_key, windowed_pairs  # noqa: E402


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def main(n: int = 20_000_000, buckets: int = 64) -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        keys = np.char.mod("%016x", h.astype(object))
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "key": pa.array(keys.astype(str), pa.string()),
            }
        )

    ds = ray.data.range(n).map_batches(keyed, batch_format="pyarrow")

    t0 = time.time()
    ranked = ranked_by_key(
        ds, "key", "id", num_buckets=buckets, sample_rate=1009
    ).materialize()
    t_rank = time.time() - t0

    agg = ranked.aggregate(
        ray.data.aggregate.Count(alias_name="cnt"),
        ray.data.aggregate.Min("rank", alias_name="mn"),
        ray.data.aggregate.Max("rank", alias_name="mx"),
        ray.data.aggregate.Sum("rank", alias_name="sm"),
    )
    ok_rank = (
        agg["cnt"] == n
        and agg["mn"] == 0
        and agg["mx"] == n - 1
        and agg["sm"] == n * (n - 1) // 2
    )

    w = 3
    t1 = time.time()
    pairs = windowed_pairs(ranked, window=w, id_col="id", chunk=4096)
    pagg = pairs.map_batches(
        lambda b: pa.table(
            {
                "c": pa.array([b.num_rows], pa.int64()),
                "bad": pa.array(
                    [
                        int(
                            (
                                (
                                    b.column("rank_dist")
                                    .to_numpy(zero_copy_only=False)
                                    < 1
                                )
                                | (
                                    b.column("rank_dist")
                                    .to_numpy(zero_copy_only=False)
                                    > w
                                )
                            ).sum()
                        )
                        if b.num_rows
                        else 0
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    n_pairs = sum(int(r["c"]) for r in pagg)
    n_bad = sum(int(r["bad"]) for r in pagg)
    t_pairs = time.time() - t1
    expect_pairs = n * w - w * (w + 1) // 2
    ok_pairs = n_pairs == expect_pairs and n_bad == 0

    print(
        {
            "rows": n,
            "rank_sec": round(t_rank, 2),
            "rank_rows_per_sec": int(n / t_rank),
            "rank_valid": bool(ok_rank),
            "pairs_sec": round(t_pairs, 2),
            "n_pairs": n_pairs,
            "pairs_valid": bool(ok_pairs),
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(n, b)

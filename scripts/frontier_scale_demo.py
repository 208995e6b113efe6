"""North-rule scale demo: a 10-million-row frontier wave through the
Dataset-native FrontierStore — distributed sort(keys).limit(budget) pop,
broadcast anti-join carry, parquet spill — with the driver never holding
more than the admitted slice.

Run:  python scripts/frontier_scale_demo.py [n_rows] [budget]
Prints one JSON line with timings + peak driver RSS.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa

import ray


def synth_frontier(n: int, block: int = 500_000):
    """Generate an n-row frontier as a Dataset (never on the driver)."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()  # actual ids — blocks may coalesce
        cnt = len(ids)
        rng = np.random.RandomState(int(ids[0]) % (2**31) or 1)
        return pa.table(
            {
                "url_norm": pa.array(
                    [f"https://site{i % 997}.example.com/p/{i}" for i in ids]
                ),
                "host": pa.array([f"site{i % 997}.example.com" for i in ids]),
                "depth": pa.array((ids % 6).astype(np.int32), pa.int32()),
                "parent_url": pa.array([""] * cnt),
                "score": pa.array(rng.uniform(0, 1, cnt).round(6), pa.float64()),
                "enqueued_wave": pa.array(np.zeros(cnt, np.int32), pa.int32()),
            }
        )

    base = ray.data.range(n).map_batches(gen, batch_format="pyarrow", batch_size=block)
    return base


def main(n_rows: int = 10_000_000, budget: int = 1_000_000) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crawl4ai_ray.state.frontier_store import FrontierStore

    spill = tempfile.mkdtemp(prefix="c4r_frontier_demo_")
    fs = FrontierStore(
        strategy="best_first", aging_rate=0.05, spill_dir=spill, small_threshold=100_000
    )
    t0 = time.time()
    src_dir = os.path.join(spill, "src")
    synth_frontier(n_rows).write_parquet(src_dir)
    paths = [
        os.path.join(src_dir, f) for f in os.listdir(src_dir) if f.endswith(".parquet")
    ]
    fs.push_parquet(paths)
    t_build = time.time() - t0

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB-ish (KB→GB)
    t1 = time.time()
    admitted = fs.pop_wave(budget, wave=1)
    t_pop = time.time() - t1
    assert admitted.num_rows == budget
    assert fs.dataset_mode
    # top of the wave really is the global max-score slice
    scores = admitted.column("score").to_numpy()
    t2 = time.time()
    spill_path = fs.spill()
    t_spill = time.time() - t2
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "n_rows": n_rows,
        "budget": budget,
        "build_s": round(t_build, 2),
        "pop_wave_s": round(t_pop, 2),
        "spill_s": round(t_spill, 2),
        "remaining": len(fs),
        "admitted_min_score": float(scores.min()),
        "driver_rss_gb_before_pop": round(rss0, 2),
        "driver_rss_gb_after": round(rss1, 2),
        "dataset_mode": fs.dataset_mode,
        "spill_path": spill_path,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    main(n, b)
    ray.shutdown()

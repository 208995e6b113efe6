"""Scale demo for kcore: distributed peeling on a skewed synthetic graph
orders of magnitude past the oracle scale.

Graph: N nodes; every node i >= 1 gets a binary-tree parent edge
(i -> i // 2) and one splitmix64-scattered edge (NOT the SQL-mirrorable
congruential family — linear-family structure survives squaring at scale,
NOTES_r3 synthetic-data gotcha #2). Average undirected degree ~4 with a
heavy hub at the tree root and long peel chains down the leaves — the
regime where per-round fixed shuffle cost and peel-set size both matter.

Reports wall time and the final core size per graph size.
Usage: python scripts/kcore_scale_demo.py [n_nodes...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_ray.stages.graph import kcore


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def build_edges(n: int) -> "ray.data.Dataset":
    ids = ray.data.range(n).map_batches(
        lambda b: pa.table({"i": b["id"].astype(np.int64)}),
        batch_format="numpy",
    )

    def edges(batch: pa.Table) -> pa.Table:
        i = batch.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        nz = i[i >= 1]
        h1 = (_splitmix64(i.astype(np.uint64)) % np.uint64(n)).astype(np.int64)
        src = np.concatenate([nz, i])
        dst = np.concatenate([nz // 2, h1])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return ids.map_batches(edges, batch_format="pyarrow")


def main(sizes):
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    for n in sizes:
        edges = build_edges(n)
        t0 = time.time()
        core = kcore(edges, k=3, num_buckets=64).materialize()
        secs = time.time() - t0
        n_core = core.count()
        print(
            f"n={n:,}  kcore(k=3): {secs:.1f}s  core_nodes={n_core:,} "
            f"({100.0 * n_core / n:.1f}% of nodes)  directed_edges~{2 * n:,}"
        )
    ray.shutdown()


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 2_000_000]
    main(sizes)

"""Scale demo for the composed recrawl pipeline: Cho–Garcia-Molina
change rates over an N-doc × 6-snapshot observation log → fixed-point
priorities → max-min water-filled per-host budgets → per-host
admission. Exercises the real query stages (stages/freshness.change_rate
+ queries_wave10.recrawl_admission) on synthetic logs 10×–4000× the
sf0.01 table.

Change pattern mirrors the oracle's: version bumps at snapshot k≥1 when
(doc_id·3 + k²) % 7 == 0; observation (doc_id+k) % 13 == 0 dropped.
Content hashes are md5(f"{doc_id}#v{v}") — the hash VALUE doesn't matter
to the rate estimator, only equality between consecutive observations.

Usage: python scripts/recrawl_scale_demo.py [sizes...]   (default 2e5 2e6)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_ray.pipelines.queries_wave10 import recrawl_admission
from crawl4ai_ray.stages.freshness import change_rate


def make_snaps(n: int) -> "ray.data.Dataset":
    ids = ray.data.range(n)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy().astype(np.int64)
        out_id, out_k, out_h = [], [], []
        ver = np.zeros(len(d), np.int64)
        for k in range(6):
            if k >= 1:
                ver += ((d * 3 + k * k) % 7 == 0).astype(np.int64)
            keep = (d + k) % 13 != 0
            out_id.append(d[keep])
            out_k.append(np.full(int(keep.sum()), k, np.int64))
            out_h.append(
                [
                    hashlib.md5(f"{i}#v{v}".encode()).hexdigest()
                    for i, v in zip(d[keep], ver[keep])
                ]
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "snap": pa.array(np.concatenate(out_k), pa.int64()),
                "content_hash": pa.array(
                    [h for part in out_h for h in part], pa.string()
                ),
            }
        )

    return ids.map_batches(gen, batch_format="pyarrow")


def main(sizes: list[int]) -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    for n in sizes:
        t0 = time.time()
        admitted = recrawl_admission(change_rate(make_snaps(n)))
        n_adm = admitted.count()
        dt = time.time() - t0
        # invariant: admitted == water-filled budget == total_stale // 3
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "snap_rows": n * 6,
                    "admitted": n_adm,
                    "sec": round(dt, 1),
                    "docs_per_sec": round(n / dt),
                }
            ),
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    sizes = [int(float(a)) for a in sys.argv[1:]] or [200_000, 2_000_000]
    main(sizes)

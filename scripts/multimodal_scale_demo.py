"""Scale demo for the multimodal dedup path: N synthetic images →
actor-pool dHash → hamming block-bucket pair generation.

The point being measured: after the hash stage, ONLY (id, 64-bit sig)
rows move — the image bytes never shuffle — so the dedup cost is flat
per image and the wide step is a signature-only groupby. Images are the
same squared-congruential 8×9 grids as the image_dhash_dups query
(decorrelated, so spurious near-pairs are rare) with a planted
one-pixel-bumped near-dup every 50th image.

Usage: python scripts/multimodal_scale_demo.py [sizes...]   (default 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_ray.stages.dedup import hamming_pairs
from crawl4ai_ray.stages.multimodal import DHashImage


def synth_images(n: int) -> "ray.data.Dataset":
    ids_ds = ray.data.range(n)

    def synth(batch: pa.Table) -> pa.Table:
        # demo grids use the repo's real 64-bit mixer (no SQL oracle to
        # mirror here): the query's SQL-expressible squared congruence
        # still clusters at 5e4+ ids (measured 27k spurious near-pairs at
        # 50k images), which would swamp the planted signal
        from crawl4ai_ray.state.bloom import splitmix64

        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.arange(8, dtype=np.int64)[None, :, None]
        c = np.arange(9, dtype=np.int64)[None, None, :]
        base = np.where(ids % 50 == 1, ids - 1, ids)[:, None, None]
        cell = (base * 72 + r * 9 + c).astype(np.uint64)
        grids = (splitmix64(cell) % np.uint64(251)).astype(np.uint8)
        planted = ids % 50 == 1
        grids[planted, 0, 0] = (grids[planted, 0, 0].astype(np.int64) + 1) % 251
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array([g.tobytes() for g in grids], pa.binary()),
            }
        )

    return ids_ds.map_batches(synth, batch_format="pyarrow")


def main(sizes):
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    for n in sizes:
        t0 = time.time()
        media = synth_images(n)
        sigs = media.map_batches(
            DHashImage, batch_format="pyarrow", batch_size=4096,
            concurrency=(1, 16),
        ).materialize()
        t_hash = time.time() - t0
        t1 = time.time()
        pairs = hamming_pairs(sigs, max_hamming=2, id_col="id", sig_col="dhash")
        n_pairs = pairs.count()
        t_pairs = time.time() - t1
        print(
            json.dumps(
                {
                    "n_images": n,
                    "hash_sec": round(t_hash, 1),
                    "pairs_sec": round(t_pairs, 1),
                    "total_sec": round(t_hash + t_pairs, 1),
                    "images_per_sec": round(n / (t_hash + t_pairs)),
                    "pairs_found": n_pairs,
                    "planted_pairs": n // 50,
                }
            )
        )
    ray.shutdown()


if __name__ == "__main__":
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000]
    main(sizes)

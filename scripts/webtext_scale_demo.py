"""Scale demo for the flagship webtext composition: quality filter →
boilerplate line dedup → exact dedup → LM tail-drop on synthetic corpora
10×–100× the sf0.1 documents table.

Corpus: N docs, ~60 tokens each, from a 2k-word vocab skewed toward a
32-word head (so the LM's capped vocab actually captures mass); every 9th
doc carries one of 30 shared boilerplate 6-token segments (corpus-frequent
→ removed by stage 2); every 13th doc is a byte-identical copy of its
predecessor (killed by stage 3); every 17th doc is digit-noise (killed by
the stage-1 quality filter). Deterministic per doc_id — no RNG state
threads through tasks.

Usage: python scripts/webtext_scale_demo.py [sizes...]
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

from crawl4ai_ray.pipelines.webtext import webtext_pipeline

HEAD = [f"h{i}" for i in range(32)]
TAILV = [f"t{i}" for i in range(2000)]
STOPS = ["the", "a", "of", "to", "in", "is"]
BOILER = [" ".join(f"b{j}_{k}" for k in range(6)) for j in range(30)]


def make_docs(n: int) -> "ray.data.Dataset":
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        texts = []
        for i in ids:
            i = int(i)
            seed = i - 1 if (i % 13 == 0 and i > 0) else i  # exact dup of prev
            if seed % 17 == 0:
                texts.append("9 " * 60)  # digit noise → quality-filtered
                continue
            rng = np.random.RandomState(seed % 2**31)
            toks = []
            for j in range(60):
                r = rng.randint(0, 100)
                if r < 35:
                    toks.append(HEAD[rng.randint(0, len(HEAD))])
                elif r < 60:
                    toks.append(STOPS[rng.randint(0, len(STOPS))])
                else:
                    toks.append(TAILV[rng.randint(0, len(TAILV))])
            if seed % 9 == 0:
                ins = BOILER[(seed // 9) % len(BOILER)]
                toks[18:18] = ins.split()
            texts.append(" ".join(toks))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


def main(sizes: list[int]):
    rows = []
    for n in sizes:
        docs = make_docs(n).materialize()
        t0 = time.time()
        # df threshold and broadcast cap scale with n (a threshold tuned
        # at 500k docs flags far more segments at 2M+ — the fixed
        # max_docs=2 tripped the 1M-key broadcast cap there); sizes
        # <= 1M keep max_docs=2 for comparability with recorded points
        max_docs = 2 if n <= 1_000_000 else max(2, n // 500_000)
        out = webtext_pipeline(
            docs,
            # thresholds retuned for this corpus's nll range: the point of
            # the demo is throughput scaling, not the bucket split
            head_t=10**18,
            tail_t=2 * 10**18,
            concurrency=(1, 16),
            max_docs=max_docs,
            boiler_cap=4_000_000,
        ).materialize()
        dt = time.time() - t0
        kept = out.count()
        rows.append(
            {
                "docs": n,
                "kept": kept,
                "sec": round(dt, 2),
                "docs_per_sec": round(n / dt, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [50_000, 200_000, 500_000]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    main(sizes)
    ray.shutdown()

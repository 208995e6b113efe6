"""Scale demo: df-capped exact cosine APSS (shingle_cosine_pairs) at
200k and 1M synthetic docs with planted near-duplicate pairs.

What it proves at scale:
  - the df cap keeps per-shingle pair work bounded (cap²/2), so the
    candidate volume grows ~linearly with the corpus, not quadratically;
  - planted near-copies (doc + one-token edit) are recovered EXACTLY
    (every planted pair found at cos ≥ 0.35, no misses);
  - throughput is reported as docs/s end-to-end (postings → bucketed
    pair products → norms attach → threshold).

Doc synthesis uses splitmix64 mixing (NOT a linear congruence — linear
families alias perceptual/shingle patterns at n ≥ ~5e4, r3 lesson), so
non-planted docs share almost no rare shingles.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa

import ray


def _mix(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def make_docs(n: int, n_planted: int, doc_len: int = 24) -> "ray.data.Dataset":
    """n base docs of doc_len tokens from per-doc mixed streams; the
    last n_planted docs are near-copies of docs 0..n_planted-1 with the
    first token replaced."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = []
        for i in ids:
            if i >= n:  # planted near-copy of (i - n)
                base = int(i - n)
                toks = _mix(
                    (np.uint64(base) << np.uint64(20))
                    + np.arange(doc_len, dtype=np.uint64)
                ) % np.uint64(50000)
                words = [f"w{int(t)}" for t in toks]
                words[0] = "edited"
                texts.append(" ".join(words))
            else:
                toks = _mix(
                    (np.uint64(i) << np.uint64(20))
                    + np.arange(doc_len, dtype=np.uint64)
                ) % np.uint64(50000)
                texts.append(" ".join(f"w{int(t)}" for t in toks))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    ids = ray.data.range(n + n_planted).map_batches(
        lambda b: pa.table({"id": b.column("id")}), batch_format="pyarrow"
    )
    return ids.map_batches(gen, batch_format="pyarrow")


def main(sizes=(200_000, 1_000_000)):
    import tempfile

    from crawl4ai_ray.pipelines import queries_wave14 as w14

    for n in sizes:
        n_planted = 1000
        out = tempfile.mkdtemp(prefix=f"apss_{n}_", dir="/tmp")
        docs = make_docs(n, n_planted)
        docs.write_parquet(out + "/documents.parquet")
        t0 = time.time()
        pairs = w14.q_shingle_cosine_pairs(out).to_pandas()
        dt = time.time() - t0
        planted = {(i, n + i) for i in range(n_planted)}
        got = {
            (min(a, b), max(a, b))
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        }
        found = len(planted & got)
        spurious = len(got - planted)
        print(
            f"n={n+n_planted}: {dt:.1f} s = {(n+n_planted)/dt:,.0f} docs/s, "
            f"pairs={len(got)}, planted recovered {found}/{n_planted}, "
            f"spurious={spurious}"
        )
        assert found == n_planted, "planted near-dup pair missed"


if __name__ == "__main__":
    if not ray.is_initialized():
        import os

        # clamp: an argv typo like "200000" (docs, not cpus) must not
        # ask the raylet for 200k workers — that fork-bombs the box
        # (r4 incident: raylet died with EAGAIN, load avg 100)
        want = int(sys.argv[1]) if len(sys.argv) > 1 else 32
        ray.init(
            address="local",
            num_cpus=max(1, min(want, os.cpu_count() or 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    main()
    ray.shutdown()

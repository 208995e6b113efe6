"""Scale demo for the fourth-wave operators: duplicate_ngram_spans and
pack_sequences on synthetic corpora 10×–200× the sf0.1 documents table.

Corpus: N docs, ~60 tokens each, drawn from a 5k-word vocab; every 11th doc
embeds one of 40 shared boilerplate sentences (12 tokens) so duplicate
spans exist at a realistic density (~9% of docs carry a planted span) and
hot grams have O(N/440) postings — the skew case the bucket plan must
absorb.

Usage: python scripts/spans_pack_scale_demo.py [sizes...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_ray.stages import packing
from crawl4ai_ray.stages.dedup import duplicate_ngram_spans

VOCAB = [f"w{i}" for i in range(5000)]
BOILER = [
    " ".join(f"b{j}_{k}" for k in range(12)) for j in range(40)
]


def make_docs(n: int) -> "ray.data.Dataset":
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        texts = []
        for i in ids:
            rng = np.random.RandomState(int(i) % 2**31)
            toks = [VOCAB[j] for j in rng.randint(0, len(VOCAB), size=60)]
            if i % 11 == 0:
                ins = BOILER[int(i // 11) % len(BOILER)]
                toks[20:20] = ins.split()
            texts.append(" ".join(toks))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )

    return ray.data.range(n).map_batches(
        lambda b: pa.table({"id": b.column("id")}), batch_format="pyarrow"
    ).map_batches(gen, batch_format="pyarrow")


def main(sizes: list[int]):
    out = []
    for n in sizes:
        docs = make_docs(n).materialize()
        t0 = time.time()
        spans = duplicate_ngram_spans(docs, window=5, num_buckets=128)
        n_spans = spans.count()
        t_span = time.time() - t0
        t0 = time.time()
        packed = packing.pack_sequences(docs, seq_len=1024, range_width=65536)
        n_packed = packed.count()
        t_pack = time.time() - t0
        row = {
            "docs": n,
            "dup_spans": n_spans,
            "span_sec": round(t_span, 2),
            "span_docs_per_sec": round(n / t_span),
            "packed_rows": n_packed,
            "pack_sec": round(t_pack, 2),
            "pack_docs_per_sec": round(n / t_pack),
        }
        print(row, flush=True)
        out.append(row)
    return out


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [20_000, 100_000]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    main(sizes)
    ray.shutdown()

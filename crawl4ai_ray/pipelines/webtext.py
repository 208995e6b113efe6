"""The flagship webtext training-data composition, reusable over any
(doc_id, text) Dataset — `pipelines/queries.py::q_webtext_pipeline` binds
it to the documents table; `scripts/webtext_scale_demo.py` drives it at
10×–100× synthetic scale.

Stages (one streaming chain, two materialized seams — each seam is a
parquet checkpoint at 100 TB; in-memory materialize here):

  1. quality filter (composite score ≥ 0.5, `stages/textstats.py`)
  2. corpus-frequency boilerplate removal (`stages/linededup.py`),
     boilerplate-only docs dropped
  3. exact dedup on the CLEANED text — hash64 % `dedup_buckets` bucketed
     groupby (fixed scheduling-unit count), string-exact keep-min-doc_id
     within bucket
  4. unigram-LM perplexity bucketing (`stages/lmscore.py`), tail dropped

Output: (doc_id, dl, nll_fixed, mean_nll_fixed, bucket) survivors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions import hashing
from ..stages import textstats
from ..stages.linededup import line_dedup
from ..stages.lmscore import unigram_lm_score


def webtext_pipeline(
    docs: "ray.data.Dataset",
    width: int | None = 3,
    max_docs: int = 2,
    vocab_k: int = 16,
    head_t: int = 342_900_000,
    tail_t: int = 343_500_000,
    dedup_buckets: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    def qual_keep(batch: pa.Table) -> pa.Table:
        q = textstats.quality_score_batch(batch).column("quality")
        return batch.filter(pa.compute.greater_equal(q, pa.scalar(0.5)))

    # materialized seams: `survivors` is consumed twice (boilerplate fold
    # + cleaning pass) and `deduped` twice (LM fit fold + scoring);
    # without a seam the whole upstream lineage re-executes once per
    # consumer (measured 35 s → ~7 s warm at sf0.1)
    survivors = docs.map_batches(qual_keep, batch_format="pyarrow").materialize()
    cleaned = line_dedup(
        survivors, width=width, max_docs=max_docs, concurrency=concurrency
    ).map_batches(
        lambda b: b.filter(pa.compute.greater(b.column("n_kept"), pa.scalar(0))),
        batch_format="pyarrow",
    )

    def bucket_tag(batch: pa.Table) -> pa.Table:
        h = hashing.hash64(batch.column("clean_text").to_pylist())
        return batch.append_column(
            "b",
            pa.array((h % np.uint64(dedup_buckets)).view(np.int64), pa.int64()),
        )

    def keep_min(group):
        # string-exact dedup within the bucket: min doc_id per clean_text
        idx = group.groupby("clean_text", sort=False)["doc_id"].idxmin()
        return group.loc[sorted(idx)][["doc_id", "clean_text"]]

    deduped = (
        cleaned.map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(keep_min, batch_format="pandas")
        .materialize()
    )
    scored = unigram_lm_score(
        deduped,
        text_col="clean_text",
        vocab_k=vocab_k,
        head_t=head_t,
        tail_t=tail_t,
        concurrency=concurrency,
    )
    return scored.map_batches(
        lambda b: b.filter(
            pa.compute.not_equal(b.column("bucket"), pa.scalar("tail"))
        ),
        batch_format="pyarrow",
    )

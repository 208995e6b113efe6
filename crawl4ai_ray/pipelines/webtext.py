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
    boiler_cap: int = 1_000_000,
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
        survivors, width=width, max_docs=max_docs, concurrency=concurrency,
        boiler_cap=boiler_cap,
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

    def keep_min(g: pa.Table) -> pa.Table:
        # string-exact dedup within the bucket: min doc_id per
        # clean_text — arrow-native (r5): stable lexsort + first-of-run,
        # winners emitted in original row order (idxmin parity)
        texts = np.asarray(g.column("clean_text").to_pylist(), dtype=object)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, texts))
        t_s = texts[order]
        first = np.r_[True, t_s[1:] != t_s[:-1]] if len(t_s) else np.zeros(0, bool)
        win = np.sort(order[first])
        return g.select(["doc_id", "clean_text"]).take(
            pa.array(win, pa.int64())
        )

    deduped = (
        cleaned.map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(keep_min, batch_format="pyarrow")
        .materialize()
    )
    scored = unigram_lm_score(
        deduped,
        text_col="clean_text",
        vocab_k=vocab_k,
        head_t=head_t,
        tail_t=tail_t,
        concurrency=concurrency,
        carry_cols=("clean_text",),
    )
    return scored.map_batches(
        lambda b: b.filter(
            pa.compute.not_equal(b.column("bucket"), pa.scalar("tail"))
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Checkpointed / resumable runner
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import json as _json
import os as _os
import shutil as _shutil
import time as _time

from ..functions.hashing import HASH_SPEC


def _config_hash(params: dict) -> str:
    return _hashlib.md5(
        _json.dumps(params, sort_keys=True).encode("utf-8")
    ).hexdigest()


def run_webtext(
    docs: "ray.data.Dataset",
    out_dir: str,
    width: int | None = 3,
    max_docs: int = 2,
    vocab_k: int = 16,
    head_t: int = 342_900_000,
    tail_t: int = 343_500_000,
    dedup_buckets: int = 64,
    concurrency=(1, 16),
    export_shards_n: int | None = None,
    export_seed: int = 0,
    curriculum_tiles: int | None = None,
    boiler_cap: int = 1_000_000,
    min_compression_ratio: float | None = None,
    lang_gate: str | None = None,
) -> dict:
    """Checkpointed webtext run: every stage writes partitioned parquet
    under ``out_dir/<N>_<name>/`` and a ``_DONE`` marker carrying the
    config hash, so a failed or killed run resumes by SKIPPING finished
    stages (the crawl-checkpoint discipline of `pipelines/crawl.py`
    applied to the data pipeline). ``manifest.json`` records per-stage
    lineage (input stage, rows in/out, seconds, resumed) plus the frozen
    ``HASH_SPEC`` — a checkpoint written under different parameters or a
    different hash spec refuses to resume rather than silently mixing
    semantics.

    Returns the manifest dict; the final dataset is parquet at
    ``manifest["stages"]["4_lm_filter"]["path"]``.
    """
    params = {
        "width": width,
        "max_docs": max_docs,
        "vocab_k": vocab_k,
        "head_t": head_t,
        "tail_t": tail_t,
        "dedup_buckets": dedup_buckets,
        "hash_spec": HASH_SPEC,
        # schema v2: stage 4 carries clean_text; export params are part of
        # the run identity (a resume under different export config must
        # refuse, like any other param change)
        "schema_v": 2,
        "export_shards_n": export_shards_n,
        "export_seed": export_seed,
        # None keeps the config hash identical to pre-curriculum runs,
        # so existing checkpoints still resume
        **({"curriculum_tiles": curriculum_tiles} if curriculum_tiles else {}),
        # non-default only: keeps old checkpoints' config hash valid
        **({"boiler_cap": boiler_cap} if boiler_cap != 1_000_000 else {}),
        # RefinedWeb-style repetition gate (drop docs that zlib-compress
        # below the floor); None keeps pre-gate checkpoints resumable
        **(
            {"min_compression_ratio": min_compression_ratio}
            if min_compression_ratio is not None
            else {}
        ),
        # CCNet-style language gate: keep only docs whose windowed
        # majority vote is lang_gate AND that are not mixed-language;
        # None keeps pre-gate checkpoints resumable
        **({"lang_gate": lang_gate} if lang_gate is not None else {}),
    }
    cfg_hash = _config_hash(params)
    _os.makedirs(out_dir, exist_ok=True)
    man_path = _os.path.join(out_dir, "manifest.json")
    if _os.path.exists(man_path):
        with open(man_path) as f:
            manifest = _json.load(f)
        if manifest.get("config_hash") != cfg_hash:
            raise ValueError(
                f"checkpoint at {out_dir} was written with different "
                f"parameters or hash spec ({manifest.get('config_hash')!r} "
                f"!= {cfg_hash!r}); refusing to resume — pass a fresh "
                "out_dir or the original parameters"
            )
    else:
        manifest = {"config_hash": cfg_hash, "params": params, "stages": {}}

    def _save():
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(manifest, f, indent=1)
        _os.replace(tmp, man_path)

    def stage(name: str, input_stage: str | None, fn):
        d = _os.path.join(out_dir, name)
        done = _os.path.join(d, "_DONE")
        if _os.path.exists(done):
            with open(done) as f:
                if f.read().strip() != cfg_hash:
                    raise ValueError(
                        f"stage {name} _DONE hash mismatch at {d}; "
                        "refusing to resume"
                    )
            entry = manifest["stages"].setdefault(
                name, {"path": d, "input": input_stage}
            )
            entry["resumed"] = True
            _save()
            return ray.data.read_parquet(d)
        t0 = _time.time()
        ds = fn()
        _shutil.rmtree(d, ignore_errors=True)
        ds.write_parquet(d)
        out = ray.data.read_parquet(d)
        manifest["stages"][name] = {
            "path": d,
            "input": input_stage,
            "rows": out.count(),
            "sec": round(_time.time() - t0, 2),
            "resumed": False,
        }
        with open(done, "w") as f:
            f.write(cfg_hash)
        _save()
        return out

    def qual_keep(batch: pa.Table) -> pa.Table:
        q = textstats.quality_score_batch(batch).column("quality")
        batch = batch.filter(pa.compute.greater_equal(q, pa.scalar(0.5)))
        if min_compression_ratio is not None:
            import zlib

            import numpy as np

            ratios = np.array(
                [
                    len(zlib.compress(raw, 6)) / max(len(raw), 1)
                    for raw in (
                        (t or "").encode("utf-8")
                        for t in batch.column("text").to_pylist()
                    )
                ],
                np.float64,
            )
            batch = batch.filter(pa.array(ratios >= min_compression_ratio))
        if lang_gate is not None:
            keep = [
                (lambda r: r[3] == lang_gate and r[2] <= 1)(
                    textstats.lang_mix_doc(t)
                )
                for t in batch.column("text").to_pylist()
            ]
            batch = batch.filter(pa.array(keep))
        return batch

    survivors = stage(
        "1_quality",
        None,
        lambda: docs.map_batches(qual_keep, batch_format="pyarrow"),
    )
    cleaned = stage(
        "2_line_dedup",
        "1_quality",
        lambda: line_dedup(
            survivors, width=width, max_docs=max_docs,
            concurrency=concurrency, boiler_cap=boiler_cap,
        ).map_batches(
            lambda b: b.filter(
                pa.compute.greater(b.column("n_kept"), pa.scalar(0))
            ),
            batch_format="pyarrow",
        ),
    )

    def bucket_tag(batch: pa.Table) -> pa.Table:
        h = hashing.hash64(batch.column("clean_text").to_pylist())
        return batch.append_column(
            "b",
            pa.array((h % np.uint64(dedup_buckets)).view(np.int64), pa.int64()),
        )

    def keep_min(g: pa.Table) -> pa.Table:
        # arrow-native (r5) — see webtext_pipeline.keep_min
        texts = np.asarray(g.column("clean_text").to_pylist(), dtype=object)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, texts))
        t_s = texts[order]
        first = np.r_[True, t_s[1:] != t_s[:-1]] if len(t_s) else np.zeros(0, bool)
        win = np.sort(order[first])
        return g.select(["doc_id", "clean_text"]).take(
            pa.array(win, pa.int64())
        )

    deduped = stage(
        "3_exact_dedup",
        "2_line_dedup",
        lambda: cleaned.map_batches(bucket_tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(keep_min, batch_format="pyarrow"),
    )
    final = stage(
        "4_lm_filter",
        "3_exact_dedup",
        lambda: unigram_lm_score(
            deduped,
            text_col="clean_text",
            vocab_k=vocab_k,
            head_t=head_t,
            tail_t=tail_t,
            concurrency=concurrency,
            carry_cols=("clean_text",),
        ).map_batches(
            lambda b: b.filter(
                pa.compute.not_equal(b.column("bucket"), pa.scalar("tail"))
            ),
            batch_format="pyarrow",
        ),
    )

    if export_shards_n:
        # Stage 5: deterministic shuffle-for-training export. Writes its
        # own shard=NN layout (stages/shuffle.py), so it manages its stage
        # dir directly instead of going through stage()'s write_parquet.
        from ..stages.shuffle import export_shards

        name = "5_export"
        d = _os.path.join(out_dir, name)
        done = _os.path.join(d, "_DONE")
        if _os.path.exists(done):
            with open(done) as f:
                if f.read().strip() != cfg_hash:
                    raise ValueError(
                        f"stage {name} _DONE hash mismatch at {d}; refusing to resume"
                    )
            entry = manifest["stages"].setdefault(
                name, {"path": d, "input": "4_lm_filter"}
            )
            entry["resumed"] = True
            _save()
        else:
            t0 = _time.time()
            _shutil.rmtree(d, ignore_errors=True)
            exp = export_shards(
                final,
                d,
                n_shards=export_shards_n,
                seed=export_seed,
                columns=["clean_text", "bucket"],
            )
            manifest["stages"][name] = {
                "path": d,
                "input": "4_lm_filter",
                "rows": sum(exp["rows_per_shard"].values()),
                "rows_per_shard": {str(k): v for k, v in sorted(exp["rows_per_shard"].items())},
                "sec": round(_time.time() - t0, 2),
                "resumed": False,
            }
            with open(done, "w") as f:
                f.write(cfg_hash)
            _save()

    if curriculum_tiles:
        # Stage 6: curriculum deciles — NTILE(curriculum_tiles) over the
        # final table's (quality score, doc_id) order via the shared
        # counting-sort ranker (stages/sampling.quality_decile_assign,
        # the clean_text riding the single shuffle), written partitioned
        # by decile so a trainer streams decile=1/ .. decile=K/ in
        # curriculum order without re-reading anything else.
        from ..stages.sampling import quality_decile_assign

        name = "6_curriculum"
        d = _os.path.join(out_dir, name)
        done = _os.path.join(d, "_DONE")
        if _os.path.exists(done):
            with open(done) as f:
                if f.read().strip() != cfg_hash:
                    raise ValueError(
                        f"stage {name} _DONE hash mismatch at {d}; refusing to resume"
                    )
            entry = manifest["stages"].setdefault(
                name, {"path": d, "input": "4_lm_filter"}
            )
            entry["resumed"] = True
            _save()
        else:
            t0 = _time.time()
            _shutil.rmtree(d, ignore_errors=True)
            dec = quality_decile_assign(
                final,
                id_col="doc_id",
                text_col="clean_text",
                tiles=curriculum_tiles,
                carry_cols=("clean_text",),
            )
            dec.sort("decile").write_parquet(d, partition_cols=["decile"])
            per = (
                ray.data.read_parquet(d).groupby("decile").count().take_all()
            )
            manifest["stages"][name] = {
                "path": d,
                "input": "4_lm_filter",
                "rows": sum(int(r["count()"]) for r in per),
                "rows_per_decile": {
                    str(r["decile"]): int(r["count()"])
                    for r in sorted(per, key=lambda r: int(r["decile"]))
                },
                "sec": round(_time.time() - t0, 2),
                "resumed": False,
            }
            with open(done, "w") as f:
                f.write(cfg_hash)
            _save()
    return manifest

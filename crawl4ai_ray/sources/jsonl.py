"""JSONL source/sink — newline-delimited JSON as a first-class format.

Training-data pipelines interchange corpora as `.jsonl.gz` shards at
least as often as Parquet (The Pile, RedPajama, Dolma all ship JSONL);
the reference engine itself exports crawl results as JSON
(/root/reference/crawl4ai/models.py CrawlResult.model_dump → json), so a
user switching to this repo needs the format on both ends.

Same determinism contract as the WARC sibling (sources/warc.py):

- one gzip shard per input block, written task-local (no shuffle, no
  driver transit), shard name = hash of the block's record keys, atomic
  tmp+rename — re-running the SAME dataset with the SAME block layout is
  byte-for-byte idempotent, and a fresh dir per logical export keeps
  differently-batched runs from accumulating stale shards;
- every record carries an in-band `_digest` (md5 of the record's
  canonical payload JSON, sorted keys, stamped at WRITE time); the
  reader recomputes it so JSON-encoding losslessness (unicode escapes,
  float round-trip, key order) is a per-record `digest_ok` check, not an
  out-of-band diff;
- `mtime=0` gzip headers — no wall clock in the bytes.

Reading parallelizes per shard file via `read_binary_files`; parsing is
one `json.loads` per line into typed arrays under an EXPLICIT
`pyarrow.Schema` (JSON cannot carry Arrow types, so schema inference
per-shard would let int/float/null drift between blocks — the caller
pins the schema instead).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

import pyarrow as pa

import ray


def _canonical(rec: dict) -> str:
    """Canonical payload JSON: sorted keys, no whitespace, ensure_ascii —
    one byte representation per value, independent of dict order."""
    return json.dumps(rec, sort_keys=True, separators=(",", ":"))


def write_jsonl(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_col: str,
) -> "ray.data.Dataset":
    """Sink: Dataset → `out_dir/shard-<hash>.jsonl.gz`, one shard per
    input block. `key_col` names the column whose values derive the
    shard filename (any stable per-record key, e.g. doc_id or url).
    Returns the shard manifest (path, n_records, n_bytes) as a Dataset.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        cols = batch.column_names
        pylists = {c: batch.column(c).to_pylist() for c in cols}
        lines = []
        for i in range(batch.num_rows):
            rec = {c: pylists[c][i] for c in cols}
            payload = _canonical(rec)
            rec["_digest"] = hashlib.md5(payload.encode()).hexdigest()
            lines.append(_canonical(rec))
        blob = gzip.compress(("\n".join(lines) + "\n").encode(), mtime=0)
        keys = "\n".join(str(k) for k in pylists[key_col])
        shard = hashlib.md5(keys.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"shard-{shard}.jsonl.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: a reader never sees a torn shard
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(batch)], pa.int64()),
                "n_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return ds.map_batches(write_batch, batch_format="pyarrow")


def read_jsonl(jsonl_dir: str, schema: pa.Schema) -> "ray.data.Dataset":
    """Source: `*.jsonl.gz` shards → Dataset under the caller-pinned
    `schema`, plus a `digest_ok` bool recomputed from each record's
    in-band `_digest`. Shards parallelize as files."""
    files = ray.data.read_binary_files(jsonl_dir, file_extensions=["gz"])
    names = list(schema.names)

    def parse(batch: pa.Table) -> pa.Table:
        vals: dict[str, list] = {c: [] for c in names}
        oks: list[bool] = []
        for blob in batch.column("bytes").to_pylist():
            data = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
            for line in data.decode("utf-8").splitlines():
                if not line:
                    continue
                rec = json.loads(line)
                digest = rec.pop("_digest", None)
                oks.append(
                    digest == hashlib.md5(_canonical(rec).encode()).hexdigest()
                )
                for c in names:
                    vals[c].append(rec.get(c))
        cols = {c: pa.array(vals[c], schema.field(c).type) for c in names}
        cols["digest_ok"] = pa.array(oks, pa.bool_())
        return pa.table(cols)

    return files.map_batches(parse, batch_format="pyarrow")

"""Training-sequence packing: map documents onto fixed-length token
sequences (the concat-and-chunk packing used for LLM pretraining batches —
all docs are concatenated in a deterministic order and the stream is cut
every ``seq_len`` tokens; a doc may straddle sequence boundaries).

The global token offset of every doc is a prefix sum over doc order — a
sequential recurrence on its face. It distributes as the classic two-level
scan:

1. ``map_batches``: per-doc token counts, keyed by an ORDERED range bucket
   ``bucket = doc_id // range_width`` (integer doc ids ⇒ bucket order ==
   doc order across buckets).
2. ``groupby(bucket).sum`` → the per-bucket totals. This result is ~one row
   per bucket; the DRIVER folds it into per-bucket base offsets (the only
   sequential step, O(num_buckets) on ~16-byte rows — bounded and tiny by
   construction, not a driver-side data loop).
3. ``groupby(bucket).map_groups``: per-bucket vectorized cumsum rebased on
   the bucket's broadcast base offset → every doc's global ``tok_start``
   and its sequence span.

Docs with zero tokens are dropped (they occupy no stream positions).
Partitioning assumption: one range bucket's count rows fit in a worker's
heap; at north-star scale size ``range_width`` so num_buckets stays ≲1e5
(driver fold stays trivial) while buckets stay ≲1e7 docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_width: int = 4096,
) -> "ray.data.Dataset":
    """→ (doc_id, n_tok, tok_start, seq_start, seq_end, seq_offset):
    the doc's global token offset in the concatenated stream, the first and
    last (inclusive) ``seq_len``-token sequences it touches, and its offset
    within the first. Deterministic: stream order is ascending ``id_col``."""

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    L = np.int64(seq_len)

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.fromiter(
            (len((t or "").split()) for t in batch.column(text_col).to_pylist()),
            dtype=np.int64,
            count=len(ids),
        )
        keep = n > 0
        ids, n = ids[keep], n[keep]
        return pa.table(
            {
                "bucket": pa.array(ids // range_width, pa.int64()),
                "id": pa.array(ids, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    cnt = ds.select_columns([id_col, text_col]).map_batches(
        counts, batch_format="pyarrow"
    )
    # Stage 2: tiny per-bucket totals → driver-side prefix fold → broadcast.
    totals = cnt.groupby("bucket").aggregate(
        ray.data.aggregate.Sum("n", alias_name="total")
    ).take_all()
    totals.sort(key=lambda r: r["bucket"])
    bases: dict[int, int] = {}
    acc = 0
    for row in totals:
        bases[row["bucket"]] = acc
        acc += row["total"]
    bases_ref = ray.put(bases)

    def per_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): one sort + cumsum, no pandas
        if g.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {"doc_id": z, "n_tok": z, "tok_start": z,
                 "seq_start": z, "seq_end": z, "seq_offset": z, "seq_len": z}
            )
        base_map = ray.get(bases_ref)
        g = g.sort_by("id")
        ids = g.column("id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        base = base_map[int(g.column("bucket")[0].as_py())]
        tok_start = base + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "n_tok": pa.array(n.astype(np.int64), pa.int64()),
                "tok_start": pa.array(tok_start.astype(np.int64), pa.int64()),
                "seq_start": pa.array(
                    (tok_start // L).astype(np.int64), pa.int64()
                ),
                "seq_end": pa.array(
                    ((tok_start + n - 1) // L).astype(np.int64), pa.int64()
                ),
                "seq_offset": pa.array(
                    (tok_start % L).astype(np.int64), pa.int64()
                ),
                # seq_len rides with the rows so sequence_manifest can
                # VALIDATE against it — a silently mismatched seq_len
                # yields negative fills (review finding)
                "seq_len": pa.array(
                    np.full(len(ids), int(L), dtype=np.int64), pa.int64()
                ),
            }
        )

    return cnt.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sequence_manifest(
    packed: "ray.data.Dataset", seq_len: int = 1024
) -> "ray.data.Dataset":
    """Per-sequence summary from ``pack_sequences`` output: how many docs
    touch each sequence and how many of its token slots are filled (the
    final, possibly partial, sequence is the only one not full). One
    flat_map-style explode + one groupby. ``seq_len`` must equal the one
    the rows were packed with — validated against the carried ``seq_len``
    column per batch (a mismatch used to produce silently-wrong negative
    fills; review finding)."""
    L = np.int64(seq_len)

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows and "seq_len" in batch.column_names:
            carried = batch.column("seq_len").to_numpy(zero_copy_only=False)
            if (carried != int(L)).any():
                raise ValueError(
                    f"sequence_manifest(seq_len={int(L)}) over rows packed "
                    f"with seq_len={int(carried[0])} — the two must match"
                )
        starts = batch.column("seq_start").to_numpy(zero_copy_only=False)
        ends = batch.column("seq_end").to_numpy(zero_copy_only=False)
        toks = batch.column("tok_start").to_numpy(zero_copy_only=False)
        ns = batch.column("n_tok").to_numpy(zero_copy_only=False)
        seq_out, fill_out = [], []
        for s, e, t, n in zip(starts, ends, toks, ns):
            for q in range(s, e + 1):
                lo = max(t, q * L)
                hi = min(t + n, (q + 1) * L)
                seq_out.append(q)
                fill_out.append(hi - lo)
        return pa.table(
            {
                "seq_id": pa.array(seq_out, pa.int64()),
                "fill": pa.array(fill_out, pa.int64()),
            }
        )

    return packed.map_batches(explode, batch_format="pyarrow").groupby(
        "seq_id"
    ).aggregate(
        ray.data.aggregate.Count(alias_name="n_docs"),
        ray.data.aggregate.Sum("fill", alias_name="n_filled"),
    )

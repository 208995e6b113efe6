"""Per-URL change-rate estimation from multi-snapshot crawl history.

The recrawl-scheduling question ("how often does this page change?")
answered from the observation log an incremental crawler already has:
one (id, snapshot, content_hash) row per successful fetch. Consecutive
observed hashes that differ are detected changes; the estimator is the
bias-corrected Poisson-rate estimator of Cho & Garcia-Molina,
"Estimating Frequency of Change" (ACM TOIT 3(3), 2003):

    lambda_hat = -ln( (n_nochange + 0.5) / (n_comparisons + 0.5) )

which stays finite even when every comparison changed (the naive
-ln(1 - X/n) diverges there) and corrects for changes masked by
multiple edits between two observations.

Shape: ONE bucketed shuffle — rows tagged hash(id) % P, per bucket a
vectorized sort → LAG-compare → per-id fold (P scheduling units, never
one group per url). Only (id, snap, 32-char hash) rows move. The log
itself is the small projection of crawl checkpoints; bodies never
enter. Transcendentals use scalar ``math.log`` for bit-parity with the
oracle's libm ``ln`` (house float discipline).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

_MULT = np.uint64(0x9E3779B97F4A7C15)


def change_rate(
    snaps: "ray.data.Dataset",
    id_col: str = "doc_id",
    snap_col: str = "snap",
    hash_col: str = "content_hash",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ one row per id: (id, n_obs, n_changes, change_ratio, est_rate).

    change_ratio = n_changes / (n_obs - 1)   (NULL when n_obs < 2)
    est_rate     = Cho–Garcia-Molina lambda_hat (NULL when n_obs < 2)
    """
    P = num_buckets

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            b = (ids.astype(np.uint64) * _MULT) >> np.uint64(64 - 16)
        return pa.table(
            {
                "bucket": pa.array((b % np.uint64(P)).astype(np.int64)),
                id_col: batch.column(id_col),
                snap_col: batch.column(snap_col),
                hash_col: batch.column(hash_col),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sort_by + numpy run folds, no pandas
        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_obs": pa.array([], pa.int64()),
                    "n_changes": pa.array([], pa.int64()),
                    "change_ratio": pa.array([], pa.float64()),
                    "est_rate": pa.array([], pa.float64()),
                }
            )
        g = g.sort_by([(id_col, "ascending"), (snap_col, "ascending")])
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        hs = np.asarray(g.column(hash_col).to_pylist(), dtype=object)
        same = ids[1:] == ids[:-1]
        chg = same & (hs[1:] != hs[:-1])
        # per-id fold over the sorted run
        uniq, starts = np.unique(ids, return_index=True)
        ends = np.append(starts[1:], ids.size)
        n_obs = (ends - starts).astype(np.int64)
        # changes are attributed to the PAIR index (i-1, i): pair i belongs
        # to the id of row i, and same[] already masks cross-id pairs
        chg_by_row = np.zeros(ids.size, dtype=np.int64)
        chg_by_row[1:] = chg.astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(chg_by_row)])
        n_changes = (csum[ends] - csum[starts]).astype(np.int64)
        ratio, rate = [], []
        for o, c in zip(n_obs, n_changes):
            ncmp = int(o) - 1
            if ncmp <= 0:
                ratio.append(None)
                rate.append(None)
            else:
                ratio.append(float(c) / float(ncmp))
                rate.append(-math.log((float(ncmp - c) + 0.5) / (float(ncmp) + 0.5)))
        return pa.table(
            {
                id_col: pa.array(uniq.astype(np.int64), pa.int64()),
                "n_obs": pa.array(n_obs, pa.int64()),
                "n_changes": pa.array(n_changes, pa.int64()),
                "change_ratio": pa.array(ratio, pa.float64()),
                "est_rate": pa.array(rate, pa.float64()),
            }
        )

    return (
        snaps.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )

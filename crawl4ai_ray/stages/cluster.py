"""Distributed k-means and SemDeDup over embedding columns, in EXACT
fixed-point integer arithmetic.

Semantic dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — public arXiv paper) needs a
clustering pass (k-means) and a within-cluster cosine-threshold drop.
Both are implemented here so every arithmetic step is order-free and
bit-stable across any block layout, which is what makes a DuckDB SQL
oracle possible for an iterative algorithm:

- embeddings are quantized ONCE to int64 fixed-point
  (``e_fp = floor(e * 2^20 + 0.5)``, float64 math — identical to the
  oracle's ``floor(CAST(v AS DOUBLE) * 1048576.0 + 0.5)``);
- distances are pure integer sums of squared differences (≤ 2^52 for
  dim 64 — no float, no order sensitivity);
- centroid updates are ``floor(sum / count)`` on integers (the SQL side
  uses ``floor(CAST(SUM(e) AS DOUBLE) / COUNT(*))``, exact while
  |sum| < 2^53; DuckDB's ``//`` truncates toward zero so it is NOT used);
- empty clusters carry their previous centroid;
- ties in assignment go to the lowest cluster id (numpy argmin /
  ``row_number() OVER (ORDER BY d, cluster)``);
- the SemDeDup cosine test ``cos(u,v) > tau`` is evaluated as
  ``dot > 0 AND dot^2 * DEN > NUM * |u|^2 * |v|^2`` with
  ``tau^2 = NUM/DEN`` — integer-exact (HUGEINT on the SQL side, Python
  bigints here for the boundary band).

Distribution strategy:

1. init — centroids = the k lowest-id vectors (one tiny filtered read).
2. per iteration: centroids (k×d int64, ~4 KB) broadcast via ``ray.put``;
   ``map_batches`` computes assignments vectorized (numpy int64
   broadcasting) and emits ONE partial row per (batch, cluster) with the
   per-dim component sums as wide columns → ``groupby("cluster").sum``
   bounds the shuffle at k rows regardless of corpus size; the driver
   folds k rows into the next centroid table.
3. final pass re-assigns and (for SemDeDup) co-locates each cluster with
   ``groupby("cluster").map_groups``; within a cluster the drop test is
   one int64 matmul against earlier-id rows.

Partitioning assumption (documented per the custom-operator contract):
one cluster's rows fit in a worker. k must grow with the corpus (SemDeDup
uses k ≈ sqrt(n) or larger at web scale), which also keeps the
within-cluster O(m^2) verify bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

QUANT_BITS = 20
QUANT = 1 << QUANT_BITS  # 1048576


def quantize_embeddings(batch: pa.Table, emb_col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, d) int64 fixed-point matrix; float64 math
    identical to the oracle's floor(CAST(v AS DOUBLE) * QUANT + 0.5)."""
    emb = np.stack(batch.column(emb_col).to_numpy(zero_copy_only=False))
    return np.floor(emb.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def _assign(e_fp: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n,) argmin-cluster (ties → lowest id) and (n,) integer distances.
    diff^2 ≤ 2^46, summed over ≤64 dims ≤ 2^52 — int64-safe."""
    dist = _dist_matrix(e_fp, cents)
    a = dist.argmin(axis=1)
    return a, dist[np.arange(len(a)), a]


def _dist_matrix(e_fp: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n,k) integer squared distances (the _assign kernel, exposed for
    consumers that need ALL centroid distances, e.g. the silhouette).
    Same int64-safety bound as _assign."""
    diff = e_fp[:, None, :] - cents[None, :, :]
    return np.einsum("nkd,nkd->nk", diff, diff)


def _init_centroids(
    ds: "ray.data.Dataset", k: int, id_col: str, emb_col: str
) -> np.ndarray:
    """Deterministic init: the k lowest-id vectors, in id order."""

    def pick(batch: pa.Table) -> pa.Table:
        mask = pa.compute.less(batch.column(id_col), pa.scalar(k))
        return batch.filter(mask)

    rows = (
        ds.map_batches(pick, batch_format="pyarrow")
        .sort(id_col)
        .take_all()
    )
    assert len(rows) == k, f"need ids 0..{k - 1} present for init, got {len(rows)}"
    emb = np.stack([np.asarray(r[emb_col]) for r in rows])
    return np.floor(emb.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def kmeans_fp(
    ds: "ray.data.Dataset",
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple["ray.data.Dataset", np.ndarray]:
    """Lloyd's k-means, integer-exact. Returns (assignments, centroids):
    assignments = (id_col, cluster, dist_fp) Dataset; centroids = the
    final (k, d) fixed-point table (NOT re-fit after the last assignment,
    i.e. ``iters`` centroid updates then one final assignment)."""
    cents = _init_centroids(ds, k, id_col, emb_col)
    d = cents.shape[1]
    sum_cols = [f"s_{j:02d}" for j in range(d)]

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        **{
                            cn: pa.array([], pa.int64()) for cn in sum_cols
                        },
                    }
                )
            c = ray.get(_ref)
            e_fp = quantize_embeddings(batch, emb_col)
            a, _ = _assign(e_fp, c)
            present = np.unique(a)
            cols: dict = {
                "cluster": pa.array(present, pa.int64()),
                "n": pa.array(
                    [int((a == ci).sum()) for ci in present], pa.int64()
                ),
            }
            sums = np.stack(
                [e_fp[a == ci].sum(axis=0) for ci in present]
            )  # (m, d) int64 — batch-bounded, no overflow
            for j, name in enumerate(sum_cols):
                cols[name] = pa.array(sums[:, j], pa.int64())
            return pa.table(cols)

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster")
            .aggregate(
                ray.data.aggregate.Sum("n", alias_name="n"),
                *[
                    ray.data.aggregate.Sum(cn, alias_name=cn)
                    for cn in sum_cols
                ],
            )
            .take_all()
        )
        new = cents.copy()  # empty clusters carry their previous centroid
        for row in agg:
            ci = int(row["cluster"])
            n = int(row["n"])
            if n > 0:
                new[ci] = np.array(
                    [int(row[cn]) // n for cn in sum_cols], np.int64
                )
        cents = new

    ref = ray.put(cents)

    def final(batch: pa.Table, _ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "dist_fp": pa.array([], pa.int64()),
                }
            )
        c = ray.get(_ref)
        e_fp = quantize_embeddings(batch, emb_col)
        a, dist = _assign(e_fp, c)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "dist_fp": pa.array(dist, pa.int64()),
            }
        )

    return ds.map_batches(final, batch_format="pyarrow"), cents


def semdedup(
    ds: "ray.data.Dataset",
    k: int = 8,
    iters: int = 4,
    tau_num: int = 81,
    tau_den: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """SemDeDup keep/drop verdicts: cluster with ``kmeans_fp``, then drop
    any vector with an EARLIER (lower-id) same-cluster vector whose cosine
    exceeds tau (tau^2 = tau_num/tau_den, e.g. 81/100 → tau = 0.9).

    "Earlier-dominates-any" semantics (drop v if ∃ u < v with
    cos(u,v) > tau), not the sequential greedy variant — fully parallel
    within a cluster and SQL-reproducible. → (id_col, cluster, keep)."""
    assignments, cents = kmeans_fp(ds, k, iters, id_col, emb_col)
    ref = ray.put(cents)

    def tag(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    **{
                        f"e_{j:02d}": pa.array([], pa.int64())
                        for j in range(c.shape[1])
                    },
                }
            )
        e_fp = quantize_embeddings(batch, emb_col)
        a, _ = _assign(e_fp, c)
        cols = {
            id_col: batch.column(id_col).cast(pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        }
        for j in range(e_fp.shape[1]):
            cols[f"e_{j:02d}"] = pa.array(e_fp[:, j], pa.int64())
        return pa.table(cols)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def per_cluster(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sort + stacked int64 columns, no pandas
        g = g.sort_by(id_col)
        ecols = [c for c in g.column_names if c.startswith("e_")]
        e = np.stack(
            [g.column(c).to_numpy(zero_copy_only=False) for c in ecols],
            axis=1,
        ).astype(np.int64) if g.num_rows else np.zeros((0, len(ecols)), np.int64)
        m = g.num_rows
        # int64 matmul: |dot| ≤ 64 * 2^44 = 2^50, |n|^2 same bound
        dots = e @ e.T
        norms = np.diag(dots).copy()
        # float prefilter with an exactness band; Python-bigint recheck
        # only inside the band (lhs/rhs ~ 2^107 overflow int64)
        lf = dots.astype(np.float64) ** 2 * float(tau_den)
        rf = float(tau_num) * np.outer(
            norms.astype(np.float64), norms.astype(np.float64)
        )
        band = np.abs(lf - rf) <= 1e-9 * np.maximum(np.abs(lf), np.abs(rf))
        viol = (dots > 0) & (lf > rf)
        for a, b in zip(*np.nonzero(band & (dots > 0))):
            if a < b:
                dd = int(dots[a, b])
                viol[a, b] = (
                    dd * dd * tau_den > tau_num * int(norms[a]) * int(norms[b])
                )
        viol &= np.tri(m, m, -1, dtype=bool).T  # keep a<b pairs only
        keep = ~viol.any(axis=0)  # b dropped if any earlier a dominates it
        return pa.table(
            {
                id_col: g.column(id_col),
                "cluster": g.column("cluster"),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return tagged.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )

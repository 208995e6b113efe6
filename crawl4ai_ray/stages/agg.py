"""Shuffle-lean aggregation helpers.

``partial_count`` implements the pre-aggregate-before-groupby pattern the
100 TB design relies on (and the north rule's salted-host guidance): each
block collapses to (key, partial_count) rows inside ``map_batches`` —
vectorized, zero extra shuffle — so the following ``groupby(key).sum``
exchanges at most (distinct keys × blocks) tiny rows instead of every
input row. For skewed keys (one host owning ~16% of the corpus, as in the
synthetic heavy-hitter) the map-side combine IS the salt: the hot key's
rows never concentrate on one reducer as raw rows, only as per-block
partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def partial_count(
    ds: "ray.data.Dataset", key: str, out_col: str = "n"
) -> "ray.data.Dataset":
    """groupby(key).count() with a map-side combine."""

    def combine(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([key]))
        out = df.group_by(key).len(name=out_col)
        return out.to_arrow().cast(
            pa.schema([(key, batch.schema.field(key).type), (out_col, pa.uint32())])
        )

    partials = ds.map_batches(combine, batch_format="pyarrow")
    out = partials.groupby(key).sum(out_col)
    return out.map_batches(
        lambda b: pa.table(
            {
                key: b.column(key),
                out_col: b.column(f"sum({out_col})").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def grouped_topk(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    k: int = 3,
    extra_cols: tuple = (),
    tie_col: str | None = None,
    num_buckets: int = 32,
    rank_col: str = "rank",
) -> "ray.data.Dataset":
    """Top-k rows per group by ``value`` DESC — the window-function
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY value DESC)`` <= k that
    Ray Data has no native operator for.

    Two-level, shuffle-lean:

    1. map-side partial top-k: each batch keeps at most k rows per key it
       contains (vectorized polars head-k) — rows beyond k can never make
       the global top-k, so the shuffle carries ≤ k·|keys-per-batch| rows.
    2. ONE groupby on ``hash(key) % num_buckets`` (never one scheduling
       unit per key), then a per-bucket exact top-k with ranks.

    Ties break on ``tie_col`` ASC (required for deterministic output —
    defaults to the first extra col). Output columns:
    (key, *extra_cols, value, rank).
    """
    import numpy as np
    import polars as pl

    tie = tie_col or (extra_cols[0] if extra_cols else None)
    if tie is None:
        raise ValueError("grouped_topk needs tie_col or extra_cols for determinism")
    cols = [key, *extra_cols, value]

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(cols))
        out = (
            df.sort([value, tie], descending=[True, False])
            .group_by(key, maintain_order=True)
            .head(k)
        )
        # polars emits large_string; restore the INPUT column types so
        # downstream joins/unions keep the original schema (r5 — the
        # pandas per_bucket used to normalize this as a side effect)
        tbl = out.to_arrow().cast(
            pa.schema([(c, batch.schema.field(c).type) for c in cols])
        )
        keyvals = tbl.column(key).to_numpy(zero_copy_only=False)
        if keyvals.dtype.kind in ("i", "u"):
            bucket = (keyvals.astype(np.uint64) % num_buckets).astype(np.int64)
        else:  # string keys: stable 64-bit content hash, never Python hash()
            from ..functions.hashing import hash64

            bucket = (
                hash64(keyvals).astype(np.uint64) % np.uint64(num_buckets)
            ).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket))

    def per_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): one sort + run-length rank, no pandas
        g = g.sort_by(
            [(key, "ascending"), (value, "descending"), (tie, "ascending")]
        )
        kv = np.asarray(g.column(key).to_pylist(), dtype=object)
        n = len(kv)
        if n == 0:
            out = {c: pa.array([], g.column(c).type) for c in cols}
            out[rank_col] = pa.array([], pa.int64())
            return pa.table(out)
        idx = np.arange(n, dtype=np.int64)
        new = np.r_[True, kv[1:] != kv[:-1]]
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - start + 1
        mask = rank <= k
        kept = g.filter(pa.array(mask))
        out = {c: kept.column(c) for c in cols}
        out[rank_col] = pa.array(rank[mask], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def partial_sum(
    ds: "ray.data.Dataset", key: str, value: str, out_col: str = "total"
) -> "ray.data.Dataset":
    """groupby(key).sum(value) with a map-side combine."""

    def combine(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([key, value]))
        out = df.group_by(key).agg(pl.col(value).sum().alias(out_col))
        return out.to_arrow()

    partials = ds.map_batches(combine, batch_format="pyarrow")
    out = partials.groupby(key).sum(out_col)
    return out.map_batches(
        lambda b: pa.table(
            {key: b.column(key), out_col: b.column(f"sum({out_col})")}
        ),
        batch_format="pyarrow",
    )


def exact_percentiles(
    ds: "ray.data.Dataset",
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> "pa.Table":
    """Exact discrete percentiles (percentile_disc semantics: the value at
    1-indexed rank ceil(p·N) of the sorted column) of an integer-valued
    column, without a distributed sort: map-side value counts → ONE
    groupby on the value → the driver folds only the HISTOGRAM, whose
    size is the number of distinct values — bounded for the counters this
    is meant for (token/char counts, status codes, depths), not a
    general-purpose quantile of unbounded doubles. A 100 TB corpus with a
    vocabulary of 10^5 distinct lengths folds 10^5 rows on the driver.
    Returns a small in-memory Arrow table (pct, value)."""
    import numpy as np

    def combine(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([value_col]))
        # NULLs carry no rank — drop them, matching SQL quantile semantics
        out = (
            df.filter(pl.col(value_col).is_not_null())
            .group_by(value_col)
            .len()
            .rename({"len": "n"})
        )
        return out.with_columns(pl.col("n").cast(pl.Int64)).to_arrow()

    hist_ds = ds.map_batches(combine, batch_format="pyarrow").groupby(value_col).sum("n")
    vals, counts = [], []
    for b in hist_ds.iter_batches(batch_format="pyarrow"):
        vals.extend(b.column(value_col).to_pylist())
        counts.extend(b.column("sum(n)").to_pylist())
    if not vals:  # empty input → empty result, not an IndexError
        return pa.table(
            {"pct": pa.array([], pa.float64()), "value": pa.array([], pa.int64())}
        )
    order = np.argsort(np.asarray(vals))
    v = np.asarray(vals)[order]
    c = np.asarray(counts)[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p in percentiles:
        rank = max(1, int(np.ceil(p * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_p.append(float(p))
        out_v.append(int(v[idx]))
    return pa.table(
        {"pct": pa.array(out_p, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


def distinct_count_per_key(
    ds: "ray.data.Dataset", key: str, value: str, out_col: str = "n_distinct"
) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT value) GROUP BY key. Map-side batch-local
    dedup of (key, value) pairs, one groupby(key, value) to finish the
    global dedup, then the partial_count pattern on the surviving pairs —
    the raw rows shuffle at most once, already deduped per block."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        import polars as pl

        # SQL COUNT(DISTINCT v) ignores NULL values — drop them here so
        # the oracle comparison holds on nullable columns
        return (
            pl.from_arrow(batch.select([key, value]))
            .filter(pl.col(value).is_not_null())
            .unique()
            .to_arrow()
        )

    pairs = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby([key, value])
        .count()
    )
    keys_only = pairs.map_batches(
        lambda b: b.select([key]), batch_format="pyarrow"
    )
    return partial_count(keys_only, key, out_col=out_col)


# --- HyperLogLog distinct sketch ------------------------------------------

_HLL_P = 10  # 2^10 = 1024 registers → ~3.2% standard error
_HLL_M = 1 << _HLL_P
# Flajolet et al. 2007 bias constant for m >= 128
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _fmix64(h):
    """Murmur3 finalizer: FNV-1a's HIGH bits have weak avalanche on short
    keys (measured: 4096 short strings → 66 distinct top-10-bit values),
    and HLL needs uniform top bits for the register index. Deterministic,
    applied only inside the sketch (nothing persisted)."""
    import numpy as np

    with np.errstate(over="ignore"):
        h = h.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def _hll_registers(hashes) -> "object":
    """uint64 hash array → (m,) uint8 register maxima (vectorized)."""
    import numpy as np

    hashes = _fmix64(hashes)
    idx = (hashes >> np.uint64(64 - _HLL_P)).astype(np.int64)
    w = (hashes << np.uint64(_HLL_P)).astype(np.uint64)
    # rho = leading zeros of the remaining 64-p bits + 1; w==0 → max rank
    nz = w != 0
    rho = np.full(len(hashes), 64 - _HLL_P + 1, dtype=np.uint8)
    if nz.any():
        # count leading zeros via float64 exponent trick is lossy for 64-bit;
        # use bit_length through log2 on the high 32 bits first, exact since
        # we only need position of the highest set bit
        wnz = w[nz]
        hi = (wnz >> np.uint64(32)).astype(np.uint64)
        lo = (wnz & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        # np.log2 is exact for values < 2^53; both halves are < 2^32
        bl_hi = np.zeros(len(wnz), dtype=np.int64)
        m_hi = hi != 0
        bl_hi[m_hi] = np.floor(np.log2(hi[m_hi].astype(np.float64))).astype(np.int64) + 33
        m_lo = ~m_hi & (lo != 0)
        bl_lo = np.zeros(len(wnz), dtype=np.int64)
        bl_lo[m_lo] = np.floor(np.log2(lo[m_lo].astype(np.float64))).astype(np.int64) + 1
        msb = bl_hi + bl_lo  # 1-indexed position of highest set bit
        rho[nz] = (64 - msb + 1).astype(np.uint8)
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs) -> int:
    import numpy as np

    regs = regs.astype(np.float64)
    est = _HLL_ALPHA * _HLL_M * _HLL_M / np.sum(np.exp2(-regs))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * _HLL_M and zeros:
        est = _HLL_M * np.log(_HLL_M / zeros)  # linear counting
    return int(round(est))


def hll_distinct_per_key(
    ds: "ray.data.Dataset", key: str, value: str, out_col: str = "n_distinct_est"
) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT value) GROUP BY key via a mergeable
    HyperLogLog sketch (p=10, pinned-spec hash64 → fully deterministic):
    each batch emits per-key register arrays (m=1024 bytes, independent of
    batch size), the reduce is an elementwise register MAX per key — the
    scale path when exact per-key dedup would shuffle billions of pairs;
    only (keys × 1 KB) crosses the wire. The reduce groupby runs on
    hash(key) % P buckets (P scheduling units, never one per key — the
    grouped_topk doctrine) with a vectorized per-bucket max-merge. NULL
    values are excluded, matching SQL COUNT(DISTINCT)."""
    import numpy as np

    from ..functions.hashing import hash64

    num_buckets = 32

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_valid(batch.column(value))
        batch = batch.filter(mask)
        kv = batch.column(key).to_pylist()
        if not kv:
            return pa.table(
                {
                    key: pa.array([], batch.schema.field(key).type),
                    "regs": pa.array([], pa.binary()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        hashes = hash64(pc.cast(batch.column(value), pa.string()))
        out_k, out_r = [], []
        order = np.argsort(np.asarray(kv, dtype=object))
        ks = np.asarray(kv, dtype=object)[order]
        hs = hashes[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1], [True]))
        )
        for a, b in zip(bounds[:-1], bounds[1:]):
            out_k.append(ks[a])
            out_r.append(_hll_registers(hs[a:b]).tobytes())
        bucket = (hash64([str(k) for k in out_k]) % num_buckets).astype(np.int64)
        return pa.table(
            {
                key: pa.array(out_k, batch.schema.field(key).type),
                "regs": pa.array(out_r, pa.binary()),
                "bucket": pa.array(bucket),
            }
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sorted key runs + stacked register max
        kv = np.asarray(g.column(key).to_pylist(), dtype=object)
        key_type = g.schema.field(key).type
        if len(kv) == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    out_col: pa.array([], pa.int64()),
                }
            )
        regs = g.column("regs").to_pylist()
        order = np.argsort(kv, kind="stable")
        ks = kv[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1], [True]))
        )
        rows_k, rows_e = [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            stacked = np.stack(
                [
                    np.frombuffer(regs[order[i]], dtype=np.uint8)
                    for i in range(a, b)
                ]
            )
            rows_k.append(ks[a])
            rows_e.append(_hll_estimate(stacked.max(axis=0)))
        return pa.table(
            {
                key: pa.array(rows_k, key_type),
                out_col: pa.array(rows_e, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bucket").map_groups(merge_bucket, batch_format="pyarrow")


def heavy_hitters(
    ds: "ray.data.Dataset",
    key: str,
    phi: float = 0.05,
    sketch_k: int | None = None,
) -> "ray.data.Dataset":
    """EXACT frequent items with frequency > ``phi`` · n, found without
    ever shuffling raw rows: the classic two-phase sketch-then-verify.

    Phase 1 (sketch): each batch collapses to a Misra–Gries summary of
    capacity k = ``sketch_k`` or ceil(2/phi) — vectorized value counts,
    then subtract the (k+1)-th largest count and drop non-positives
    (per-batch undercount ≤ batch_n/(k+1)). Summaries are mergeable by
    plain groupby(key).sum: the merged count undercounts the true count
    by at most n/(k+1) < phi·n/2 in total, so every true heavy hitter
    keeps a summed count > phi·n/2 = the candidate threshold — recall is
    100% by the MG guarantee. At most k keys per block cross the wire.

    Phase 2 (verify): the candidate set (≤ ~2/phi keys) broadcasts via
    ray.put; a second pass filters rows to candidates map-side and exact-
    counts them (partial_count), keeping counts strictly > phi·n. The
    exact pass gives 100% precision — output == SQL GROUP BY ... HAVING.

    Both passes stream; nothing driver-side ever holds more than the
    candidate set. Output: (key, n) for each heavy hitter.
    """
    import math

    import numpy as np

    k = sketch_k or max(1, math.ceil(2.0 / phi))

    def mg_summary(batch: pa.Table) -> pa.Table:
        import polars as pl

        ktype = batch.schema.field(key).type
        df = pl.from_arrow(batch.select([key]))
        counts = df.group_by(key).len(name="cnt").sort(
            ["cnt", key], descending=[True, False]
        )
        n_batch = batch.num_rows
        kept = counts
        if counts.height > k:
            d = counts["cnt"][k]  # (k+1)-th largest
            kept = counts.head(k).with_columns(
                (pl.col("cnt") - d).alias("cnt")
            ).filter(pl.col("cnt") > 0)
            if kept.height == 0:
                # degenerate all-equal batch: keep one zero-count row so
                # batch_n still rides along (cnt=0 adds nothing to sums)
                kept = counts.head(1).with_columns(pl.lit(0).alias("cnt"))
        tbl = kept.to_arrow()
        return pa.table(
            {
                key: tbl.column(key).cast(ktype),
                "cnt": tbl.column("cnt").cast(pa.int64()),
                # ride the batch size along so n = sum(batch_n) needs no
                # second full pass
                "batch_n": pa.array(
                    ([n_batch] + [0] * (tbl.num_rows - 1))[: tbl.num_rows],
                    pa.int64(),
                ),
            }
        )

    summaries = ds.map_batches(mg_summary, batch_format="pyarrow").materialize()
    merged = summaries.groupby(key).sum("cnt")
    n_total = int(
        summaries.aggregate(ray.data.aggregate.Sum("batch_n"))["sum(batch_n)"]
    )
    if n_total == 0:
        return ray.data.from_arrow(
            pa.table({key: pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        )
    cand_thresh = phi * n_total - n_total / (k + 1)

    def cand_mask(batch: pa.Table) -> pa.Table:
        keep = pa.array(
            batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
            > cand_thresh
        )
        return batch.filter(keep)

    cand_tbl = merged.map_batches(cand_mask, batch_format="pyarrow").to_pandas()
    # candidate set is ≤ ~2/phi keys by the MG bound — broadcast once
    cand_ref = ray.put(np.sort(np.asarray(cand_tbl[key].tolist())))

    def count_candidates(batch: pa.Table) -> pa.Table:
        import polars as pl

        cands = ray.get(cand_ref)
        ktype = batch.schema.field(key).type
        vals = batch.column(key).to_numpy(zero_copy_only=False)
        mask = np.isin(vals, cands) if len(vals) else np.array([], bool)
        sub = batch.filter(pa.array(mask))
        df = pl.from_arrow(sub.select([key]))
        out = df.group_by(key).len(name="n").to_arrow()
        return pa.table(
            {
                key: out.column(key).cast(ktype),
                "n": out.column("n").cast(pa.int64()),
            }
        )

    exact = (
        ds.map_batches(count_candidates, batch_format="pyarrow")
        .groupby(key)
        .sum("n")
    )

    def final(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").cast(pa.int64())
        # strict > phi*n against the float threshold (int truncation
        # could admit a borderline key)
        keep = pa.array(n.to_numpy(zero_copy_only=False) > phi * n_total)
        return pa.table({key: batch.column(key), "n": n}).filter(keep)

    return exact.map_batches(final, batch_format="pyarrow")


def rollup_stats(
    ds: "ray.data.Dataset",
    dims: list[str],
    value_col: str,
    all_token: str = "ALL",
) -> "ray.data.Dataset":
    """ROLLUP-style corpus-composition report: one row per grouping level
    of the dimension hierarchy — (d1,…,dk), (d1,…,ALL), …, (ALL,…,ALL) —
    each carrying ``n_rows`` and ``sum_<value_col>``. The training-data
    "what's in this corpus" report (docs and bytes by language × source
    × …), SQL's GROUP BY ROLLUP re-expressed for Ray Data.

    Scale shape — the classic two-level aggregate: ONE distributed
    groupby over the full dimension tuple (Ray's Aggregate combines
    map-side, so only (dims, partials) rows shuffle), producing at most
    Π|dim cardinalities| finest cells; every coarser level is a pure
    fold of those cells, done driver-side on the bounded table and
    returned as a Dataset. Rolled-up dimensions carry ``all_token``
    rather than NULL so the row's level is self-describing (and
    NULL-vs-NaN hash ambiguity never arises downstream).
    """
    import pandas as pd

    sum_col = f"sum_{value_col}"
    finest = ds.groupby(dims).aggregate(
        ray.data.aggregate.Count(alias_name="n_rows"),
        ray.data.aggregate.Sum(value_col, alias_name=sum_col),
    )
    cells = finest.to_pandas()  # ≤ product of dim cardinalities — bounded
    levels = []
    for lvl in range(len(dims), -1, -1):
        g = cells.copy()
        for d in dims[lvl:]:
            g[d] = all_token
        agg = g.groupby(dims, as_index=False).agg(
            n_rows=("n_rows", "sum"), **{sum_col: (sum_col, "sum")}
        )
        levels.append(agg)
    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out[sum_col] = out[sum_col].astype("int64")
    return ray.data.from_pandas(out)


def budget_allocate(
    demands: "ray.data.Dataset",
    budget_expr,
    key_col: str = "host",
    demand_col: str = "demand",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Largest-remainder (Hamilton) apportionment of an integer budget
    across keys, proportional to integer demands — the per-wave crawl
    scheduler's "how many fetch slots does each host get" step (the
    reference schedules per-domain via its semaphore/delay pair,
    async_dispatcher-style, but has no cross-host budget split; this is
    the corpus-scale generalization every polite distributed crawler
    needs).

    alloc_i = floor(B*d_i/T) + 1 for the `leftover` keys with the
    largest remainders (rem DESC, key ASC tie-break), where T = sum(d),
    leftover = B - sum(floor terms). Integer-exact throughout (int64:
    B*d_i must fit — B and T are row counts in practice), satisfies
    lower AND upper quota, so alloc_i <= d_i whenever B <= T.

    ``budget_expr``: either an int or a callable total -> int so the
    budget can scale with the corpus (the oracle mirrors the same
    arithmetic).

    Fully distributed — the demand table never lands on the driver:
    1. T and n via one tiny aggregate.
    2. base/rem map-side (no shuffle); sum(base) via a second tiny
       aggregate gives leftover.
    3. global remainder rank without a global sort: range-bucket by
       descending rem (bucket = ((T-1-rem)*P)//T, monotone), per-bucket
       counts -> driver prefix fold over <= P scalars -> broadcast
       bases, then per-bucket local sort + arange (the pack_sequences
       two-level-scan pattern, stages/packing.py:72).

    Partitioning assumption: one remainder-range bucket of keys fits in
    a worker's heap (keys are hosts — bounded; salt the bucket count up
    for pathological remainder skew).
    """
    import pandas as pd

    tot = demands.aggregate(
        ray.data.aggregate.Sum(demand_col, alias_name="t")
    )
    T = int(tot["t"])
    if T <= 0:
        raise ValueError("budget_allocate: total demand must be positive")
    B = int(budget_expr(T)) if callable(budget_expr) else int(budget_expr)
    if B < 0:
        raise ValueError("budget_allocate: budget must be >= 0")

    def base_rem(batch: pa.Table) -> pa.Table:
        d = batch.column(demand_col).to_numpy(zero_copy_only=False).astype(np.int64)
        base = (B * d) // T
        rem = (B * d) % T
        return pa.table(
            {
                key_col: batch.column(key_col),
                demand_col: pa.array(d, pa.int64()),
                "base": pa.array(base, pa.int64()),
                "rem": pa.array(rem, pa.int64()),
                "rbucket": pa.array(
                    ((T - 1 - rem) * num_buckets) // T, pa.int64()
                ),
            }
        )

    br = demands.map_batches(base_rem, batch_format="pyarrow").materialize()
    sum_base = int(
        br.aggregate(ray.data.aggregate.Sum("base", alias_name="s"))["s"]
    )
    leftover = B - sum_base

    counts = br.groupby("rbucket").count().take_all()
    counts.sort(key=lambda r: r["rbucket"])
    bases: dict[int, int] = {}
    acc = 0
    for row in counts:
        bases[row["rbucket"]] = acc
        acc += row["count()"]
    bases_ref = ray.put(bases)

    def per_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): one sort + rank arithmetic, no pandas
        base_map = ray.get(bases_ref)
        start = base_map[int(g.column("rbucket")[0].as_py())]
        g = g.sort_by([("rem", "descending"), (key_col, "ascending")])
        rnk = start + np.arange(g.num_rows, dtype=np.int64)
        alloc = (
            g.column("base").to_numpy(zero_copy_only=False).astype(np.int64)
            + (rnk < leftover)
        )
        return pa.table(
            {
                key_col: g.column(key_col),
                demand_col: g.column(demand_col).cast(pa.int64()),
                "alloc": pa.array(alloc, pa.int64()),
            }
        )

    return br.groupby("rbucket").map_groups(per_bucket, batch_format="pyarrow")


def bucketed_lookup_join(
    rows: "ray.data.Dataset",
    lookup: "ray.data.Dataset",
    key: str,
    value_col: str,
    out_col: str | None = None,
    num_buckets: int = 32,
    left: bool = False,
) -> "ray.data.Dataset":
    """Broadcast-free lookup join on a STRING (or int) key: attach
    ``lookup``'s ``value_col`` to every row of ``rows`` by ``key``
    without materializing the lookup side anywhere — the r4 alternative
    to a driver-built ``ray.put`` dict when the lookup table grows with
    an unbounded domain (vocabularies, url sets).

    Plan: ONE union + groupby(hash(key) % num_buckets) co-locates each
    key's lookup row with all its probe rows (the pagerank/verify_pairs
    union+bucketed-groupby join shape; Ray's JoinOperator costs ~4 s of
    actor spin-up per call and is avoided throughout this repo); inside
    a bucket the lookup is one sort + searchsorted. Probe keys missing
    from ``lookup`` raise (this repo's joins are referential by
    construction) unless ``left=True``, which null-fills them instead
    (the LEFT variant — r5, powering deleted_interpolation's held-out
    probes whose bigrams may be absent from the train tables).

    Output: ``rows``'s columns + ``out_col`` (default ``value_col``).
    Both sides' other columns must not collide with the marker names
    ``__blj_kind``/``__blj_val``.
    """
    out_col = out_col or value_col
    from ..functions.hashing import hash64

    val_type = None
    for f in lookup.schema().base_schema:
        if f.name == value_col:
            val_type = f.type
    row_cols = [c for c in rows.schema().names if c != key]
    row_types = {}
    sch = rows.schema().base_schema
    for f in sch:
        row_types[f.name] = f.type

    def _bucket_of(col: pa.ChunkedArray) -> pa.Array:
        if pa.types.is_integer(col.type):
            k = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            k = hash64([s or "" for s in col.to_pylist()]).astype(np.uint64)
        return pa.array((k % np.uint64(num_buckets)).astype(np.int64))

    def tag_probe(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "__blj_bucket": _bucket_of(batch.column(key)),
            key: batch.column(key),
            "__blj_kind": pa.array(np.zeros(n, np.int64)),
            "__blj_val": pa.nulls(n, val_type),
        }
        for c in row_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "__blj_bucket": _bucket_of(batch.column(key)),
            key: batch.column(key),
            "__blj_kind": pa.array(np.ones(n, np.int64)),
            "__blj_val": batch.column(value_col),
        }
        for c in row_cols:
            cols[c] = pa.nulls(n, row_types[c])
        return pa.table(cols)

    both = rows.map_batches(tag_probe, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow")
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        kind = g.column("__blj_kind").to_numpy(zero_copy_only=False)
        probe_mask = kind == 0
        probes = g.filter(pa.array(probe_mask))
        lk = g.filter(pa.array(~probe_mask))
        if probes.num_rows == 0:
            cols = {key: pa.array([], g.column(key).type)}
            for c in row_cols:
                cols[c] = pa.array([], row_types[c])
            cols[out_col] = pa.array([], val_type)
            return pa.table(cols)
        lkeys = np.asarray(lk.column(key).to_pylist(), dtype=object)
        order = np.argsort(lkeys, kind="stable")
        lkeys = lkeys[order]
        pkeys = np.asarray(probes.column(key).to_pylist(), dtype=object)
        pos = np.searchsorted(lkeys, pkeys)
        ok = (pos < len(lkeys)) if len(lkeys) else np.zeros(len(pkeys), bool)
        safe_pos = np.minimum(pos, max(len(lkeys) - 1, 0))
        hit = ok & (
            (lkeys[safe_pos] == pkeys)
            if len(lkeys)
            else np.zeros(len(pkeys), bool)
        )
        if not hit.all():
            if not left:
                missing = pkeys[~hit][:3]
                raise KeyError(
                    "bucketed_lookup_join: probe keys missing from lookup: "
                    f"{list(missing)}"
                )
            src = order[safe_pos] if len(lkeys) else np.zeros(len(pkeys), np.int64)
            # take() with a null index yields a null value slot
            idx = pa.array(
                np.where(hit, src, 0), pa.int64(), mask=~hit
            )
            if len(lkeys):
                vals = lk.column("__blj_val").combine_chunks().take(idx)
            else:
                vals = pa.nulls(len(pkeys), val_type)
        else:
            vals = lk.column("__blj_val").take(pa.array(order[pos]))
        cols = {key: probes.column(key)}
        for c in row_cols:
            cols[c] = probes.column(c)
        cols[out_col] = vals
        return pa.table(cols)

    return both.groupby("__blj_bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )

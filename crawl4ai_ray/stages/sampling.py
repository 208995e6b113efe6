"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines sample per-stratum
(per-language / per-source mixing weights) and carve deterministic
train/val/test splits. Both must be (a) exactly reproducible across runs
and engines — no RNG state, a pure function of the row — and (b) map-only
(no shuffle: every row decides its own fate from its id).

The decision function is multiplicative (Knuth) hash bucketing over the
row id: ``bucket(id) = (id * 2654435761 + 12345) % 1000000007 % 10000``.
All intermediates fit in int64, so DuckDB BIGINT arithmetic reproduces it
bit-for-bit — which is what makes these operators oracle-checkable. At
production scale substitute any keyed 64-bit hash (functions/hashing.py)
applied to a stable id; the plumbing is identical.

Reference analogue: crawl4ai has no sampling surface (it is a per-page
crawler); these are the corpus-side operators the build brief adds for
LLM-training pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_MULT = 2654435761
_ADD = 12345
_MOD = 1000000007
_BUCKETS = 10000


def sample_buckets(ids: np.ndarray) -> np.ndarray:
    """Vectorized bucket in [0, 10000) per id — int64-exact."""
    return ((ids.astype(np.int64) * _MULT + _ADD) % _MOD) % _BUCKETS


def stratified_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> "ray.data.Dataset":
    """Keep each row with its stratum's rate, deterministically: row kept
    iff bucket(id) < rate*10000. Map-only — no shuffle, no RNG; the same
    id is kept or dropped identically in every run and on every engine.
    Rates are quantized to 1/10000 (document the granularity, don't hide
    it)."""
    cuts = {k: int(round(r * _BUCKETS)) for k, r in rates.items()}
    default_cut = int(round(default_rate * _BUCKETS))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = sample_buckets(ids)
        strata = batch.column(strata_col).to_pylist()
        thresh = np.fromiter(
            (cuts.get(s, default_cut) for s in strata),
            dtype=np.int64,
            count=len(strata),
        )
        return batch.filter(pa.array(buckets < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def deterministic_split(
    ds: "ray.data.Dataset",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> "ray.data.Dataset":
    """Append a 'split' column — train/val/test — as a pure function of the
    row id: bucket < val → 'val', < val+test → 'test', else 'train'.
    Map-only; a resumed or re-run pipeline assigns every row identically,
    and the val set stays fixed as the corpus grows (new ids land in each
    split in proportion)."""
    val_cut = int(round(val_frac * _BUCKETS))
    test_cut = val_cut + int(round(test_frac * _BUCKETS))

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = sample_buckets(ids)
        split = np.where(
            buckets < val_cut, "val", np.where(buckets < test_cut, "test", "train")
        )
        return batch.append_column(split_col, pa.array(split.tolist(), pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def rebalance_mix(
    ds: "ray.data.Dataset",
    target_bp: dict[str, int],
    total_keep: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Down-sample each stratum so the kept corpus approximates a target
    mix (domain/language rebalancing, the mixing-weights step of
    pretraining curation). ``target_bp`` gives each stratum's target share
    in basis points (sum ≤ 10000); strata absent from it are dropped.

    Two phases: (1) ``groupby(strata).count()`` — a tiny aggregate, one row
    per stratum, folded on the driver into integer per-stratum cuts
    ``cut_s = min(10000, (target_bp_s * total_keep) // count_s)`` — then
    (2) the same map-only deterministic bucket rule as
    ``stratified_sample``. All arithmetic is int64, so a SQL oracle
    reproduces the cuts bit-for-bit; expected kept per stratum is
    ``count_s * cut_s / 10000 ≈ target share × total_keep``, capped at the
    stratum's full size when it is under-represented (a stratum cannot be
    up-sampled — document, don't silently repeat rows)."""
    counts = ds.groupby(strata_col).count().take_all()  # ≤ |strata| rows
    cuts: dict[str, int] = {}
    for row in counts:
        s = row[strata_col]
        c = int(row["count()"])
        bp = int(target_bp.get(s, 0))
        cuts[s] = min(_BUCKETS, (bp * int(total_keep)) // c) if c else 0

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = sample_buckets(ids)
        strata = batch.column(strata_col).to_pylist()
        thresh = np.fromiter(
            (cuts.get(s, 0) for s in strata), dtype=np.int64, count=len(strata)
        )
        return batch.filter(pa.array(buckets < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_sample(
    ds: "ray.data.Dataset",
    k: int = 5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Deterministic FIXED-SIZE sample per stratum: the k rows with the
    smallest Knuth-hash bucket of their id (ties → id) — the exact-k
    complement of the rate-based ``stratified_sample``. Same engine-
    independent decision function, so a SQL window oracle reproduces it.

    Two-level like grouped_topk: map-side partial keep-k per stratum
    (rows beyond the batch's k smallest can never make the global k),
    then ONE groupby on hash(stratum) % num_buckets with an exact
    per-bucket rank. Output (stratum, id, sample_rank)."""
    import pandas as pd

    from ..functions.hashing import hash64

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        strata = batch.column(strata_col).to_pylist()
        bkt = sample_buckets(ids)
        df = pd.DataFrame({strata_col: strata, id_col: ids, "bkt": bkt})
        df = df.sort_values(["bkt", id_col], kind="mergesort").groupby(
            strata_col, sort=False
        ).head(k)
        sh = hash64([str(s) for s in df[strata_col]])
        return pa.table(
            {
                "sbucket": pa.array(
                    (sh % np.uint64(num_buckets)).astype(np.int64)
                ),
                strata_col: pa.array(df[strata_col].tolist(), pa.string()),
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "bkt": pa.array(df["bkt"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): one sort + numpy run-length rank, no pandas
        g = g.sort_by(
            [
                (strata_col, "ascending"),
                ("bkt", "ascending"),
                (id_col, "ascending"),
            ]
        )
        s = np.asarray(g.column(strata_col).to_pylist(), dtype=object)
        n = len(s)
        if n == 0:
            return pa.table(
                {
                    strata_col: pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "sample_rank": pa.array([], pa.int64()),
                }
            )
        idx = np.arange(n, dtype=np.int64)
        new = np.r_[True, s[1:] != s[:-1]]
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - start + 1
        mask = rank <= k
        kept = g.filter(pa.array(mask))
        return pa.table(
            {
                strata_col: kept.column(strata_col),
                id_col: kept.column(id_col),
                "sample_rank": pa.array(rank[mask], pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "sbucket"
    ).map_groups(per_bucket, batch_format="pyarrow")


def token_budget_select(
    ds: "ray.data.Dataset",
    budget: int,
    score_col: str = "quality",
    weight_col: str = "n_tok",
    id_col: str = "doc_id",
    num_bins: int = 64,
) -> "ray.data.Dataset":
    """Greedy token-budget selection: walk the corpus in (score DESC,
    id ASC) order and keep every doc while the running token total stays
    ≤ ``budget`` — the "best docs until the budget is full" curation step
    of a training-data run.

    The running total is a prefix sum over a GLOBAL sort order; like
    ``pack_sequences`` it distributes as a two-level scan, but over
    score-ordered bins instead of id ranges:

    1. map: ``bin = min(num_bins-1, floor(score · num_bins))`` (scores in
       [0,1]; same score ⇒ same bin, so cross-bin order == score order and
       in-bin ties resolve by id). Per-bin weight totals via one tiny
       groupby.
    2. driver: fold bin totals in score-DESC bin order → each bin's base
       offset (O(num_bins) — bounded, not a data loop). Bins whose base
       already ≥ budget can select nothing and are PRUNED MAP-SIDE — at a
       tight budget almost none of the corpus enters the final shuffle.
    3. groupby(bin).map_groups: vectorized (score desc, id) sort + cumsum
       rebased on the bin base; keep rows with cum ≤ budget.

    Output (id, score, weight, cum) for the selected docs. Exact and
    engine-independent: selection depends only on the global order and
    integer cumsum, never on bin granularity; a SQL window oracle
    (SUM() OVER (ORDER BY score DESC, id)) reproduces it bit-for-bit.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    B = int(num_bins)

    def binned(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bins = np.minimum(B - 1, np.floor(s * B).astype(np.int64))
        bins = np.maximum(bins, 0)
        return pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                score_col: pa.array(s, pa.float64()),
                weight_col: pa.array(w, pa.int64()),
            }
        )

    binned_ds = ds.map_batches(binned, batch_format="pyarrow")
    # one tiny aggregate: ≤ num_bins rows reach the driver
    totals = (
        binned_ds.groupby("bin")
        .aggregate(ray.data.aggregate.Sum(weight_col, alias_name="total"))
        .take_all()
    )
    totals.sort(key=lambda r: -r["bin"])  # score-descending bin order
    bases: dict[int, int] = {}
    acc = 0
    for row in totals:
        bases[row["bin"]] = acc
        acc += row["total"]
    live = {b for b, base in bases.items() if base < budget}
    bases_ref = ray.put(bases)

    def prune(batch: pa.Table) -> pa.Table:
        bins = batch.column("bin").to_numpy(zero_copy_only=False)
        mask = np.isin(bins, list(live)) if live else np.zeros(len(bins), bool)
        return batch.filter(pa.array(mask))

    def per_bin(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sort + cumsum + filter, no pandas
        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    score_col: pa.array([], pa.float64()),
                    weight_col: pa.array([], pa.int64()),
                    "cum_tok": pa.array([], pa.int64()),
                }
            )
        base_map = ray.get(bases_ref)
        g = g.sort_by(
            [(score_col, "descending"), (id_col, "ascending")]
        )
        base = base_map[int(g.column("bin")[0].as_py())]
        w = g.column(weight_col).to_numpy(zero_copy_only=False)
        cum = base + w.astype(np.int64).cumsum()
        keep = pa.array(cum <= budget)
        kept = g.filter(keep)
        return pa.table(
            {
                id_col: kept.column(id_col),
                score_col: kept.column(score_col),
                weight_col: kept.column(weight_col),
                "cum_tok": pa.array(
                    cum[cum <= budget].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        binned_ds.map_batches(prune, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(per_bin, batch_format="pyarrow")
    )


def temperature_mix(
    ds: "ray.data.Dataset",
    total_keep: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Temperature-scaled mixture sampling (the multilingual-corpus
    p ∝ c^α rule at α = 1/2): strata are weighted by the SQUARE ROOT of
    their size, flattening the head so low-resource strata keep a larger
    share — the standard alternative to rebalance_mix's explicit target
    table when no hand-tuned mix exists.

    α = 1/2 is the one temperature that stays integer-exact end to end:
    w_s = isqrt(c_s) (floor square root — math.isqrt here,
    FLOOR(SQRT(...)) in the oracle; IEEE sqrt of an integer is correctly
    rounded, so the two agree exactly for c_s < 2^52 — document the
    domain, don't trust it silently), share_bp_s = (w_s * 10000) // Σw,
    cut_s = min(10000, (share_bp_s * total_keep) // c_s). Then the same
    map-only deterministic bucket keep as every sampler in this module.

    Same shuffle shape as rebalance_mix: ONE tiny groupby(strata).count()
    (≤ |strata| rows to the driver), then a pure map — the corpus never
    shuffles.
    """
    import math

    counts = ds.groupby(strata_col).count().take_all()
    sizes = {row[strata_col]: int(row["count()"]) for row in counts}
    assert all(c < 2**52 for c in sizes.values()), "isqrt/SQRT parity domain"
    weights = {s: math.isqrt(c) for s, c in sizes.items()}
    sum_w = sum(weights.values())
    cuts: dict[str, int] = {}
    for s, c in sizes.items():
        if not c or not sum_w:
            cuts[s] = 0
            continue
        share_bp = (weights[s] * _BUCKETS) // sum_w
        cuts[s] = min(_BUCKETS, (share_bp * int(total_keep)) // c)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = sample_buckets(ids)
        strata = batch.column(strata_col).to_pylist()
        thresh = np.fromiter(
            (cuts.get(s, 0) for s in strata), dtype=np.int64, count=len(strata)
        )
        return batch.filter(pa.array(buckets < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def quality_decile_assign(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    tiles: int = 10,
    num_buckets: int = 32,
    carry_cols: tuple = (),
) -> "ray.data.Dataset":
    """Corpus-wide NTILE(tiles) over (integer quality score, id) WITHOUT
    a global sort: score = stopwords·1000 // tokens is bounded in
    [0, 1000·max_density], so a counting-sort does the ranking — one
    groupby(score).count (≤ ~1001 rows) collected and broadcast as
    cumulative start ranks, then an intra-score enumeration by id
    inside ONE hash(score) % P shuffle closes the exact global rank.
    Deciles follow SQL NTILE's first-rem-tiles-get-one-extra rule.
    Returns (id_col, score, decile, *carry_cols); the corpus rows
    shuffle once — ``carry_cols`` (e.g. the text for a curriculum
    export) ride that single shuffle instead of a join-back.

    Shared by the quality_deciles query and the webtext pipeline's
    curriculum stage — one implementation, one oracle."""
    from . import textstats

    def score_batch(batch: pa.Table) -> pa.Table:
        t = textstats.quality_counts_batch(
            pa.table(
                {
                    "doc_id": batch.column(id_col),
                    "text": batch.column(text_col),
                }
            )
        )
        stop = t.column("n_stop").to_numpy().astype(np.int64)
        tok = t.column("n_tokens").to_numpy().astype(np.int64)
        score = (stop * 1000) // np.maximum(tok, 1)
        cols = {
            id_col: batch.column(id_col),
            "score": pa.array(score, pa.int64()),
        }
        for c in carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    scored = ds.map_batches(score_batch, batch_format="pyarrow").materialize()

    hist = scored.groupby("score").count().take_all()
    hist.sort(key=lambda r: r["score"])
    starts, acc = {}, 0
    for r in hist:
        starts[int(r["score"])] = acc
        acc += int(r["count()"])
    n_total = acc
    starts_ref = ray.put(starts)
    P = num_buckets
    q, rem = divmod(n_total, tiles)

    def tag(batch: pa.Table) -> pa.Table:
        s = batch.column("score").to_numpy(zero_copy_only=False)
        cols = {
            "bucket": pa.array((s % P).astype(np.int64)),
            id_col: batch.column(id_col),
            "score": batch.column("score"),
        }
        for c in carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def rank_and_tile(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sort + numpy run-length global rank
        if g.num_rows == 0:
            cols = {
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
                "decile": pa.array([], pa.int64()),
            }
            for c in carry_cols:
                cols[c] = pa.array([], pa.string())
            return pa.table(cols)
        st = ray.get(starts_ref)
        g = g.sort_by([("score", "ascending"), (id_col, "ascending")])
        s = g.column("score").to_numpy(zero_copy_only=False).astype(np.int64)
        runs = np.r_[True, s[1:] != s[:-1]]
        run_start = np.maximum.accumulate(np.where(runs, np.arange(len(s)), 0))
        intra = np.arange(len(s)) - run_start
        rank = np.array([st[x] for x in s], np.int64) + intra
        if rem:
            tile = np.where(
                rank < rem * (q + 1),
                rank // (q + 1),
                rem + (rank - rem * (q + 1)) // max(q, 1),
            )
        else:
            tile = rank // max(q, 1)
        cols = {
            id_col: g.column(id_col),
            "score": pa.array(s, pa.int64()),
            "decile": pa.array(tile + 1, pa.int64()),
        }
        for c in carry_cols:
            cols[c] = g.column(c)
        return pa.table(cols)

    return (
        scored.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_and_tile, batch_format="pyarrow")
    )


def weighted_sample_es(
    ds: "ray.data.Dataset",
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "w",
) -> "ray.data.Dataset":
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement: draw k
    rows where row i wins with probability proportional to its weight,
    deterministically — the standard one-pass distributed scheme (E-S
    2006: assign key_i = u_i^(1/w_i), keep the k largest; equivalently,
    as here, key_i = -ln(u_i)/w_i, keep the k smallest).

    u_i is a pure function of the row id — a 32-bit md5 slice mapped to
    (0, 1] — so the sample is reproducible across runs/engines and the
    whole operator is oracle-checkable (DuckDB recomputes md5/ln/division
    operand-for-operand; ln goes through scalar ``math.log`` here because
    numpy's SIMD log is not bit-equal to libm, NOTES_r3).

    Plan: one map_batches computes keys and prunes each batch to its
    local k smallest (argpartition) — so at most k rows per block ever
    shuffle — then a global sort(es_key)+limit(k). Weights never move; a
    10^10-row corpus ships O(k · n_blocks) rows total.

    Scale note: the md5-per-id loop is the SQL-mirror choice (~1 µs/row);
    for non-oracled production use swap in the vectorized splitmix64 from
    functions/hashing.py — the plumbing is identical.
    """
    import hashlib
    import math

    def keyed_local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.empty(len(ids), np.float64)
        for i, d in enumerate(ids):
            h = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
            # mirror of the SQL: -ln((h+1.0)/2^32) / w  — scalar libm log
            keys[i] = -math.log((h + 1.0) / 4294967296.0) / float(w[i])
        if len(keys) > k:
            sel = np.argpartition(keys, k)[:k]
        else:
            sel = np.arange(len(keys))
        return pa.table(
            {
                id_col: pa.array(
                    np.asarray(ids, dtype=np.int64)[sel], pa.int64()
                ),
                weight_col: pa.array(w[sel], pa.int64()),
                "es_key": pa.array(keys[sel], pa.float64()),
            }
        )

    return ds.map_batches(keyed_local_topk, batch_format="pyarrow").sort(
        "es_key"
    ).limit(k)

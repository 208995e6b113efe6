"""Link-graph analytics: distributed PageRank over the crawl's link graph.

The reference has no graph operator (its link graph exists only as per-page
`links` lists), but page-authority scoring is a standard step of a
web-scale training-data pipeline (URL-quality priors for frontier scoring
and corpus filtering).

Plan shape (per iteration, bulk-synchronous):
  1. tag ranks with bucket = node % P and union with the (pre-bucketed,
     materialized-once) edge table; ONE groupby(bucket) co-locates every
     edge with its source's rank — the same union+groupby hash-join
     replacement used by stages/dedup.verify_pairs and windows.asof_join.
     Ray 2.49's dedicated JoinOperator costs ~4 s of actor-pool spin-up
     PER CALL (measured r3) and crashes when chained over empty shuffle
     partitions, so the groupby form is both faster and sturdier.
  2. inside each bucket: vectorized src→rank lookup, contribution
     val = rank * (1/outdeg), partial-aggregated by dst MAP-SIDE so only
     (dst, partial_sum) rows shuffle,
  3. ONE groupby(dst).sum (unioned with a zeros row per node so sink
     nodes keep a row), then rank = (1-d)/N + d·sum.

Two all-to-alls per iteration — the unavoidable pair — with the rank
table materialized between iterations to keep lineage flat. The edge
table ships only (bucket, src, dst, w); out-degree is baked in as
w = 1/outdeg once. Nothing is ever collected on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _label_sum(ds):
    """Exact label sum as an (upper-31-bits, lower-31-bits, ROW COUNT)
    TRIPLE — the convergence scalar for both min-label propagation
    loops. Summing raw labels overflows int64 (BFS sentinel 2^62 ×
    nodes — observed as Ray's pickled-object fallback in the r3 sweep;
    CC node-id labels get there at ~1e9 nodes too). Each half-sum stays
    < 2^62 for any n < 2^31, and the pair determines the true sum
    (sum = hi·2^31 + lo), so pair equality IS sum equality.

    The row count is part of the quiescence test: existing labels only
    ever DECREASE, but a dangling edge endpoint JOINING the label table
    ADDS a positive label — a join and a decrease in the same sweep can
    leave the sum unchanged (observed: chain 99–1–0 with 99 undeclared
    stopped one sweep early and kept 99 at its neighbor's stale label,
    r3 tenth-session dual-path parity catch). With the count included:
    no-join sweeps have strictly decreasing sums until fixpoint, and
    join sweeps change the count — (sum, count) equality is EXACT
    quiescence."""

    def halves(b: pa.Table) -> pa.Table:
        lbl = b.column("lbl").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "hi": pa.array([int((lbl >> np.int64(31)).sum())], pa.int64()),
                "lo": pa.array(
                    [int((lbl & np.int64((1 << 31) - 1)).sum())], pa.int64()
                ),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = ds.map_batches(halves, batch_format="pyarrow")
    return (agg.sum("hi"), agg.sum("lo"), agg.sum("n"))


def pagerank(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    n_iters: int = 5,
    damping: float = 0.85,
    num_partitions: int = 16,
    round_to: int | None = 8,
    seeds: "list[int] | None" = None,
    small_threshold: int = 50_000,
) -> "ray.data.Dataset":
    """PageRank over (node:int64) / (src:int64, dst:int64, w:float64)
    where w = 1/outdeg(src). Returns (node, rank). ``round_to`` rounds the
    final ranks so float summation order (Ray vs any oracle) can't flip
    the last bits.

    ``seeds`` switches to PERSONALIZED PageRank (random walk with
    restart): teleport mass (1−d) goes only to the seed set (1/|S| each)
    instead of uniformly — authority relative to the crawl's seed list,
    the score a seed-focused frontier wants (topic-local priority rather
    than global popularity). Init = the teleport vector. Seeds are a
    driver-side list (the seed list is budget-bounded by construction)
    broadcast into the finish map.

    ``small_threshold``: when BOTH |nodes| and |edges| fit under it, the
    graph is collected once and iterated locally (identical arithmetic,
    same final ROUND) instead of paying the fixed per-iteration shuffle
    cost — the random_walks broadcast-adjacency pattern. Host-level
    graphs and sampled subgraphs live here; page-level web graphs don't
    (the distributed path is unchanged). Dual-path parity is test-locked;
    pass 0 to force the distributed path."""
    n = nodes.count()
    P = num_partitions
    seed_arr = None
    if seeds is not None:
        seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), np.int64)
        n_seeds = len(seed_arr)
    base = (1.0 - damping) / n  # uniform-teleport path

    if n <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            ndf = nodes.to_pandas()
            edf = edges.to_pandas()
            nd = np.sort(ndf["node"].to_numpy(dtype=np.int64))
            es = edf["src"].to_numpy(dtype=np.int64)
            ed = edf["dst"].to_numpy(dtype=np.int64)
            # dangling endpoints evolve the rank-table membership sweep
            # by sweep in the distributed plan; don't replicate that
            # here — fall through to the authoritative distributed path
            if np.isin(es, nd).all() and np.isin(ed, nd).all():
                si = np.searchsorted(nd, es)
                di = np.searchsorted(nd, ed)
                w = edf["w"].to_numpy(dtype=np.float64)
                if seed_arr is None:
                    r = np.full(n, 1.0 / n)
                    b_vec = base
                else:
                    is_seed = np.isin(nd, seed_arr)
                    r = np.where(is_seed, 1.0 / n_seeds, 0.0)
                    b_vec = np.where(
                        is_seed, (1.0 - damping) / n_seeds, 0.0
                    )
                for _ in range(n_iters):
                    s = np.zeros(n, np.float64)
                    np.add.at(s, di, w * r[si])
                    r = b_vec + damping * s
                if round_to is not None:
                    r = np.round(r, round_to)
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(nd, pa.int64()),
                            "rank": pa.array(r, pa.float64()),
                        }
                    )
                )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "w": batch.column("w"),
                "rank": pa.nulls(batch.num_rows, pa.float64()),
            }
        )

    edges_t = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    zeros = nodes.map_batches(
        lambda b: pa.table(
            {
                "dst": b.column("node"),
                "val": pa.array(np.zeros(b.num_rows), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        if seed_arr is None:
            r0 = np.full(b.num_rows, 1.0 / n)
        else:  # init = the teleport distribution: 1/|S| on seeds, else 0
            node = b.column("node").to_numpy(zero_copy_only=False)
            r0 = np.where(np.isin(node, seed_arr), 1.0 / n_seeds, 0.0)
        return pa.table(
            {"node": b.column("node"), "rank": pa.array(r0, pa.float64())}
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def tag_ranks(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        nr = batch.num_rows
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "src": batch.column("node"),
                "dst": pa.nulls(nr, pa.int64()),
                "w": pa.nulls(nr, pa.float64()),
                "rank": batch.column("rank"),
            }
        )

    def bucket_contrib(g: pa.Table) -> pa.Table:
        """One vectorized pass per hash bucket: src→rank lookup for the
        bucket's edges, then a LOCAL partial sum by dst (map-side combine
        — only (dst, partial) leaves the bucket). Arrow-native (r5):
        sorted-src searchsorted lookup + np.unique/bincount fold."""
        is_rank = np.asarray(g.column("dst").is_null())
        empty = pa.table(
            {"dst": pa.array([], pa.int64()), "val": pa.array([], pa.float64())}
        )
        if (~is_rank).sum() == 0:
            return empty
        src = g.column("src").to_numpy(zero_copy_only=False)
        rank = g.column("rank").to_numpy(zero_copy_only=False)
        rs = src[is_rank].astype(np.int64)
        rv = rank[is_rank].astype(np.float64)
        order = np.argsort(rs, kind="stable")
        rs, rv = rs[order], rv[order]
        es = src[~is_rank].astype(np.int64)
        ed = g.column("dst").to_numpy(zero_copy_only=False)[~is_rank].astype(
            np.int64
        )
        ew = g.column("w").to_numpy(zero_copy_only=False)[~is_rank].astype(
            np.float64
        )
        loc = np.searchsorted(rs, es)
        safe = np.minimum(loc, max(len(rs) - 1, 0))
        hit = (rs[safe] == es) if len(rs) else np.zeros(len(es), bool)
        vals = ew * np.where(hit, rv[safe] if len(rs) else 0.0, 0.0)
        uds, inv = np.unique(ed, return_inverse=True)
        part = np.bincount(inv, weights=vals, minlength=len(uds))
        return pa.table(
            {
                "dst": pa.array(uds, pa.int64()),
                "val": pa.array(part, pa.float64()),
            }
        )

    for _ in range(n_iters):
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow")
        contribs = (
            edges_t.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_contrib, batch_format="pyarrow")
        )
        sums = contribs.union(zeros).groupby("dst").sum("val")

        def finish(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column("sum(val)"), dtype=np.float64)
            if seed_arr is None:
                b_vec = base
            else:  # teleport mass only to the seed set
                node = batch.column("dst").to_numpy(zero_copy_only=False)
                b_vec = np.where(
                    np.isin(node, seed_arr), (1.0 - damping) / n_seeds, 0.0
                )
            return pa.table(
                {
                    "node": batch.column("dst"),
                    "rank": pa.array(b_vec + damping * s, pa.float64()),
                }
            )

        # bound the rank table to P blocks: each Aggregate emits blocks
        # proportional to its INPUT block count, so without this the
        # union input grows by ~|input blocks| every iteration and
        # per-iteration wall time climbs superlinearly (measured r3:
        # 2.6→5.4 s/iter over 5 iterations at 500 nodes)
        ranks = (
            sums.map_batches(finish, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

    if round_to is None:
        return ranks
    return ranks.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "rank": pa.array(
                    np.round(np.asarray(b.column("rank")), round_to), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def connected_components(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    num_partitions: int = 16,
    max_iters: int = 50,
    small_threshold: int = 200_000,
) -> "ray.data.Dataset":
    """Connected components by distributed min-label propagation WITH
    convergence detection — the iterate-until-fixpoint shape (PageRank
    above runs a fixed count; this one must notice quiescence). Per
    iteration: propagate each node's label across (undirected) edges via
    the same union+bucketed-groupby plan as pagerank, take the min of
    (own label, neighbor labels) per node, then ONE tiny aggregate —
    count of changed labels — decides termination on the driver. Labels
    are node ids, so the fixpoint is min-node-id per component; with a
    hub/star topology per component it converges in 2-3 sweeps.
    Returns (node:int64, component:int64). Edge endpoints absent from
    ``nodes`` (dangling links) can't seed a label of their own but DO
    join the output once a neighbor's label reaches them — they are, by
    construction, connected; callers needing exactly the declared node
    set should filter the result."""
    P = num_partitions

    # small-graph broadcast fast path (the pagerank / multi_source_bfs
    # pattern): exact integer min-fixpoint → a local run is bit-identical
    # to the distributed one. Dual-path parity is test-locked;
    # small_threshold=0 forces the distributed path.
    if small_threshold and nodes.count() <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            _SENT = np.iinfo(np.int64).max
            node_arr = np.sort(
                nodes.to_pandas()["node"].to_numpy(dtype=np.int64)
            )
            edf = edges.to_pandas()
            s0 = edf["src"].to_numpy(dtype=np.int64)
            d0 = edf["dst"].to_numpy(dtype=np.int64)
            src = np.concatenate([s0, d0])  # symmetric, like `und` below
            dst = np.concatenate([d0, s0])
            nd = np.union1d(node_arr, np.union1d(src, dst))
            lbl = np.where(np.isin(nd, node_arr), nd, _SENT)
            si = np.searchsorted(nd, src)
            di = np.searchsorted(nd, dst)
            for _ in range(max_iters):
                new = lbl.copy()
                m = lbl[si] != _SENT
                np.minimum.at(new, di[m], lbl[si][m])
                if np.array_equal(new, lbl):
                    break
                lbl = new
            else:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iters} "
                    "sweeps (component diameter exceeds max_iters — raise "
                    "max_iters; min-label propagation moves one hop per "
                    "sweep)"
                )
            keep = lbl != _SENT
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(nd[keep], pa.int64()),
                        "component": pa.array(lbl[keep], pa.int64()),
                    }
                )
            )

    und = edges.map_batches(
        lambda b: pa.table(
            {
                "src": pa.chunked_array(
                    [pa.concat_arrays([c.combine_chunks() for c in (b.column("src"), b.column("dst"))])]
                ),
                "dst": pa.chunked_array(
                    [pa.concat_arrays([c.combine_chunks() for c in (b.column("dst"), b.column("src"))])]
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "lbl": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    edges_t = und.map_batches(tag_edges, batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda b: pa.table({"node": b.column("node"), "lbl": b.column("node")}),
        batch_format="pyarrow",
    ).materialize()

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        nr = batch.num_rows
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "src": batch.column("node"),
                "dst": pa.nulls(nr, pa.int64()),
                "lbl": batch.column("lbl"),
            }
        )

    def bucket_min(g: pa.Table) -> pa.Table:
        """Per bucket: candidate labels for each edge target = source's
        current label; plus every node's own label — partial min by
        node. Arrow-native (r5): sorted-src lookup + np.minimum.at."""
        is_lbl = np.asarray(g.column("dst").is_null())
        src = g.column("src").to_numpy(zero_copy_only=False)
        lbl = g.column("lbl").to_numpy(zero_copy_only=False)
        ls = src[is_lbl].astype(np.int64)
        lv = lbl[is_lbl].astype(np.int64)
        order = np.argsort(ls, kind="stable")
        ls_s, lv_s = ls[order], lv[order]
        cand_n = [ls]
        cand_l = [lv]
        es = src[~is_lbl].astype(np.int64)
        if len(es):
            ed = g.column("dst").to_numpy(zero_copy_only=False)[
                ~is_lbl
            ].astype(np.int64)
            loc = np.searchsorted(ls_s, es)
            safe = np.minimum(loc, max(len(ls_s) - 1, 0))
            # a dangling src (edge endpoint absent from the node set) has
            # no label this sweep — drop those candidates
            ok = (ls_s[safe] == es) if len(ls_s) else np.zeros(len(es), bool)
            if ok.any():
                cand_n.append(ed[ok])
                cand_l.append(lv_s[safe[ok]])
        nodes_all = np.concatenate(cand_n)
        lbls_all = np.concatenate(cand_l)
        un, inv = np.unique(nodes_all, return_inverse=True)
        part = np.full(len(un), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(part, inv, lbls_all)
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "lbl": pa.array(part, pa.int64()),
            }
        )


    # convergence: labels only ever DECREASE, so sum(lbl) is strictly
    # monotone until the fixpoint — equality of consecutive sweep sums is
    # exact quiescence. prev_sum carries over so each sweep pays ONE
    # labels pass, not two.
    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iters):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        new_labels = (
            edges_t.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_min, batch_format="pyarrow")
            .groupby("node")
            .min("lbl")
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column("node"),
                        "lbl": b.column("min(lbl)").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(P)
            .materialize()
        )
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} sweeps "
            "(component diameter exceeds max_iters — raise max_iters; min-"
            "label propagation moves one hop per sweep)"
        )

    return labels.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "component": b.column("lbl")}
        ),
        batch_format="pyarrow",
    )


def label_propagation(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    seeds: "dict[int, int]",
    n_sweeps: int = 4,
    num_partitions: int = 16,
    small_threshold: int = 200_000,
) -> "ray.data.Dataset":
    """Semi-supervised label propagation (the classic LPA of Raghavan et
    al. 2007 in its seeded form): ``seeds`` maps node → community label;
    each synchronous sweep every non-seed node adopts the MODE of its
    in-neighbors' current labels (ties → smallest label), seeds are
    clamped, nodes whose neighbors are all unlabeled keep their previous
    label. Exactly ``n_sweeps`` sweeps — mode-voting has no monotone
    invariant to detect quiescence cheaply (unlike connected_components'
    min-label), and a FIXED sweep count is what the unrolled SQL oracle
    replays. Returns (node, community) for nodes labeled by then.

    The third member of the propagation family, with genuinely different
    semantics: connected_components = min-label fixpoint (reachability),
    multi_source_bfs = lexicographic (dist, seed) min (nearest seed),
    this = per-sweep majority vote (community structure — a node
    surrounded by B-voters joins B even if an A-seed is nearer).

    Per sweep, the pagerank plan shape (two bounded all-to-alls):
      1. labels ∪ edges co-located by hash(src) % P — per bucket the
         labeled-src lookup emits (dst, lbl, partial_count), combined
         map-side so only distinct (dst, lbl) partials shuffle;
      2. partials ∪ current-label rows co-located by hash(node) % P —
         per bucket sum partials, argmax with the (count DESC, lbl ASC)
         tie rule, clamp seeds, coalesce to the previous label.
    Labels ride as float64 (NaN = unlabeled) inside the pandas buckets —
    community ids are small ints, exact well below 2^53."""
    P = num_partitions
    seed_map = {int(k): int(v) for k, v in seeds.items()}
    if not seed_map:
        raise ValueError("label_propagation needs at least one seed")

    # small-graph broadcast fast path (pagerank/BFS/CC pattern): the
    # vote counts are exact integers and the (count DESC, lbl ASC) tie
    # rule is deterministic, so a local run is bit-identical to the
    # distributed sweeps. Dual-path parity test-locked; pass 0 to force
    # the distributed path.
    if small_threshold and nodes.count() <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            node_arr = np.sort(
                nodes.to_pandas()["node"].to_numpy(dtype=np.int64)
            )
            n = len(node_arr)
            edf = edges.to_pandas()
            src = edf["src"].to_numpy(dtype=np.int64)
            dst = edf["dst"].to_numpy(dtype=np.int64)
            # only declared endpoints vote / receive votes (the
            # distributed resolve keys on the declared label rows)
            declared = np.isin(src, node_arr) & np.isin(dst, node_arr)
            si = np.searchsorted(node_arr, src[declared])
            di = np.searchsorted(node_arr, dst[declared])
            lbl = np.full(n, np.nan)
            sk = np.fromiter(seed_map.keys(), np.int64, len(seed_map))
            sv = np.fromiter(seed_map.values(), np.int64, len(seed_map))
            pos = np.searchsorted(node_arr, sk)
            ok = (pos < n) & (node_arr[np.minimum(pos, n - 1)] == sk)
            lbl[pos[ok]] = sv[ok].astype(np.float64)
            clamped = np.zeros(n, bool)
            clamped[pos[ok]] = True
            for _ in range(n_sweeps):
                m = ~np.isnan(lbl[si])
                if not m.any():
                    continue
                vt = pd.DataFrame(
                    {"node": di[m], "lbl": lbl[si][m]}
                )
                tot = (
                    vt.groupby(["node", "lbl"], sort=True)
                    .size()
                    .reset_index(name="c")
                    .sort_values(
                        ["node", "c", "lbl"],
                        ascending=[True, False, True],
                        kind="mergesort",
                    )
                )
                mode = tot.groupby("node", sort=True).first()["lbl"]
                new = lbl.copy()
                idx = mode.index.to_numpy(dtype=np.int64)
                upd = ~clamped[idx]
                new[idx[upd]] = mode.to_numpy()[upd]
                lbl = new
            keep = ~np.isnan(lbl)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(node_arr[keep], pa.int64()),
                        "community": pa.array(
                            lbl[keep].astype(np.int64), pa.int64()
                        ),
                    }
                )
            )

    seeds_ref = ray.put(seed_map)

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "lbl": pa.nulls(batch.num_rows, pa.float64()),
            }
        )

    edges_t = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        sm = ray.get(seeds_ref)
        node = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = np.array([float(sm[n]) if n in sm else np.nan for n in node])
        return pa.table(
            {"node": b.column("node"), "lbl": pa.array(lbl, pa.float64())}
        )

    labels = nodes.map_batches(init_labels, batch_format="pyarrow").materialize()

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "src": batch.column("node"),
                "dst": pa.nulls(batch.num_rows, pa.int64()),
                "lbl": batch.column("lbl"),
            }
        )

    def bucket_votes(g: pa.Table) -> pa.Table:
        """Per src bucket: labeled-src lookup, then a LOCAL (dst, lbl)
        partial count — only distinct pairs leave the bucket.
        Arrow-native (r5): sorted-src lookup + pair-unique counts."""
        is_lbl = np.asarray(g.column("dst").is_null())
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "lbl": pa.array([], pa.float64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if (~is_lbl).sum() == 0:
            return empty
        src = g.column("src").to_numpy(zero_copy_only=False)
        lbl = g.column("lbl").to_numpy(zero_copy_only=False)
        ls = src[is_lbl].astype(np.int64)
        lv = lbl[is_lbl].astype(np.float64)
        order = np.argsort(ls, kind="stable")
        ls_s, lv_s = ls[order], lv[order]
        es = src[~is_lbl].astype(np.int64)
        ed = g.column("dst").to_numpy(zero_copy_only=False)[~is_lbl].astype(
            np.int64
        )
        loc = np.searchsorted(ls_s, es)
        safe = np.minimum(loc, max(len(ls_s) - 1, 0))
        hit = (ls_s[safe] == es) if len(ls_s) else np.zeros(len(es), bool)
        src_lbl = lv_s[safe] if len(ls_s) else np.zeros(len(es))
        ok = hit & ~np.isnan(src_lbl)
        if not ok.any():
            return empty
        n_ok = ed[ok]
        l_ok = src_lbl[ok]
        o2 = np.lexsort((l_ok, n_ok))
        n_s, l_s = n_ok[o2], l_ok[o2]
        newrun = np.r_[True, (n_s[1:] != n_s[:-1]) | (l_s[1:] != l_s[:-1])]
        run_id = np.cumsum(newrun) - 1
        counts = np.bincount(run_id)
        return pa.table(
            {
                "node": pa.array(n_s[newrun], pa.int64()),
                "lbl": pa.array(l_s[newrun], pa.float64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        """Per node bucket: sum vote partials per (node, lbl), argmax
        with ties to the smallest label, clamp seeds, else keep prev.
        Arrow-native (r5): lexsorted runs replace the pandas folds."""
        sm = ray.get(seeds_ref)
        c_null = np.asarray(g.column("c").is_null())
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = g.column("lbl").to_numpy(zero_copy_only=False).astype(np.float64)
        pn = node[c_null]
        pl = lbl[c_null]
        po = np.argsort(pn, kind="stable")
        pn, pl = pn[po], pl[po]
        out = pl.copy()
        if (~c_null).any():
            vn = node[~c_null]
            vl = lbl[~c_null]
            vc = g.column("c").to_numpy(zero_copy_only=False)[~c_null].astype(
                np.int64
            )
            o2 = np.lexsort((vl, vn))
            vn_s, vl_s = vn[o2], vl[o2]
            newrun = np.r_[
                True, (vn_s[1:] != vn_s[:-1]) | (vl_s[1:] != vl_s[:-1])
            ]
            run_id = np.cumsum(newrun) - 1
            tot = np.bincount(run_id, weights=vc[o2].astype(np.float64))
            mn = vn_s[newrun]
            ml = vl_s[newrun]
            # per node: argmax by (c desc, lbl asc); up is sorted by
            # (node, lbl) asc so a stable lexsort on (-c) within node
            # keeps lbl-asc tiebreak
            sel = np.lexsort((ml, -tot, mn))
            mn_s = mn[sel]
            first = np.r_[True, mn_s[1:] != mn_s[:-1]]
            win_n = mn_s[first]
            win_l = ml[sel][first]
            # adopt for non-seed nodes present in prev
            seed_arr2 = np.fromiter(sm.keys(), dtype=np.int64, count=len(sm))
            adopt = ~np.isin(win_n, seed_arr2)
            win_n, win_l = win_n[adopt], win_l[adopt]
            loc = np.searchsorted(pn, win_n)
            safe = np.minimum(loc, max(len(pn) - 1, 0))
            okm = (pn[safe] == win_n) if len(pn) else np.zeros(len(win_n), bool)
            out[safe[okm]] = win_l[okm]
        return pa.table(
            {
                "node": pa.array(pn, pa.int64()),
                "lbl": pa.array(out, pa.float64()),
            }
        )

    def tag_prev(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "node": batch.column("node"),
                "lbl": batch.column("lbl"),
                "c": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    for _ in range(n_sweeps):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        partials = (
            edges_t.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_votes, batch_format="pyarrow")
            .map_batches(
                # same column ORDER as tag_prev — union requires it
                lambda b: pa.table(
                    {
                        "bucket": pa.array(
                            (
                                b.column("node").to_numpy(zero_copy_only=False)
                                % P
                            ).astype(np.int64)
                        ),
                        "node": b.column("node"),
                        "lbl": b.column("lbl"),
                        "c": b.column("c"),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        labels = (
            partials.union(
                labels.map_batches(tag_prev, batch_format="pyarrow")
            )
            .groupby("bucket")
            .map_groups(resolve, batch_format="pyarrow")
            .repartition(P)
            .materialize()
        )

    def finish(batch: pa.Table) -> pa.Table:
        lbl = batch.column("lbl").to_numpy(zero_copy_only=False)
        keep = ~np.isnan(lbl)
        return pa.table(
            {
                "node": pa.array(
                    batch.column("node").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "community": pa.array(lbl[keep].astype(np.int64), pa.int64()),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow")


_BFS_HOP = np.int64(1) << np.int64(32)  # one hop in the packed (dist, seed) key
_BFS_UNREACHED = np.int64(1) << np.int64(62)  # sentinel: no seed reached yet


def multi_source_bfs(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    seeds: "list[int]",
    num_partitions: int = 16,
    max_iters: int = 50,
    small_threshold: int = 200_000,
) -> "ray.data.Dataset":
    """Multi-source BFS over the DIRECTED graph (node:int64) /
    (src:int64, dst:int64): every reachable node gets its hop distance
    from the nearest seed and the id of that seed (ties broken by lowest
    seed id) — the "which hub owns this page" Voronoi partition of the
    link graph, and the graph-analytics twin of the crawl's bfs_depth.
    Returns (node, dist, seed); unreachable nodes are omitted.

    One label per node, PACKED into a single int64:
    ``lbl = dist·2^32 + seed`` — minimizing the packed key IS the
    lexicographic (dist, seed) minimum, so the whole algorithm is the
    min-label-propagation plan of ``connected_components`` (union +
    ONE groupby(hash(node) % P) per sweep, map-side partial mins, two
    bounded all-to-alls) with one twist: a candidate pushed across an
    edge is ``src_lbl + 2^32`` (one more hop, seed preserved in the low
    bits). Seeds init at ``seed_id`` (dist 0), everything else at a
    large sentinel that never survives a min against a real label.
    Convergence = equality of consecutive sum(lbl) sweeps — labels only
    ever decrease, so the sum is strictly monotone until fixpoint
    (same exact-quiescence argument as connected_components).

    Seed ids must fit in 32 bits (asserted); node count and diameter
    are otherwise unbounded. Unreachable nodes keep the sentinel and
    are filtered at the end, so the output is exactly the reachable
    set."""
    P = num_partitions
    seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), np.int64)
    if len(seed_arr) == 0:
        raise ValueError("multi_source_bfs needs at least one seed")
    if seed_arr.min() < 0 or seed_arr.max() >= (1 << 32):
        raise ValueError("seed ids must fit in uint32 for the packed label")

    # small-graph broadcast fast path (the random_walks / pagerank
    # pattern): the label propagation is EXACT integer min-fixpoint, so
    # a local run is bit-identical to the distributed one by
    # construction. Dual-path parity is test-locked; small_threshold=0
    # forces the distributed path.
    if small_threshold and nodes.count() <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            node_arr = np.sort(
                nodes.to_pandas()["node"].to_numpy(dtype=np.int64)
            )
            edf = edges.to_pandas()
            src = edf["src"].to_numpy(dtype=np.int64)
            dst = edf["dst"].to_numpy(dtype=np.int64)
            # reached non-list dsts surface in the distributed label
            # table too (bucket_min creates their rows) — mirror that
            nd = np.union1d(node_arr, np.union1d(src, dst))
            lbl = np.where(
                np.isin(nd, seed_arr) & np.isin(nd, node_arr),
                nd,
                _BFS_UNREACHED,
            )
            si = np.searchsorted(nd, src)
            di = np.searchsorted(nd, dst)
            for _ in range(max_iters):
                new = lbl.copy()
                m = lbl[si] < _BFS_UNREACHED
                np.minimum.at(new, di[m], lbl[si][m] + _BFS_HOP)
                if np.array_equal(new, lbl):
                    break
                lbl = new
            else:
                raise RuntimeError(
                    f"multi_source_bfs did not converge in {max_iters} "
                    "sweeps (graph diameter exceeds max_iters — raise "
                    "max_iters)"
                )
            keep = lbl < _BFS_UNREACHED
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(nd[keep], pa.int64()),
                        "dist": pa.array(lbl[keep] >> np.int64(32), pa.int64()),
                        "seed": pa.array(
                            lbl[keep] & np.int64(0xFFFFFFFF), pa.int64()
                        ),
                    }
                )
            )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "lbl": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    edges_t = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = np.where(np.isin(node, seed_arr), node, _BFS_UNREACHED)
        return pa.table(
            {"node": b.column("node"), "lbl": pa.array(lbl, pa.int64())}
        )

    labels = nodes.map_batches(init_labels, batch_format="pyarrow").materialize()

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        nr = batch.num_rows
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "src": batch.column("node"),
                "dst": pa.nulls(nr, pa.int64()),
                "lbl": batch.column("lbl"),
            }
        )

    def bucket_min(g: pa.Table) -> pa.Table:
        """Per bucket: each edge target's candidate = source label + one
        hop; plus every node's own label — partial min by node. Sources
        still at the sentinel push nothing (their +hop candidate would
        still lose every min, but dropping them keeps the shuffle lean).
        Arrow-native (r5): sorted-src lookup + np.minimum.at."""
        is_lbl = np.asarray(g.column("dst").is_null())
        src = g.column("src").to_numpy(zero_copy_only=False)
        lbl = g.column("lbl").to_numpy(zero_copy_only=False)
        ls = src[is_lbl].astype(np.int64)
        lv = lbl[is_lbl].astype(np.int64)
        order = np.argsort(ls, kind="stable")
        ls_s, lv_s = ls[order], lv[order]
        cand_n = [ls]
        cand_l = [lv]
        es = src[~is_lbl].astype(np.int64)
        if len(es):
            ed = g.column("dst").to_numpy(zero_copy_only=False)[
                ~is_lbl
            ].astype(np.int64)
            loc = np.searchsorted(ls_s, es)
            safe = np.minimum(loc, max(len(ls_s) - 1, 0))
            ok = (ls_s[safe] == es) if len(ls_s) else np.zeros(len(es), bool)
            if ok.any():
                src_lbl = lv_s[safe[ok]]
                reached = src_lbl < _BFS_UNREACHED
                if reached.any():
                    cand_n.append(ed[ok][reached])
                    cand_l.append(src_lbl[reached] + _BFS_HOP)
        nodes_all = np.concatenate(cand_n)
        lbls_all = np.concatenate(cand_l)
        un, inv = np.unique(nodes_all, return_inverse=True)
        part = np.full(len(un), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(part, inv, lbls_all)
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "lbl": pa.array(part, pa.int64()),
            }
        )


    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iters):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        new_labels = (
            edges_t.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_min, batch_format="pyarrow")
            .groupby("node")
            .min("lbl")
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column("node"),
                        "lbl": b.column("min(lbl)").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(P)
            .materialize()
        )
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        raise RuntimeError(
            f"multi_source_bfs did not converge in {max_iters} sweeps "
            "(graph diameter exceeds max_iters — raise max_iters)"
        )

    def unpack(batch: pa.Table) -> pa.Table:
        lbl = batch.column("lbl").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = lbl < _BFS_UNREACHED
        node = batch.column("node").to_numpy(zero_copy_only=False)[keep]
        lbl = lbl[keep]
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "dist": pa.array(lbl >> np.int64(32), pa.int64()),
                "seed": pa.array(lbl & np.int64(0xFFFFFFFF), pa.int64()),
            }
        )

    return labels.map_batches(unpack, batch_format="pyarrow")


def _undirected_canonical(batch: pa.Table, src_col: str, dst_col: str) -> pa.Table:
    """Directed (src, dst) rows → canonical undirected (a < b) rows with
    self-loops dropped — the shared first step of every undirected graph
    operator here (one kernel, review finding: was duplicated)."""
    s = batch.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
    d = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    a = np.minimum(s, d)
    b = np.maximum(s, d)
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def undirected_dedup(
    edges: "ray.data.Dataset", src_col: str = "src", dst_col: str = "dst"
) -> "ray.data.Dataset":
    """Distinct canonical undirected edge list — ONE groupby((a, b))."""
    return (
        edges.map_batches(
            lambda b: _undirected_canonical(b, src_col, dst_col),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )


def triangle_enumerate(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
    edges_canonical: bool = False,
) -> "ray.data.Dataset":
    """Exact triangle enumeration over the undirected simple graph induced
    by ``edges`` → one row per triangle ``(a, b, c)``, a < b < c.

    The classic distributed plan (degree-ordered node-iterator, the
    MapReduce triangle scheme of Suri & Vassilvitskii 2011), as bounded
    union+groupby shuffles — no Dataset.join:

    1. dedup to undirected (a < b) edges — ONE groupby((a, b)).
    2. degrees: flat endpoint explode → partial-count groupby.
    3. attach (deg, node) order keys to both endpoints (union + ONE
       groupby(hash(node) % P)), regroup per edge (ONE groupby(edge)) and
       ORIENT each edge from the lower- to the higher-(deg, id) endpoint:
       every out-adjacency then has O(sqrt(m)) neighbors, so wedge volume
       is O(m^1.5) worst-case instead of O(Σ deg²) — the hot-node
       (heavy-hitter host) mitigation.
    4. wedges: per pivot u, all pairs of out-neighbors (ONE
       groupby(hash(u) % P), pairs via triu indices).
    5. verify: wedge rows ∪ edge rows keyed by the closing pair (ONE
       groupby) — a wedge whose closing pair is an edge is a triangle,
       emitted with its endpoints sorted. Each triangle is found exactly
       once: at its lowest-(deg, id) corner.

    Partitioning assumptions: one node bucket's incident edges and one
    pivot's out-neighborhood (O(sqrt m) after orientation) fit in a
    worker's heap."""

    # ``edges_canonical=True`` means the caller already holds the distinct
    # (a < b) edge list (e.g. clustering_coefficients, which also needs it
    # for degrees) — don't pay the dedup shuffle twice (review finding)
    e = (
        edges
        if edges_canonical
        else undirected_dedup(edges, src_col, dst_col).materialize()
        # materialized: consumed three times (degrees, orientation, verify)
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    from .agg import partial_count

    deg = partial_count(e.map_batches(endpoints, batch_format="pyarrow"),
                        "node", out_col="deg")

    # 3a. union edge-endpoint rows with degree rows, co-locate by node
    def edge_sides(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nbucket": pa.array(
                    np.concatenate([a, b]) % num_buckets, pa.int64()
                ),
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "oa": pa.array(np.concatenate([a, a]), pa.int64()),
                "ob": pa.array(np.concatenate([b, b]), pa.int64()),
                "deg": pa.array(np.zeros(2 * len(a), np.int64), pa.int64()),
                # explicit side flag rather than an in-band -1 sentinel:
                # node ids may legitimately be negative (review finding)
                "is_deg": pa.array(np.zeros(2 * len(a), np.int64), pa.int64()),
            }
        )

    def deg_rows(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nbucket": pa.array(n % num_buckets, pa.int64()),
                "node": pa.array(n, pa.int64()),
                "oa": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "ob": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "deg": batch.column("deg"),
                "is_deg": pa.array(np.ones(len(n), np.int64), pa.int64()),
            }
        )

    tagged = e.map_batches(edge_sides, batch_format="pyarrow").union(
        deg.map_batches(deg_rows, batch_format="pyarrow")
    )

    def attach_deg(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sorted-node searchsorted degree lookup
        is_deg = g.column("is_deg").to_numpy(zero_copy_only=False) == 1
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        deg = g.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        dn, dv = node[is_deg], deg[is_deg]
        order = np.argsort(dn, kind="stable")
        dn, dv = dn[order], dv[order]
        rn = node[~is_deg]
        oa = g.column("oa").to_numpy(zero_copy_only=False)[~is_deg].astype(np.int64)
        ob = g.column("ob").to_numpy(zero_copy_only=False)[~is_deg].astype(np.int64)
        pos = np.searchsorted(dn, rn)
        return pa.table(
            {
                "ebucket": pa.array(
                    (oa * 1_000_003 + ob) % num_buckets, pa.int64()
                ),
                "a": pa.array(oa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "node": pa.array(rn, pa.int64()),
                "ndeg": pa.array(dv[pos], pa.int64()),
            }
        )

    sided = tagged.groupby("nbucket").map_groups(attach_deg, batch_format="pyarrow")

    def orient(g: pa.Table) -> pa.Table:
        # two rows per edge (one per endpoint): pivot = lower (deg, id);
        # arrow-native (r5)
        g = g.sort_by(
            [("a", "ascending"), ("b", "ascending"),
             ("ndeg", "ascending"), ("node", "ascending")]
        )
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        node = g.column("node").to_numpy(zero_copy_only=False)
        u = node[first]
        v = np.where(a[first] == u, b[first], a[first])
        return pa.table(
            {
                "ubucket": pa.array(u % num_buckets, pa.int64()),
                "u": pa.array(u.astype(np.int64), pa.int64()),
                "v": pa.array(v.astype(np.int64), pa.int64()),
            }
        )

    oriented = sided.groupby("ebucket").map_groups(orient, batch_format="pyarrow")

    def wedges(g: pa.Table) -> pa.Table:
        # arrow-native (r5)
        g = g.sort_by([("u", "ascending"), ("v", "ascending")])
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        P, Q, R = [], [], []
        for s, t in zip(starts, ends):
            nb = v[s:t]
            if len(nb) < 2:
                continue
            ii, jj = np.triu_indices(len(nb), k=1)
            P.append(np.full(len(ii), u[s], dtype=np.int64))
            Q.append(nb[ii])
            R.append(nb[jj])
        if not P:
            z = np.zeros(0, np.int64)
            return pa.table({"wbucket": pa.array(z), "x": pa.array(z),
                             "y": pa.array(z), "pivot": pa.array(z),
                             "is_edge": pa.array(z)})
        piv = np.concatenate(P)
        q = np.concatenate(Q)
        r = np.concatenate(R)
        x = np.minimum(q, r)
        y = np.maximum(q, r)
        return pa.table(
            {
                "wbucket": pa.array((x * 1_000_003 + y) % num_buckets, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "pivot": pa.array(piv, pa.int64()),
                "is_edge": pa.array(np.zeros(len(x), np.int64), pa.int64()),
            }
        )

    wedge_rows = oriented.groupby("ubucket").map_groups(wedges, batch_format="pyarrow")

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "wbucket": pa.array((a * 1_000_003 + b) % num_buckets, pa.int64()),
                "x": pa.array(a, pa.int64()),
                "y": pa.array(b, pa.int64()),
                "pivot": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(len(a), np.int64), pa.int64()),
            }
        )

    def close_wedges(g: pa.Table) -> pa.Table:
        # arrow-native (r5): lexsorted edge keys + searchsorted pair probe
        is_edge = g.column("is_edge").to_numpy(zero_copy_only=False) == 1
        x = g.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = g.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        ex, ey = x[is_edge], y[is_edge]
        wx, wy = x[~is_edge], y[~is_edge]
        if len(wx) == 0 or len(ex) == 0:
            z = np.zeros(0, np.int64)
            return pa.table({"a": pa.array(z), "b": pa.array(z), "c": pa.array(z)})
        eo = np.lexsort((ey, ex))
        ex, ey = ex[eo], ey[eo]
        lo = np.searchsorted(ex, wx, side="left")
        hi = np.searchsorted(ex, wx, side="right")
        # within each wedge's x-run of edges, probe y by a second search
        hit = np.zeros(len(wx), bool)
        nontrivial = hi > lo
        idxs = np.nonzero(nontrivial)[0]
        for i in idxs:
            j = np.searchsorted(ey[lo[i] : hi[i]], wy[i])
            hit[i] = j < hi[i] - lo[i] and ey[lo[i] + j] == wy[i]
        piv = g.column("pivot").to_numpy(zero_copy_only=False)[~is_edge]
        tri = np.sort(
            np.stack([piv[hit].astype(np.int64), wx[hit], wy[hit]], axis=1),
            axis=1,
        )
        return pa.table(
            {
                "a": pa.array(tri[:, 0], pa.int64()),
                "b": pa.array(tri[:, 1], pa.int64()),
                "c": pa.array(tri[:, 2], pa.int64()),
            }
        )

    return (
        wedge_rows.union(e.map_batches(edge_keys, batch_format="pyarrow"))
        .groupby("wbucket")
        .map_groups(close_wedges, batch_format="pyarrow")
    )


def clustering_coefficients(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Local clustering coefficient per node: C(v) = 2·T(v) / (deg(v)·(deg(v)−1))
    over the undirected simple graph — T(v) from ``triangle_enumerate``
    (each triangle credits its three corners), degrees from the deduped
    edge list, combined with one union + groupby(hash(node) % P). Nodes
    with deg < 2 are omitted (coefficient undefined). Both engines
    evaluate the identical (2.0·T)/(deg·(deg−1)) expression → doubles
    bit-identical."""

    e = undirected_dedup(edges, src_col, dst_col).materialize()
    tris = triangle_enumerate(
        e, num_buckets=num_buckets, edges_canonical=True
    )

    def corners(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        n = np.concatenate([a, b, c])
        return pa.table(
            {
                "nbucket": pa.array(n % num_buckets, pa.int64()),
                "node": pa.array(n, pa.int64()),
                "t": pa.array(np.ones(len(n), np.int64), pa.int64()),
                "d": pa.array(np.zeros(len(n), np.int64), pa.int64()),
            }
        )

    def deg_halves(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        n = np.concatenate([a, b])
        return pa.table(
            {
                "nbucket": pa.array(n % num_buckets, pa.int64()),
                "node": pa.array(n, pa.int64()),
                "t": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "d": pa.array(np.ones(len(n), np.int64), pa.int64()),
            }
        )

    both = tris.map_batches(corners, batch_format="pyarrow").union(
        e.map_batches(deg_halves, batch_format="pyarrow")
    )

    def combine(g: pa.Table) -> pa.Table:
        # arrow-native (r5): np.unique + bincount folds
        node_all = g.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t_all = g.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        d_all = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        un, inv = np.unique(node_all, return_inverse=True)
        tri = np.bincount(inv, weights=t_all, minlength=len(un)).astype(
            np.int64
        )
        deg = np.bincount(inv, weights=d_all, minlength=len(un)).astype(
            np.int64
        )
        keep = deg >= 2
        node, deg, tri = un[keep], deg[keep], tri[keep]
        coeff = (2.0 * tri.astype(np.float64)) / (deg * (deg - 1)).astype(np.float64)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
                "n_tri": pa.array(tri, pa.int64()),
                "coeff": pa.array(coeff, pa.float64()),
            }
        )

    return both.groupby("nbucket").map_groups(combine, batch_format="pyarrow")


def hits(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    n_iters: int = 4,
    num_partitions: int = 16,
    round_to: int | None = 8,
    small_threshold: int = 50_000,
) -> "ray.data.Dataset":
    """HITS hubs & authorities (Kleinberg 1999) over (node:int64) /
    (src:int64, dst:int64) — the query-independent sibling of ``pagerank``
    for page-quality priors. Returns (node, hub, auth).

    Per iteration, two half-steps, each the pagerank plan shape:
      auth(v) = Σ_{u→v} hub(u)   (edges co-located by SRC bucket)
      hub(u)  = Σ_{u→v} auth(v)  (edges co-located by DST bucket)
    each L1-normalized (score / Σ scores — the tiny global sum is a
    driver scalar, never a shuffle). The two tagged edge tables are
    materialized ONCE (bucketed by src and by dst respectively); each
    half-step costs one union+groupby(bucket) with map-side partial sums
    plus one groupby(node).sum — only (node, partial) rows move, the
    same two-all-to-alls-per-sweep bound as pagerank. Score tables are
    repartitioned to ``num_partitions`` blocks per half-step (Ray's
    Aggregate emits blocks ∝ input blocks — unbounded growth otherwise).

    Float discipline: both half-step expressions (raw sum, then one
    division by the total) are mirrored operand-for-operand by the SQL
    oracle; summation-order drift is absorbed by the final ROUND.
    Edges must be distinct (multi-edges would double-count).

    ``small_threshold``: local broadcast fast path (pagerank pattern) —
    identical half-step arithmetic; summation-order drift vs the
    distributed path is absorbed by the same final ROUND. Dual-path
    parity test-locked; 0 forces the distributed path.
    """
    P = num_partitions
    n = nodes.count()

    if small_threshold and n <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            nd = np.sort(nodes.to_pandas()["node"].to_numpy(dtype=np.int64))
            edf = edges.to_pandas()
            es = edf["src"].to_numpy(dtype=np.int64)
            ed = edf["dst"].to_numpy(dtype=np.int64)
            # dangling endpoints get score rows of their own in the
            # distributed plan; fall through to it rather than misindex
            if np.isin(es, nd).all() and np.isin(ed, nd).all():
                si = np.searchsorted(nd, es)
                di = np.searchsorted(nd, ed)

                def push(score, from_idx, to_idx):
                    s = np.zeros(n, np.float64)
                    np.add.at(s, to_idx, score[from_idx])
                    total = float(s.sum())
                    return s / total if total else s * 0.0

                score = np.full(n, 1.0 / n)
                auth = None
                for _ in range(n_iters):
                    auth = push(score, si, di)  # auth(v) = Σ hub(u), u→v
                    score = push(auth, di, si)  # hub(u) = Σ auth(v), u→v
                if round_to is not None:
                    score = np.round(score, round_to)
                    auth = np.round(auth, round_to)
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(nd, pa.int64()),
                            "hub": pa.array(score, pa.float64()),
                            "auth": pa.array(auth, pa.float64()),
                        }
                    )
                )

    def tag_edges_by(key_col: str):
        other_col = "dst" if key_col == "src" else "src"

        def tag(batch: pa.Table) -> pa.Table:
            key = batch.column(key_col).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": pa.array((key % P).astype(np.int64)),
                    "key": batch.column(key_col),
                    "other": batch.column(other_col),
                    "score": pa.nulls(batch.num_rows, pa.float64()),
                }
            )

        return tag

    edges_by_src = edges.map_batches(
        tag_edges_by("src"), batch_format="pyarrow"
    ).materialize()
    edges_by_dst = edges.map_batches(
        tag_edges_by("dst"), batch_format="pyarrow"
    ).materialize()

    zeros = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "val": pa.array(np.zeros(b.num_rows), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    scores = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "score": pa.array(np.full(b.num_rows, 1.0 / n), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def tag_scores(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "key": batch.column("node"),
                "other": pa.nulls(batch.num_rows, pa.int64()),
                "score": batch.column("score"),
            }
        )

    def bucket_push(g: pa.Table) -> pa.Table:
        """Vectorized per hash bucket: key→score lookup for the bucket's
        edges, contribution pushed to `other`, partial-summed MAP-SIDE.
        Arrow-native (r5): sorted-key lookup + bincount fold."""
        is_edge = np.asarray(g.column("score").is_null())
        if is_edge.sum() == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "val": pa.array([], pa.float64())}
            )
        key = g.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        score = g.column("score").to_numpy(zero_copy_only=False)
        sk = key[~is_edge]
        sv = score[~is_edge].astype(np.float64)
        order = np.argsort(sk, kind="stable")
        sk, sv = sk[order], sv[order]
        ek = key[is_edge]
        eo = g.column("other").to_numpy(zero_copy_only=False)[is_edge].astype(
            np.int64
        )
        loc = np.searchsorted(sk, ek)
        safe = np.minimum(loc, max(len(sk) - 1, 0))
        hit = (sk[safe] == ek) if len(sk) else np.zeros(len(ek), bool)
        vals = np.where(hit, sv[safe] if len(sk) else 0.0, 0.0)
        un, inv = np.unique(eo, return_inverse=True)
        part = np.bincount(inv, weights=vals, minlength=len(un))
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "val": pa.array(part, pa.float64()),
            }
        )

    def half_step(sc: "ray.data.Dataset", tagged_edges: "ray.data.Dataset"):
        tagged = sc.map_batches(tag_scores, batch_format="pyarrow")
        parts = (
            tagged_edges.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_push, batch_format="pyarrow")
        )
        sums = parts.union(zeros).groupby("node").sum("val").materialize()
        total = sums.sum("sum(val)")  # 0 only for an edgeless graph

        def norm(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column("sum(val)"), dtype=np.float64)
            return pa.table(
                {
                    "node": batch.column("node"),
                    # score / total (not score * inv): mirror the oracle's
                    # division operand-for-operand
                    "score": pa.array(
                        v / total if total else v * 0.0, pa.float64()
                    ),
                }
            )

        return (
            sums.map_batches(norm, batch_format="pyarrow")
            .repartition(P)
            .materialize()
        )

    auths = None
    for _ in range(n_iters):
        auths = half_step(scores, edges_by_src)
        scores = half_step(auths, edges_by_dst)

    def hub_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "hub": batch.column("score"),
                "auth": pa.array(np.zeros(batch.num_rows), pa.float64()),
            }
        )

    def auth_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "hub": pa.array(np.zeros(batch.num_rows), pa.float64()),
                "auth": batch.column("score"),
            }
        )

    both = (
        scores.map_batches(hub_rows, batch_format="pyarrow")
        .union(auths.map_batches(auth_rows, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(
            ray.data.aggregate.Sum("hub", alias_name="hub"),
            ray.data.aggregate.Sum("auth", alias_name="auth"),
        )
    )
    if round_to is None:
        return both
    return both.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "hub": pa.array(
                    np.round(np.asarray(b.column("hub"), dtype=np.float64), round_to),
                    pa.float64(),
                ),
                "auth": pa.array(
                    np.round(np.asarray(b.column("auth"), dtype=np.float64), round_to),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def salsa(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    n_iters: int = 4,
    q: int = 10**12,
    num_partitions: int = 16,
    small_threshold: int = 50_000,
) -> "ray.data.Dataset":
    """SALSA (Lempel–Moran 2000) authority/hub scores over (node:int64) /
    distinct (src:int64, dst:int64) — the stochastic sibling of ``hits``
    where every push divides by the sender's degree:

        auth(v) = Σ_{u→v} hub(u)  // outdeg(u)
        hub(u)  = Σ_{u→v} auth(v) // indeg(v)

    run in PURE integer fixed point (init hub = ``q``): every per-edge
    contribution is an int64 floor division, so the result is bit-exact
    regardless of summation order, partitioning, or path. Returns
    (node, auth_q, hub_q) — raw mass after ``n_iters`` rounds, no
    normalization (Σ hub ≤ n·q throughout, so int64 holds for
    n·q < 2^63, i.e. ~9M nodes at q=1e12; shrink q for more).

    Distributed plan — the ``hits`` shape with a twist that saves the
    degree-prep pass entirely: each half-step co-locates edges by their
    SENDING endpoint's hash bucket, and because ALL edges with a given
    sender land in that sender's bucket, the sender's degree is just the
    in-bucket key count — computed locally, never joined. Per half-step:
    one union+groupby(bucket) with map-side integer partial sums by
    receiver, then one groupby(node).sum unioned with a zeros row per
    node (isolated nodes keep a row). Two bounded all-to-alls per
    half-step; score tables repartitioned to ``num_partitions`` blocks
    per round (Ray's Aggregate emits blocks ∝ input blocks). Edge
    endpoints must be ⊆ nodes (asserted in the bucket kernel).

    ``small_threshold``: local broadcast fast path with the identical
    integer arithmetic — bit-equal by construction. Dual-path parity is
    test-locked; 0 forces the distributed path."""
    P = num_partitions
    n = nodes.count()

    if small_threshold and n <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            nd = np.sort(nodes.to_pandas()["node"].to_numpy(dtype=np.int64))
            edf = edges.to_pandas()
            es = edf["src"].to_numpy(dtype=np.int64)
            ed = edf["dst"].to_numpy(dtype=np.int64)
            if np.isin(es, nd).all() and np.isin(ed, nd).all():
                m = len(nd)
                si = np.searchsorted(nd, es)
                di = np.searchsorted(nd, ed)
                od = np.zeros(m, np.int64)
                idg = np.zeros(m, np.int64)
                np.add.at(od, si, 1)
                np.add.at(idg, di, 1)
                h = np.full(m, q, np.int64)
                a = np.zeros(m, np.int64)
                for _ in range(n_iters):
                    a = np.zeros(m, np.int64)
                    np.add.at(a, di, h[si] // od[si])
                    h = np.zeros(m, np.int64)
                    np.add.at(h, si, a[di] // idg[di])
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(nd, pa.int64()),
                            "auth_q": pa.array(a, pa.int64()),
                            "hub_q": pa.array(h, pa.int64()),
                        }
                    )
                )

    # --- distributed path -------------------------------------------------
    # row kinds in the unioned table: kind=0 edge (key=sender,
    # other=receiver), kind=1 score (key=node, val=score). All-int64
    # schema — no nulls, so the arrow→numpy path is zero-copy exact.
    def tag_edges_by(key_col: str):
        other_col = "dst" if key_col == "src" else "src"

        def tag(batch: pa.Table) -> pa.Table:
            key = batch.column(key_col).to_numpy(zero_copy_only=False)
            z = np.zeros(batch.num_rows, np.int64)
            return pa.table(
                {
                    "bucket": pa.array((key % P).astype(np.int64)),
                    "key": batch.column(key_col),
                    "other": batch.column(other_col),
                    "val": pa.array(z),
                    "kind": pa.array(z),
                }
            )

        return tag

    edges_by_src = edges.map_batches(
        tag_edges_by("src"), batch_format="pyarrow"
    ).materialize()
    edges_by_dst = edges.map_batches(
        tag_edges_by("dst"), batch_format="pyarrow"
    ).materialize()

    zeros = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "val": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def tag_scores(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "key": batch.column("node"),
                "other": pa.array(np.zeros(batch.num_rows, np.int64)),
                "val": batch.column("val"),
                "kind": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    def bucket_push(g: pa.Table) -> pa.Table:
        """Integer push, vectorized per hash bucket: in-bucket key count
        IS the sender degree (all of a sender's edges share its bucket);
        contribution = score[key] // degree[key], partial-summed by
        receiver MAP-SIDE so only (node, partial) rows shuffle."""
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        em = kind == 0
        ekey = key[em]
        if ekey.size == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
            )
        eoth = g.column("other").to_numpy(zero_copy_only=False)[em]
        skey = key[~em]
        sval = g.column("val").to_numpy(zero_copy_only=False)[~em]
        order = np.argsort(skey)
        skey = skey[order]
        sval = sval[order]
        pos = np.searchsorted(skey, ekey)
        if not (pos < len(skey)).all() or not (skey[pos] == ekey).all():
            raise ValueError("salsa: edge endpoint not in the node set")
        uk, inv, cnts = np.unique(ekey, return_inverse=True, return_counts=True)
        contrib = sval[pos] // cnts[inv]
        uo, oinv = np.unique(eoth, return_inverse=True)
        sums = np.zeros(len(uo), np.int64)
        np.add.at(sums, oinv, contrib)
        return pa.table(
            {"node": pa.array(uo, pa.int64()), "val": pa.array(sums, pa.int64())}
        )

    def half_step(sc: "ray.data.Dataset", tagged_edges: "ray.data.Dataset"):
        tagged = sc.map_batches(tag_scores, batch_format="pyarrow")
        parts = (
            tagged_edges.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_push, batch_format="pyarrow")
        )
        return (
            parts.union(zeros)
            .groupby("node")
            .sum("val")
            .rename_columns({"sum(val)": "val"})
            .repartition(P)
            .materialize()
        )

    hubs = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "val": pa.array(np.full(b.num_rows, q, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    auths = None
    for _ in range(n_iters):
        auths = half_step(hubs, edges_by_src)
        hubs = half_step(auths, edges_by_dst)

    def a_rows(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, np.int64)
        return pa.table(
            {
                "node": batch.column("node"),
                "auth_q": batch.column("val"),
                "hub_q": pa.array(z),
            }
        )

    def h_rows(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, np.int64)
        return pa.table(
            {
                "node": batch.column("node"),
                "auth_q": pa.array(z),
                "hub_q": batch.column("val"),
            }
        )

    return (
        auths.map_batches(a_rows, batch_format="pyarrow")
        .union(hubs.map_batches(h_rows, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(
            ray.data.aggregate.Sum("auth_q", alias_name="auth_q"),
            ray.data.aggregate.Sum("hub_q", alias_name="hub_q"),
        )
    )


def bounded_sssp(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    source: int = 0,
    rounds: int = 12,
    inf: int = 1 << 40,
    num_partitions: int = 16,
    small_threshold: int = 200_000,
) -> "ray.data.Dataset":
    """Weighted single-source shortest paths under a FIXED relaxation
    horizon: exactly ``rounds`` synchronous Bellman–Ford sweeps over
    (node:int64) / (src:int64, dst:int64, w:int64) — the cheapest
    ≤ rounds-hop route from ``source`` (equal to the true shortest path
    wherever the optimal route uses ≤ rounds edges). Returns
    (node, dist) with ``dist = -1`` for nodes unreached within the
    horizon. Directed; pass both (u,v,w) and (v,u,w) for undirected.

    All-integer relaxation → bit-exact on any path/partitioning. Per
    sweep (the ``multi_source_bfs`` plan with weights): ONE
    union+groupby(src-hash bucket) co-locates each edge with its
    source's current distance; in-bucket vectorized candidates
    ``d[src]+w`` (finite sources only) partial-MIN'd by dst map-side;
    then the partials union the current distance table into ONE
    groupby(node).min — combine-with-previous and merge in the same
    all-to-all. Distance tables repartitioned per sweep. Edge endpoints
    must be ⊆ nodes (asserted in the bucket kernel).

    ``small_threshold``: local broadcast fast path, identical integer
    arithmetic (bit-equal). Dual-path parity is test-locked; 0 forces
    the distributed path."""
    P = num_partitions
    n = nodes.count()

    if small_threshold and n <= small_threshold:
        edges = edges.materialize()
        if edges.count() <= small_threshold:
            nd = np.sort(nodes.to_pandas()["node"].to_numpy(dtype=np.int64))
            edf = edges.to_pandas()
            es = edf["src"].to_numpy(dtype=np.int64)
            ed = edf["dst"].to_numpy(dtype=np.int64)
            if np.isin(es, nd).all() and np.isin(ed, nd).all():
                m = len(nd)
                si = np.searchsorted(nd, es)
                di = np.searchsorted(nd, ed)
                ww = edf["w"].to_numpy(dtype=np.int64)
                d = np.full(m, inf, np.int64)
                src_i = np.searchsorted(nd, source)
                if src_i < m and nd[src_i] == source:
                    d[src_i] = 0
                for _ in range(rounds):
                    fin = d[si] < inf
                    nd_arr = d.copy()
                    np.minimum.at(nd_arr, di[fin], d[si][fin] + ww[fin])
                    d = nd_arr
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "node": pa.array(nd, pa.int64()),
                            "dist": pa.array(
                                np.where(d >= inf, -1, d), pa.int64()
                            ),
                        }
                    )
                )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "key": batch.column("src"),
                "other": batch.column("dst"),
                "val": batch.column("w"),
                "kind": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    edges_t = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def init_dist(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": b.column("node"),
                "d": pa.array(np.where(node == source, 0, inf).astype(np.int64)),
            }
        )

    dist = nodes.map_batches(init_dist, batch_format="pyarrow").materialize()

    def tag_dist(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((node % P).astype(np.int64)),
                "key": batch.column("node"),
                "other": pa.array(np.zeros(batch.num_rows, np.int64)),
                "val": batch.column("d"),
                "kind": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    def bucket_relax(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        em = kind == 0
        ekey = key[em]
        if ekey.size == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        eoth = g.column("other").to_numpy(zero_copy_only=False)[em]
        ew = g.column("val").to_numpy(zero_copy_only=False)[em]
        dkey = key[~em]
        dval = g.column("val").to_numpy(zero_copy_only=False)[~em]
        order = np.argsort(dkey)
        dkey = dkey[order]
        dval = dval[order]
        pos = np.searchsorted(dkey, ekey)
        if not (pos < len(dkey)).all() or not (dkey[pos] == ekey).all():
            raise ValueError("bounded_sssp: edge source not in the node set")
        du = dval[pos]
        fin = du < inf
        if not fin.any():
            return pa.table(
                {"node": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        cand = du[fin] + ew[fin]
        uo, oinv = np.unique(eoth[fin], return_inverse=True)
        mins = np.full(len(uo), inf, np.int64)
        np.minimum.at(mins, oinv, cand)
        return pa.table(
            {"node": pa.array(uo, pa.int64()), "d": pa.array(mins, pa.int64())}
        )

    for _ in range(rounds):
        tagged = dist.map_batches(tag_dist, batch_format="pyarrow")
        parts = (
            edges_t.union(tagged)
            .groupby("bucket")
            .map_groups(bucket_relax, batch_format="pyarrow")
        )
        dist = (
            parts.union(dist)
            .groupby("node")
            .min("d")
            .rename_columns({"min(d)": "d"})
            .repartition(P)
            .materialize()
        )

    return dist.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "dist": pa.array(
                    np.where(
                        b.column("d").to_numpy(zero_copy_only=False) >= inf,
                        -1,
                        b.column("d").to_numpy(zero_copy_only=False),
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def normalize_out_weights(
    edges: "ray.data.Dataset",
    num_partitions: int = 16,
    cnt_col: str = "cnt",
) -> "ray.data.Dataset":
    """(src, dst, cnt) → (src, dst, w = cnt / Σ_dst' cnt(src, dst')) —
    row-stochastic edge weights for weighted PageRank, computed with the
    union+bucketed-groupby attach (NO Dataset.join): per-src out-weight
    totals are a groupby aggregate, then totals and edges co-locate in ONE
    hash(src) % P shuffle and divide vectorized per bucket."""
    P = num_partitions

    totals = edges.groupby("src").sum(cnt_col)

    def tag_totals(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "src": batch.column("src"),
                "dst": pa.nulls(batch.num_rows, pa.int64()),
                "cnt": pa.nulls(batch.num_rows, pa.int64()),
                "tot": batch.column(f"sum({cnt_col})").cast(pa.int64()),
            }
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((src % P).astype(np.int64)),
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "cnt": batch.column(cnt_col).cast(pa.int64()),
                "tot": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def divide(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sorted-src total lookup
        is_tot = np.asarray(g.column("dst").is_null())
        if (~is_tot).sum() == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        srcs = g.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = srcs[is_tot]
        tv = g.column("tot").to_numpy(zero_copy_only=False)[is_tot].astype(
            np.float64
        )
        order = np.argsort(ts, kind="stable")
        ts, tv = ts[order], tv[order]
        es = srcs[~is_tot]
        ed = g.column("dst").to_numpy(zero_copy_only=False)[~is_tot].astype(
            np.int64
        )
        ec = g.column("cnt").to_numpy(zero_copy_only=False)[~is_tot].astype(
            np.float64
        )
        loc = np.searchsorted(ts, es)
        safe = np.minimum(loc, max(len(ts) - 1, 0))
        hit = (ts[safe] == es) if len(ts) else np.zeros(len(es), bool)
        # a src with no total row divides to NaN, as reindex did
        tot = np.where(hit, tv[safe] if len(ts) else np.nan, np.nan)
        return pa.table(
            {
                "src": pa.array(es, pa.int64()),
                "dst": pa.array(ed, pa.int64()),
                "w": pa.array(ec / tot, pa.float64()),
            }
        )

    tagged = totals.map_batches(tag_totals, batch_format="pyarrow").union(
        edges.map_batches(tag_edges, batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(divide, batch_format="pyarrow")


def contract_to_host_graph(
    edges: "ray.data.Dataset",
    src_host_col: str = "src_host",
    dst_host_col: str = "dst_host",
) -> "ray.data.Dataset":
    """Page-level edges already annotated with host ids → the inter-host
    multigraph collapsed to weighted simple edges (src, dst, cnt):
    self-loops (intra-host links) dropped, ONE groupby over int pairs.
    The contraction is what makes host-level PageRank tractable: the
    host graph is orders of magnitude smaller than the page graph."""

    def to_pairs(batch: pa.Table) -> pa.Table:
        s = batch.column(src_host_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst_host_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        return pa.table(
            {
                "src": pa.array(s[keep], pa.int64()),
                "dst": pa.array(d[keep], pa.int64()),
            }
        )

    return (
        edges.map_batches(to_pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "dst": b.column("dst"),
                    "cnt": b.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def kcore(
    edges: "ray.data.Dataset",
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
    max_rounds: int = 64,
    broadcast_cap: int = 1_000_000,
    edges_canonical: bool = False,
) -> "ray.data.Dataset":
    """k-core of the undirected simple graph induced by ``edges``: the
    maximal subgraph in which every node has degree >= k, found by the
    classic distributed peeling loop (Matula & Beck's algorithm run
    level-synchronously). Output is one row per surviving node:
    ``(node, deg)`` with deg = its degree inside the core.

    Crawl relevance: the k-core of the host/link graph is the standard
    spam-farm / link-ring locator and a cheap "is this page inside the
    well-connected web" signal (reference exposes link scoring only;
    this is the graph-level generalization).

    Round structure — bounded shuffles, no Dataset.join:

    1. degrees: endpoint explode with a map-side ``np.unique`` partial
       count → ONE groupby(hash(node) % P) sum. Only (node, partial)
       pairs shuffle, never edges.
    2. peel set = nodes with deg < k (a Dataset; counted, not collected).
       Empty → fixpoint; emit the final (node, deg) table.
    3. drop edges touching the peel set. Two regimes:
       - |peel| <= broadcast_cap: the sorted id array travels ONCE via
         ``ray.put`` and a zero-shuffle ``map_batches`` mask
         (np.isin against the sorted array) filters edges in place —
         the common case after round 1, when peel sets are small.
       - above the cap: two bucketed anti-joins (peel rows ∪ edge rows
         keyed on endpoint a, ONE groupby(hash % P) with an in-bucket
         set filter; then the same keyed on b) — every shuffle is
         proportional to |peel| + |surviving edges|.
    4. the loop-carried edge set is repartitioned to a fixed block
       count each round (Ray's shuffles grow output block counts with
       input block counts; unbounded growth makes later rounds
       superlinearly slower — measured on pagerank, NOTES_r3).

    Converges in <= max_rounds or raises (peeling strictly shrinks the
    edge set, so max_rounds only guards degenerate misuse).

    Partitioning assumptions: one node bucket's degree partials and one
    bucket's peel-id set fit in a worker's heap; the edge set itself
    only streams. Reference: crawl4ai has no graph ops; semantics follow
    Batagelj & Zaversnik (2003) / Suri-Vassilvitskii-style MapReduce
    peeling.
    """

    e = (
        edges
        if edges_canonical
        else undirected_dedup(edges, src_col, dst_col)
    )
    e = e.repartition(num_buckets).materialize()

    def deg_partials(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        n, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {
                "nbucket": pa.array(n % num_buckets, pa.int64()),
                "node": pa.array(n, pa.int64()),
                "d": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def deg_combine(g: pa.Table) -> pa.Table:
        # arrow-native (r5): np.unique + bincount
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        d = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        un, inv = np.unique(node, return_inverse=True)
        deg = np.bincount(inv, weights=d, minlength=len(un)).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    def drop_bucketed(ed, peel, col):
        other = "b" if col == "a" else "a"

        def edge_rows(batch: pa.Table) -> pa.Table:
            key = batch.column(col).to_numpy(zero_copy_only=False)
            oth = batch.column(other).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "kb": pa.array(key % num_buckets, pa.int64()),
                    "key": pa.array(key, pa.int64()),
                    "oth": pa.array(oth, pa.int64()),
                    # explicit side flag, not an in-band sentinel
                    "is_peel": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                }
            )

        def peel_rows(batch: pa.Table) -> pa.Table:
            n = batch.column("node").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "kb": pa.array(n % num_buckets, pa.int64()),
                    "key": pa.array(n, pa.int64()),
                    "oth": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                    "is_peel": pa.array(np.ones(len(n), np.int64), pa.int64()),
                }
            )

        def anti(g: pa.Table) -> pa.Table:
            # arrow-native (r5): sorted dead-set + searchsorted anti-join
            is_peel = (
                g.column("is_peel").to_numpy(zero_copy_only=False) == 1
            )
            key = g.column("key").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            oth = g.column("oth").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            dead = np.unique(key[is_peel])
            ek, eo = key[~is_peel], oth[~is_peel]
            if len(dead):
                loc = np.searchsorted(dead, ek)
                safe = np.minimum(loc, len(dead) - 1)
                keep = dead[safe] != ek
                ek, eo = ek[keep], eo[keep]
            a = ek if col == "a" else eo
            b = eo if col == "a" else ek
            return pa.table(
                {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
            )

        both = ed.map_batches(edge_rows, batch_format="pyarrow").union(
            peel.map_batches(peel_rows, batch_format="pyarrow")
        )
        return both.groupby("kb").map_groups(anti, batch_format="pyarrow")

    for _ in range(max_rounds):
        degs = (
            e.map_batches(deg_partials, batch_format="pyarrow")
            .groupby("nbucket")
            .map_groups(deg_combine, batch_format="pyarrow")
            .materialize()
        )
        peel = degs.filter(expr=f"deg < {k}").materialize()
        n_peel = peel.count()
        if n_peel == 0:
            return degs.select_columns(["node", "deg"])
        if n_peel <= broadcast_cap:
            ids = np.sort(
                np.fromiter(
                    (r["node"] for r in peel.take_all()),
                    dtype=np.int64,
                    count=n_peel,
                )
            )
            ids_ref = ray.put(ids)

            def mask(batch: pa.Table) -> pa.Table:
                dead = ray.get(ids_ref)
                a = batch.column("a").to_numpy(zero_copy_only=False)
                b = batch.column("b").to_numpy(zero_copy_only=False)
                keep = ~(np.isin(a, dead) | np.isin(b, dead))
                return batch.filter(pa.array(keep))

            # 1:1 mask preserves block count — no repartition needed, so
            # the common (small-peel) round costs ONE shuffle (degrees),
            # not two. Only the bucketed path's groupby output needs its
            # block count pinned back down.
            e = e.map_batches(mask, batch_format="pyarrow").materialize()
        else:
            e = (
                drop_bucketed(drop_bucketed(e, peel, "a"), peel, "b")
                .repartition(num_buckets)
                .materialize()
            )
    raise RuntimeError(f"kcore did not converge within {max_rounds} rounds")


def common_neighbor_scores(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
    max_pivot_degree: int = 10_000,
    edges_canonical: bool = False,
) -> "ray.data.Dataset":
    """Link prediction over the undirected simple graph: for every
    NON-adjacent pair (u, v) with at least one common neighbor, the
    common-neighbor count and the neighborhood Jaccard
    ``cn / (deg(u) + deg(v) - cn)`` — the classic related-pages /
    suggested-links candidate generator (Liben-Nowell & Kleinberg 2003).
    Scores are integers plus ONE final division, so both engines produce
    bit-identical doubles (no transcendental sums to order).

    Bounded union+groupby shuffles, no Dataset.join:
    1. dedup to canonical (a < b) edges; explode to symmetric adjacency.
    2. wedges per pivot z (ONE groupby(hash(z) % P)): all u < v pairs of
       N(z). Pivots with deg > max_pivot_degree are SKIPPED (hot-node
       cap: a 10^6-degree hub would emit 10^12 wedges; the cap bounds
       wedge volume at P·cap² per bucket and costs only pairs whose
       ONLY common neighbors are mega-hubs — the standard recall
       trade, mirrored by simhash/minhash hot-bucket caps).
    3. cn per pair ∪ edge rows (ONE groupby(pair-hash % P)): adjacent
       pairs are dropped in-bucket via an explicit is_edge flag.
    4. two bucketed attach passes add deg(u), deg(v) (same union+
       groupby form as triangle orientation); the Jaccard division
       happens map-side.

    Partitioning assumptions: one pivot's neighbor list (<= cap) and one
    bucket's pair partials fit in a worker's heap."""

    e = (
        edges
        if edges_canonical
        else undirected_dedup(edges, src_col, dst_col)
    ).materialize()

    def adjacency(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        z = np.concatenate([a, b])
        n = np.concatenate([b, a])
        return pa.table(
            {
                "zb": pa.array(z % num_buckets, pa.int64()),
                "z": pa.array(z, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    def wedges(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sorted (z, n) runs replace groupby("z")
        zz = g.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        nn = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((nn, zz))
        zz, nn = zz[o], nn[o]
        starts = np.flatnonzero(np.r_[True, zz[1:] != zz[:-1]]) if len(zz) else np.zeros(0, np.int64)
        ends = np.r_[starts[1:], len(zz)] if len(zz) else np.zeros(0, np.int64)
        us, vs = [], []
        for s, t in zip(starts, ends):
            nb = nn[s:t]
            d = len(nb)
            if d < 2 or d > max_pivot_degree:
                continue
            iu, iv = np.triu_indices(d, k=1)
            us.append(nb[iu])
            vs.append(nb[iv])
        if not us:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "is_edge": pa.array([], pa.int64()),
                }
            )
        u = np.concatenate(us)
        v = np.concatenate(vs)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "is_edge": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    adj = e.map_batches(adjacency, batch_format="pyarrow")
    wedge_rows = adj.groupby("zb").map_groups(wedges, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column("a"),
                "v": batch.column("b"),
                "is_edge": pa.array(
                    np.ones(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    both = wedge_rows.union(e.map_batches(edge_rows, batch_format="pyarrow"))

    def pair_bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        pb = (u * np.int64(1_000_003) + v) % num_buckets
        return batch.append_column("pb", pa.array(pb, pa.int64()))

    def count_pairs(g: pa.Table) -> pa.Table:
        # arrow-native (r5): lexsorted (u, v) runs, per-run sum/count
        u = g.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = g.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        ie = g.column("is_edge").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(u) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"u": z, "v": z, "cn": z})
        o = np.lexsort((v, u))
        u, v, ie = u[o], v[o], ie[o]
        newrun = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        run_id = np.cumsum(newrun) - 1
        esum = np.bincount(run_id, weights=ie).astype(np.int64)
        cnt = np.bincount(run_id).astype(np.int64)
        keep = esum == 0  # drop pairs that are existing edges
        return pa.table(
            {
                "u": pa.array(u[newrun][keep], pa.int64()),
                "v": pa.array(v[newrun][keep], pa.int64()),
                "cn": pa.array(cnt[keep], pa.int64()),
            }
        )

    pairs = (
        both.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(count_pairs, batch_format="pyarrow")
    )

    # degrees once; attached to pairs in two bucketed passes
    degs = node_degrees(e).materialize()
    with_du = attach_node_value(
        pairs, degs, "u", "deg_u", ["u", "v", "cn"], num_buckets
    )
    with_both = attach_node_value(
        with_du, degs, "v", "deg_v", ["u", "v", "cn", "deg_u"], num_buckets
    )

    def jaccard(batch: pa.Table) -> pa.Table:
        cn = batch.column("cn").to_numpy(zero_copy_only=False).astype(np.int64)
        du = batch.column("deg_u").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = batch.column("deg_v").to_numpy(zero_copy_only=False).astype(np.int64)
        jac = cn.astype(np.float64) / (du + dv - cn).astype(np.float64)
        return pa.table(
            {
                "u": batch.column("u"),
                "v": batch.column("v"),
                "cn": pa.array(cn, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return with_both.map_batches(jaccard, batch_format="pyarrow")


def node_degrees(
    e_canonical: "ray.data.Dataset", num_buckets: int = 32
) -> "ray.data.Dataset":
    """(node, deg) over a canonical (a < b) undirected edge list — one
    map-side np.unique partial per block + ONE groupby sum. Shared by
    common_neighbor_scores / degree_assortativity (and the same kernel
    kcore re-runs per peel round)."""

    def deg_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        n, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "deg": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    return (
        e_canonical.map_batches(deg_rows, batch_format="pyarrow")
        .groupby("node")
        .sum("deg")
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "deg": b.column("sum(deg)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def attach_node_value(
    rows_ds: "ray.data.Dataset",
    values_ds: "ray.data.Dataset",
    key_col: str,
    out_col: str,
    schema_cols: list,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Bucketed attach of an int64 per-node value (``values_ds``:
    (node, deg)-shaped) onto ``rows_ds[key_col]`` — the union+groupby
    join form (Ray 2.49's JoinOperator costs ~4 s of actor-pool spin-up
    per call, NOTES_r3). All ``schema_cols`` must be int64. Every
    shuffle is proportional to |rows| + |values|; one bucket's value
    rows must fit in a worker's heap."""
    value_key, value_val = values_ds.schema().names[:2]

    def tag_rows(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        cols = {c: batch.column(c) for c in schema_cols}
        cols["kb"] = pa.array(key % num_buckets, pa.int64())
        cols["kkey"] = pa.array(key, pa.int64())
        cols["dval"] = pa.array(np.full(len(key), -1, np.int64), pa.int64())
        cols["is_val"] = pa.array(np.zeros(len(key), np.int64), pa.int64())
        return pa.table(cols)

    def tag_values(batch: pa.Table) -> pa.Table:
        n = batch.column(value_key).to_numpy(zero_copy_only=False)
        d = batch.column(value_val).to_numpy(zero_copy_only=False)
        z = np.zeros(len(n), np.int64)
        cols = {c: pa.array(z, pa.int64()) for c in schema_cols}
        cols["kb"] = pa.array(n % num_buckets, pa.int64())
        cols["kkey"] = pa.array(n, pa.int64())
        cols["dval"] = pa.array(d.astype(np.int64), pa.int64())
        cols["is_val"] = pa.array(np.ones(len(n), np.int64), pa.int64())
        return pa.table(cols)

    def join_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): sorted-key searchsorted lookup; keys absent
        # from values_ds get -1 (the documented sentinel)
        is_val = g.column("is_val").to_numpy(zero_copy_only=False) == 1
        kkey = g.column("kkey").to_numpy(zero_copy_only=False).astype(np.int64)
        dval = g.column("dval").to_numpy(zero_copy_only=False).astype(np.int64)
        vk, vv = kkey[is_val], dval[is_val]
        order = np.argsort(vk, kind="stable")
        vk, vv = vk[order], vv[order]
        rows = g.filter(pa.array(~is_val))
        rk = kkey[~is_val]
        loc = np.searchsorted(vk, rk)
        safe = np.minimum(loc, max(len(vk) - 1, 0))
        hit = (vk[safe] == rk) if len(vk) else np.zeros(len(rk), bool)
        out = {c: rows.column(c).cast(pa.int64()) for c in schema_cols}
        out[out_col] = pa.array(
            np.where(hit, vv[safe] if len(vk) else -1, -1), pa.int64()
        )
        return pa.table(out)

    both_k = rows_ds.map_batches(tag_rows, batch_format="pyarrow").union(
        values_ds.map_batches(tag_values, batch_format="pyarrow")
    )
    return both_k.groupby("kb").map_groups(join_bucket, batch_format="pyarrow")


def degree_assortativity(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
    edges_canonical: bool = False,
) -> "ray.data.Dataset":
    """Newman's degree assortativity coefficient of the undirected
    simple graph — ONE row: (m2, sx, sxx, sxy, assortativity). The
    Pearson correlation of endpoint degrees over both orientations of
    every edge; because the orientation-doubled x and y marginals are
    identical, the usual sqrt(Vx·Vy) collapses to Vx and the whole
    statistic is INTEGER moments + one final double division — bit-
    identical across engines, no transcendentals at all.

    r < 0 (disassortative) is the classic web signature: hubs link to
    leaves. Plan: degrees via node_degrees, two bucketed attaches onto
    the edge list (attach_node_value), then map-side int64 partial
    moments folded by one tiny aggregate. Overflow bound: sxy <=
    2m·D², so int64 holds through m·D² < 4.6e18 (m edges, D max
    degree) — at web scale feed it the host graph, not the page graph.
    """
    e = (
        edges
        if edges_canonical
        else undirected_dedup(edges, src_col, dst_col)
    ).materialize()
    degs = node_degrees(e, num_buckets).materialize()
    ab = attach_node_value(e, degs, "a", "deg_a", ["a", "b"], num_buckets)
    ab2 = attach_node_value(
        ab, degs, "b", "deg_b", ["a", "b", "deg_a"], num_buckets
    )

    def partial_moments(batch: pa.Table) -> pa.Table:
        da = batch.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m2": pa.array([2 * len(da)], pa.int64()),
                "sx": pa.array([int((da + db).sum())], pa.int64()),
                "sxx": pa.array([int((da * da + db * db).sum())], pa.int64()),
                "sxy": pa.array([int(2 * (da * db).sum())], pa.int64()),
            }
        )

    parts = ab2.map_batches(partial_moments, batch_format="pyarrow")
    agg = parts.aggregate(
        ray.data.aggregate.Sum("m2", alias_name="m2"),
        ray.data.aggregate.Sum("sx", alias_name="sx"),
        ray.data.aggregate.Sum("sxx", alias_name="sxx"),
        ray.data.aggregate.Sum("sxy", alias_name="sxy"),
    )
    m2, sx, sxx, sxy = (
        int(agg["m2"]),
        int(agg["sx"]),
        int(agg["sxx"]),
        int(agg["sxy"]),
    )
    denom = m2 * sxx - sx * sx
    if denom == 0:
        raise ValueError(
            "degree_assortativity: degenerate (regular) graph — "
            "assortativity undefined"
        )
    r = float(m2 * sxy - sx * sx) / float(denom)
    return ray.data.from_arrow(
        pa.table(
            {
                "m2": pa.array([m2], pa.int64()),
                "sx": pa.array([sx], pa.int64()),
                "sxx": pa.array([sxx], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
                "assortativity": pa.array([r], pa.float64()),
            }
        )
    )

"""Fifty-eighth-wave operators (round-3 continuation session,
2026-08-21) — influence cascades, Shapley attribution, RLE layout.

Registered into the main query/oracle registries via ``register()`` —
called from the tail of ``queries.py``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


# ---------------------------------------------------------------------------
# cascade_ltm — linear-threshold influence cascade from hub seeds
# ---------------------------------------------------------------------------

_LTM_SEEDS = 10
_LTM_ROUNDS = 8


def _ltm_theta(node: int) -> int:
    return 1 + int(
        hashlib.md5(f"ltm|{node}".encode()).hexdigest()[:8], 16
    ) % 3


def q_cascade_ltm(sf_dir: str):
    """Linear-threshold influence cascade over the synthetic link
    graph: seed the {seeds} highest-degree nodes, then run {rounds}
    synchronous rounds where an inactive node activates once ≥ θ of
    its neighbors are active (θ = 1+md5%3 per node) — the
    deterministic influence-propagation model behind seed selection,
    contagion audits and poisoning-spread analysis. Output: per node
    its threshold and activation round (0 = seed, -1 = never, within
    the fixed {rounds}-round horizon both engines run verbatim).

    Exactness: thresholds, degrees, seed selection (degree DESC, node
    ASC) and the round-by-round activation counts are all integers;
    BOTH engines run exactly {rounds} rounds (no early stop), so the
    horizons match by construction. Distributed shape: edges stay
    distributed; each round is one broadcast of the (bounded) newly
    active frontier + one groupby(dst) count — the BFS wave plan.
    """
    from .queries_wave56 import _undirected_edges

    edges, n = _undirected_edges(sf_dir)
    edges = edges.materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                batch.column("a").to_numpy(zero_copy_only=False),
                batch.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        v, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(v, pa.int64()),
                "d": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    # exact top-K seed hubs via distributed sort+limit (r4: the former
    # node-sized degree collect is gone)
    seeds = [
        int(r["node"])
        for r in edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(ray.data.aggregate.Sum("d", alias_name="d"))
        .sort(["d", "node"], descending=[True, False])
        .limit(_LTM_SEEDS)
        .take_all()  # bounded: exactly the seed rows
    ]
    active = {s: 0 for s in seeds}
    for rnd in range(1, _LTM_ROUNDS + 1):
        act_ref = ray.put(set(active))

        def contrib(batch: pa.Table) -> pa.Table:
            act = ray.get(act_ref)
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            srcs = np.concatenate([a, b])
            dsts = np.concatenate([b, a])
            mask = np.array([int(s) in act for s in srcs], bool)
            mask &= np.array([int(d) not in act for d in dsts], bool)
            v, c = np.unique(dsts[mask], return_counts=True)
            return pa.table(
                {
                    "node": pa.array(v, pa.int64()),
                    "c": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        def theta_filter(batch: pa.Table) -> pa.Table:
            # activation test runs distributed (r4): only the nodes that
            # actually fire this round reach the driver
            nodes_ = batch.column("node").to_numpy(zero_copy_only=False)
            cs = batch.column("c").to_numpy(zero_copy_only=False)
            keep = np.array(
                [int(c) >= _ltm_theta(int(v)) for v, c in zip(nodes_, cs)],
                bool,
            )
            return batch.filter(pa.array(keep))

        newly = [
            int(r["node"])
            for r in edges.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(ray.data.aggregate.Sum("c", alias_name="c"))
            .map_batches(theta_filter, batch_format="pyarrow")
            .take_all()  # scale-note: per-round activations (≤ cascade growth; the active-set broadcast itself is the LTM state — a full stages/graph BSP port would move it into label rows)
        ]
        for v in newly:
            active[v] = rnd
    return pa.table(
        {
            "node": pa.array(list(range(n)), pa.int64()),
            "theta": pa.array(
                [_ltm_theta(v) for v in range(n)], pa.int64()
            ),
            "round": pa.array(
                [active.get(v, -1) for v in range(n)], pa.int64()
            ),
        }
    )


def _sql_cascade_ltm() -> str:
    parts = [
        f"""
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents),
child AS (
  SELECT doc_id AS s, (2 * doc_id + 1) % nn.c AS t FROM documents, nn
  UNION ALL
  SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL
  SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
ue AS (
  SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b
  FROM child WHERE s <> t
),
eB AS MATERIALIZED (
  SELECT a AS u, v FROM (SELECT a, b AS v FROM ue)
  UNION ALL SELECT b, a FROM ue
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM ue UNION ALL SELECT b FROM ue)
  GROUP BY node
),
th AS (
  SELECT doc_id AS node,
         CAST(1 + CAST(('0x' || substr(md5('ltm|' || doc_id), 1, 8))
                       AS BIGINT) % 3 AS BIGINT) AS theta
  FROM documents
),
a0 AS (
  SELECT node, CAST(0 AS BIGINT) AS round
  FROM deg ORDER BY d DESC, node LIMIT {_LTM_SEEDS}
)"""
    ]
    prev = "a0"
    for r in range(1, _LTM_ROUNDS + 1):
        parts.append(
            f"""
a{r} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT nx.node, CAST({r} AS BIGINT)
  FROM (
    SELECT e.v AS node, CAST(COUNT(*) AS BIGINT) AS c
    FROM eB e
    JOIN {prev} act ON act.node = e.u
    WHERE e.v NOT IN (SELECT node FROM {prev})
    GROUP BY e.v
  ) nx
  JOIN th ON th.node = nx.node
  WHERE nx.c >= th.theta
)"""
        )
        prev = f"a{r}"
    parts.append(
        f"""
fin AS (SELECT * FROM {prev})
SELECT th.node, th.theta,
       COALESCE(fin.round, -1) AS round
FROM th LEFT JOIN fin ON fin.node = th.node"""
    )
    return "WITH " + ",".join(parts)


# ---------------------------------------------------------------------------
# shapley_gates — exact Shapley attribution of corpus attrition
# ---------------------------------------------------------------------------


def q_shapley_gates(sf_dir: str):
    """Exact Shapley attribution of corpus attrition across the three
    stage-1 quality gates (gopher rules, C4 rules, lang='en'): the
    value of a gate coalition S is the number of docs passing ALL
    gates in S, and each gate's Shapley value averages its marginal
    removals over all 3! orderings — THE principled answer to "which
    gate is responsible for the corpus shrinkage?" (order-dependent
    funnel readings over- or under-credit gates that overlap). Output:
    per gate its solo pass count and the Shapley value ×6 (exact
    integer, negative = removals).

    Exactness: all 8 coalition counts fold as integers in ONE pass
    (the quality_gate_funnel kernel map); φ·6 is an integer linear
    combination — the efficiency identity Σφ·6 = 6·(v(full) − v(∅))
    holds exactly. Distributed shape: one map + one 8-integer
    aggregate; the 6-permutation fold is driver arithmetic.
    """
    import functools

    from ..stages import textstats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    gopher = functools.partial(textstats.gopher_rules_batch, min_stops=1)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        raw = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([t or "" for t in texts], pa.string()),
            }
        )
        g1 = gopher(raw).column("keep").to_numpy(zero_copy_only=False)
        structured = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(
                    [
                        textstats.derive_structured_page(i, t or "")
                        for i, t in zip(ids, texts)
                    ],
                    pa.string(),
                ),
            }
        )
        g2 = (
            textstats.c4_rules_batch(structured)
            .column("keep")
            .to_numpy(zero_copy_only=False)
        )
        g3 = np.array([l == "en" for l in langs], bool)
        cols = {"n": pa.array([len(ids)], pa.int64())}
        for name, mask in (
            ("k1", g1), ("k2", g2), ("k3", g3),
            ("k12", g1 & g2), ("k13", g1 & g3), ("k23", g2 & g3),
            ("k123", g1 & g2 & g3),
        ):
            cols[name] = pa.array([int(mask.sum())], pa.int64())
        return pa.table(cols)

    names = ("n", "k1", "k2", "k3", "k12", "k13", "k23", "k123")
    row = docs.map_batches(partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(c, alias_name=c) for c in names]
    )
    v = {c: int(row[c]) for c in names}

    def val(S: frozenset) -> int:
        if not S:
            return v["n"]
        key = "k" + "".join(str(i) for i in sorted(S))
        return v[key]

    import itertools

    phi6 = {1: 0, 2: 0, 3: 0}
    for perm in itertools.permutations((1, 2, 3)):
        S: frozenset = frozenset()
        for g in perm:
            phi6[g] += val(S | {g}) - val(S)
            S = S | {g}
    gates = {1: "gopher", 2: "c4", 3: "lang_en"}
    return pa.table(
        {
            "gate": pa.array([gates[g] for g in (1, 2, 3)], pa.string()),
            "solo_pass": pa.array(
                [v["k1"], v["k2"], v["k3"]], pa.int64()
            ),
            "phi6": pa.array([phi6[g] for g in (1, 2, 3)], pa.int64()),
            "n": pa.array([v["n"]] * 3, pa.int64()),
            "all_pass": pa.array([v["k123"]] * 3, pa.int64()),
        }
    )


def _sql_shapley_gates(oracles: dict) -> str:
    gopher_sql = oracles["gopher_rules"].strip()
    c4_sql = oracles["c4_rules"].strip()
    # phi*6 per gate as an integer linear combination of coalition
    # counts: phi_1*6 = 2(k1-n) + (k12-k2) + (k13-k3) + 2(k123-k23)
    return f"""
WITH gf AS ({gopher_sql}),
c4 AS ({c4_sql}),
j AS (
  SELECT gf.keep AS g1, c4.keep AS g2, (d.lang = 'en') AS g3
  FROM documents d
  JOIN gf ON gf.doc_id = d.doc_id
  JOIN c4 ON c4.doc_id = d.doc_id
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
         CAST(SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS k3,
         CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT)
           AS k12,
         CAST(SUM(CASE WHEN g1 AND g3 THEN 1 ELSE 0 END) AS BIGINT)
           AS k13,
         CAST(SUM(CASE WHEN g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT)
           AS k23,
         CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
              AS BIGINT) AS k123
  FROM j
)
SELECT 'gopher' AS gate, k1 AS solo_pass,
       2 * (k1 - n) + (k12 - k2) + (k13 - k3) + 2 * (k123 - k23)
         AS phi6,
       n, k123 AS all_pass
FROM agg
UNION ALL
SELECT 'c4', k2,
       2 * (k2 - n) + (k12 - k1) + (k23 - k3) + 2 * (k123 - k13),
       n, k123
FROM agg
UNION ALL
SELECT 'lang_en', k3,
       2 * (k3 - n) + (k13 - k1) + (k23 - k2) + 2 * (k123 - k12),
       n, k123
FROM agg
"""


# ---------------------------------------------------------------------------
# rle_runs — run-length layout benefit of sorting
# ---------------------------------------------------------------------------

_RLE_W = 100
_RLE_P = 16


def q_rle_runs(sf_dir: str):
    """Run-length encoding benefit of sort order: count the value runs
    of the (source, lang, length-bucket) key in physical doc_id order
    vs the sorted layout — runs ≈ RLE/dictionary block count, so
    runs_sorted/runs_physical is the compression-and-scan win of
    re-clustering the table (the sort-key decision every columnar
    store faces). Output: two rows (physical/sorted) with n, run count
    and the quantized runs-per-row.

    Exactness: physical runs = n − #{adjacent equal pairs}, counted by
    the tagged-union trick (each doc emits itself at doc_id and at
    doc_id+1; equal-key collisions count map-side per hash(doc_id)%P
    bucket — ONE bounded shuffle, no join); sorted runs = the number
    of distinct keys (sorted groups are contiguous) — one aggregate.
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "n_chars"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        key = [
            f"{s}|{l}|{int(c) // _RLE_W}"
            for s, l, c in zip(
                batch.column("source").to_pylist(),
                batch.column("lang").to_pylist(),
                batch.column("n_chars").to_pylist(),
            )
        ]
        pos = np.concatenate([ids, ids + 1])
        keys = key + key
        side = np.concatenate(
            [np.zeros(len(ids), np.int64), np.ones(len(ids), np.int64)]
        )
        return pa.table(
            {
                "bucket": pa.array(pos % _RLE_P, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "key": pa.array(keys, pa.string()),
                "side": pa.array(side, pa.int64()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        # arrow-native (r5): lexsorted pos runs; a pos with exactly 2
        # rows and equal keys counts once
        pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.asarray(g.column("key").to_pylist(), dtype=object)
        o = np.lexsort((key, pos))
        pos, key = pos[o], key[o]
        starts = np.flatnonzero(np.r_[True, pos[1:] != pos[:-1]]) if len(pos) else np.zeros(0, np.int64)
        ends = np.r_[starts[1:], len(pos)] if len(pos) else np.zeros(0, np.int64)
        sizes = ends - starts
        two = sizes == 2
        eq = int(
            sum(
                1
                for s in starts[two]
                if key[s] == key[s + 1]
            )
        )
        return pa.table({"eq": pa.array([eq], pa.int64())})

    eq_pairs = int(
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .sum("eq")
    )

    def key_partial(batch: pa.Table) -> pa.Table:
        keys = sorted(
            {
                f"{s}|{l}|{int(c) // _RLE_W}"
                for s, l, c in zip(
                    batch.column("source").to_pylist(),
                    batch.column("lang").to_pylist(),
                    batch.column("n_chars").to_pylist(),
                )
            }
        )
        return pa.table({"key": pa.array(keys, pa.string())})

    distinct_keys = (
        docs.map_batches(key_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(ray.data.aggregate.Count(alias_name="c"))
        .count()
    )
    n = docs.count()
    runs_phys = n - eq_pairs
    return pa.table(
        {
            "layout": pa.array(["physical", "sorted"], pa.string()),
            "n": pa.array([n, n], pa.int64()),
            "runs": pa.array([runs_phys, distinct_keys], pa.int64()),
            "runs_per_row_q": pa.array(
                [
                    runs_phys * 10**6 // n,
                    distinct_keys * 10**6 // n,
                ],
                pa.int64(),
            ),
        }
    )


SQL_RLE_RUNS = f"""
WITH k AS (
  SELECT doc_id,
         source || '|' || lang || '|'
           || CAST(n_chars // {_RLE_W} AS VARCHAR) AS key
  FROM documents
),
lagk AS (
  SELECT key, lag(key) OVER (ORDER BY doc_id) AS pk FROM k
),
phys AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT)
           - CAST(SUM(CASE WHEN key = pk THEN 1 ELSE 0 END) AS BIGINT)
           AS runs
  FROM lagk
),
srt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT key) AS BIGINT) AS runs
  FROM k
)
SELECT 'physical' AS layout, n, runs, runs * 1000000 // n
  AS runs_per_row_q FROM phys
UNION ALL
SELECT 'sorted', n, runs, runs * 1000000 // n FROM srt
"""


def register(queries: dict, oracles: dict, sql_pages: str) -> None:
    queries["cascade_ltm"] = q_cascade_ltm
    oracles["cascade_ltm"] = _sql_cascade_ltm()
    queries["shapley_gates"] = q_shapley_gates
    oracles["shapley_gates"] = _sql_shapley_gates(oracles)
    queries["rle_runs"] = q_rle_runs
    oracles["rle_runs"] = SQL_RLE_RUNS

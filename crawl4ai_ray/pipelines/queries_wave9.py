"""Ninth-wave operators (round-3 continuation session, 2026-08-19).

Registered into the main query/oracle registries via ``register()`` —
called from the tail of ``queries.py`` (same contract as
``queries_wave8.register``).

House rules throughout: Arrow batches end to end, map-side partials
before any groupby, broadcast small sides via ``ray.put``, bucketed
union+groupby instead of ``Dataset.join``, and an operand-for-operand
DuckDB oracle for every query (scalar libm transcendentals, ordered
window sums for float accumulation, integer cross-multiplication with
at most one division per float output column).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


# ---------------------------------------------------------------------------
# token_entropy — per-doc Shannon entropy of the token distribution
# ---------------------------------------------------------------------------

def q_token_entropy(sf_dir: str):
    """Per-document token-distribution Shannon entropy — a classic
    quality/diversity feature (low entropy = repetitive/templated text;
    complements lexical_diversity's type-token ratio with a
    frequency-weighted measure). H = ln(n) − (Σ c·ln c)/n over the
    distinct-token counts c.

    Float discipline: each c·ln c term is quantized to fixed point
    (floor(term·1e9 + 0.5) — the same trick logreg_quality uses for its
    gradient sums) so Σ is an ORDER-INDEPENDENT int64 sum; a first cut
    that summed doubles in sorted-token order drifted 1 ulp on 9% of
    docs because DuckDB's cumulative window SUM is not strictly
    sequential. ln is scalar libm in both engines; the final expression
    is the identical dequantize → divide → subtract chain. Pure map
    stage — nothing shuffles."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def entropy(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        n_tok, n_types, ent = [], [], []
        for text in batch.column("text").to_pylist():
            # str.split(' ') mirrors DuckDB string_split(text, ' ')
            # (consecutive separators produce empty tokens in BOTH)
            counts = Counter((text or "").split(" "))
            n = sum(counts.values())
            acc = 0
            for c in counts.values():
                acc += math.floor(float(c) * math.log(float(c)) * 1e9 + 0.5)
            n_tok.append(n)
            n_types.append(len(counts))
            ent.append(
                math.log(float(n)) - float(acc) / 1e9 / float(n) if n else 0.0
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    return docs.map_batches(entropy, batch_format="pyarrow")


SQL_TOKEN_ENTROPY = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
c AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM t GROUP BY doc_id, tok
),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CAST(floor(
           CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1e9
             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS acc_fp
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_tok, n_types,
       ln(CAST(n_tok AS DOUBLE))
         - CAST(acc_fp AS DOUBLE) / 1e9 / CAST(n_tok AS DOUBLE) AS entropy
FROM agg
"""


# ---------------------------------------------------------------------------
# assoc_rules — event-type association rules over (user, day) baskets
# ---------------------------------------------------------------------------

def q_assoc_rules(sf_dir: str):
    """Market-basket association rules over per-(user, day) event-type
    sets: for every ordered type pair (x → y) co-occurring in ≥ 25
    baskets, the support / confidence / lift triple. Distinct baskets
    via ONE groupby; pair generation is a vectorized pandas self-merge
    inside hash(basket)%P buckets (never one scheduling unit per
    basket); the 5-row type marginals are broadcast. Every float output
    is ONE division of exact int64 products, bit-identical in both
    engines."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def basket_rows(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()).cast(pa.int32())
        users = batch.column("user_id").cast(pa.int64())
        bk = pa.compute.add(
            pa.compute.multiply(users, pa.scalar(1_000_000, pa.int64())),
            days.cast(pa.int64()),
        )
        return pa.table({"bk": bk, "event_type": batch.column("event_type")})

    distinct = (
        events.map_batches(basket_rows, batch_format="pyarrow")
        .groupby(["bk", "event_type"])
        .count()
        .select_columns(["bk", "event_type"])
        .materialize()  # consumed three times (pairs, marginals, basket count)
    )

    n_baskets = (
        distinct.groupby("bk").count().count()
    )
    marg = {
        r["event_type"]: int(r["count()"])
        for r in distinct.groupby("event_type").count().take_all()
    }
    marg_ref = ray.put(marg)

    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        bk = batch.column("bk").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((bk % P).astype(np.int64), pa.int64())
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        m = g[["bk", "event_type"]].merge(g[["bk", "event_type"]], on="bk")
        m = m[m["event_type_x"] != m["event_type_y"]]
        return pa.table(
            {
                "x": pa.array(m["event_type_x"].tolist(), pa.string()),
                "y": pa.array(m["event_type_y"].tolist(), pa.string()),
            }
        )

    nxy = (
        distinct.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby(["x", "y"])
        .count()
    )

    def score(batch: pa.Table) -> pa.Table:
        mg = ray.get(marg_ref)
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        n_xy = batch.column("count()").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = n_xy >= 25
        xs = [x for x, k in zip(xs, keep) if k]
        ys = [y for y, k in zip(ys, keep) if k]
        n_xy = n_xy[keep]
        n_x = np.array([mg[x] for x in xs], np.int64)
        n_y = np.array([mg[y] for y in ys], np.int64)
        nb = np.int64(n_baskets)
        return pa.table(
            {
                "antecedent": pa.array(xs, pa.string()),
                "consequent": pa.array(ys, pa.string()),
                "n_xy": pa.array(n_xy, pa.int64()),
                "n_x": pa.array(n_x, pa.int64()),
                "n_y": pa.array(n_y, pa.int64()),
                "n_baskets": pa.array(np.full(len(xs), nb), pa.int64()),
                "support": pa.array(
                    n_xy.astype(np.float64) / np.float64(nb), pa.float64()
                ),
                "confidence": pa.array(
                    n_xy.astype(np.float64) / n_x.astype(np.float64),
                    pa.float64(),
                ),
                "lift": pa.array(
                    (n_xy * nb).astype(np.float64)
                    / (n_x * n_y).astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return nxy.map_batches(score, batch_format="pyarrow")


SQL_ASSOC_RULES = """
WITH b AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type FROM events
),
p AS (
  SELECT b1.event_type AS x, b2.event_type AS y
  FROM b b1 JOIN b b2
    ON b1.user_id = b2.user_id AND b1.d = b2.d
   AND b1.event_type <> b2.event_type
),
nxy AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM p GROUP BY x, y
),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT user_id, d FROM b)
)
SELECT nxy.x AS antecedent, nxy.y AS consequent, nxy.n_xy,
       mx.n AS n_x, my.n AS n_y, nb.n AS n_baskets,
       CAST(nxy.n_xy AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
       CAST(nxy.n_xy AS DOUBLE) / CAST(mx.n AS DOUBLE) AS confidence,
       CAST(nxy.n_xy * nb.n AS DOUBLE) / CAST(mx.n * my.n AS DOUBLE) AS lift
FROM nxy
JOIN m mx ON mx.event_type = nxy.x
JOIN m my ON my.event_type = nxy.y
CROSS JOIN nb
WHERE nxy.n_xy >= 25
"""


# ---------------------------------------------------------------------------
# cocitation_pairs — co-citation + bibliographic coupling on the link graph
# ---------------------------------------------------------------------------

def q_cocitation_pairs(sf_dir: str):
    """Co-citation (|in(a) ∩ in(b)|, pages cited together) and
    bibliographic coupling (|out(a) ∩ out(b)|, pages citing the same
    targets) over the DIRECTED synthetic link graph — the two classic
    directed-wedge similarity measures HITS/link_prediction don't give
    (link_prediction works on the undirected simple graph). Two
    per-pivot wedge enumerations (pivot = citing page for co-citation,
    pivot = cited page for coupling), each a bucketed map_groups over
    hash(pivot)%P with a per-pivot neighbor cap; the two pair streams
    union with side flags into ONE groupby-sum. Only (pivot, neighbor)
    ids ever shuffle."""
    from .queries import _synthetic_link_edges

    edges = _synthetic_link_edges(sf_dir)

    def distinct_directed(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table(
            {
                "src": pa.array(s[keep], pa.int64()),
                "dst": pa.array(d[keep], pa.int64()),
            }
        )

    e = (
        edges.map_batches(distinct_directed, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()  # consumed by both wedge passes
    )

    P = 32
    CAP = 256  # per-pivot neighbor cap (synthetic degrees ≤ ~6; documented
    # recall loss above the cap, same discipline as link_prediction)

    def make_wedges(pivot_col: str, other_col: str, is_cocite: int):
        def tag(batch: pa.Table) -> pa.Table:
            piv = batch.column(pivot_col).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": pa.array((piv % P).astype(np.int64), pa.int64()),
                    "pivot": pa.array(piv, pa.int64()),
                    "other": batch.column(other_col).cast(pa.int64()),
                }
            )

        def wedges(g: pd.DataFrame) -> pa.Table:
            out_a, out_b = [], []
            for _, grp in g.groupby("pivot", sort=False):
                nb = np.sort(grp["other"].to_numpy(dtype=np.int64))[:CAP]
                if len(nb) < 2:
                    continue
                ia, ib = np.triu_indices(len(nb), k=1)
                out_a.append(nb[ia])
                out_b.append(nb[ib])
            a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
            b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
            n = len(a)
            return pa.table(
                {
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64()),
                    "co": pa.array(
                        np.full(n, is_cocite, np.int64), pa.int64()
                    ),
                    "cp": pa.array(
                        np.full(n, 1 - is_cocite, np.int64), pa.int64()
                    ),
                }
            )

        return (
            e.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(wedges, batch_format="pandas")
        )

    cocite = make_wedges("src", "dst", 1)   # pairs of dsts sharing a src
    couple = make_wedges("dst", "src", 0)   # pairs of srcs sharing a dst

    both = cocite.union(couple).groupby(["a", "b"]).aggregate(
        ray.data.aggregate.Sum("co", alias_name="cocitation"),
        ray.data.aggregate.Sum("cp", alias_name="coupling"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "cocitation": batch.column("cocitation").cast(pa.int64()),
                "coupling": batch.column("coupling").cast(pa.int64()),
            }
        )

    return both.map_batches(finish, batch_format="pyarrow")


SQL_COCITATION_PAIRS = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST((2 * doc_id + 1) % nn.c AS BIGINT) AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL
  SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
co AS (
  SELECT e1.dst AS a, e2.dst AS b
  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
),
cp AS (
  SELECT e1.src AS a, e2.src AS b
  FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
)
SELECT a, b,
       CAST(SUM(co) AS BIGINT) AS cocitation,
       CAST(SUM(cp) AS BIGINT) AS coupling
FROM (
  SELECT a, b, 1 AS co, 0 AS cp FROM co
  UNION ALL
  SELECT a, b, 0, 1 FROM cp
)
GROUP BY a, b
"""


# ---------------------------------------------------------------------------
# community_modularity — Newman modularity of the LPA communities
# ---------------------------------------------------------------------------

def q_community_modularity(sf_dir: str):
    """Newman modularity readout for the label_communities partition —
    the quality gate a real pipeline runs after any community step.
    Per community c over the undirected simple graph restricted to
    labeled nodes: intra-edge count l_c, total endpoint degree d_c, and
    the exact integer numerator q_num = 4·m·l_c − d_c² of the
    modularity term (q_term = q_num / 4m², ONE division → bit-equal
    doubles; global Q = Σ q_term is left to the reader so no float sum
    crosses rows). Labels ride onto the edge list via two bucketed
    attach_node_value passes (union+groupby, no Dataset.join); the
    per-community stats are map-side np partials into one tiny
    groupby-sum."""
    from ..stages.graph import (
        attach_node_value,
        label_propagation,
        undirected_dedup,
    )
    from .queries import _synthetic_link_edges

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    edges = _synthetic_link_edges(sf_dir)
    labels = label_propagation(
        nodes, edges, seeds={i: i for i in range(5)}, n_sweeps=4
    ).materialize()  # consumed by two attaches + the n_nodes aggregate

    ue = undirected_dedup(_synthetic_link_edges(sf_dir))
    e1 = attach_node_value(ue, labels, "a", "ca", ["a", "b"])
    e2 = attach_node_value(e1, labels, "b", "cb", ["a", "b", "ca"])

    def keep_labeled(batch: pa.Table) -> pa.Table:
        ca = batch.column("ca").to_numpy(zero_copy_only=False)
        cb = batch.column("cb").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ca >= 0) & (cb >= 0)))

    re = e2.map_batches(keep_labeled, batch_format="pyarrow").materialize()
    m = re.count()

    def edge_partials(batch: pa.Table) -> pa.Table:
        ca = batch.column("ca").to_numpy(zero_copy_only=False)
        cb = batch.column("cb").to_numpy(zero_copy_only=False)
        # d_c: every endpoint; l_c: intra edges once (on ca == cb)
        comms, d = np.unique(np.concatenate([ca, cb]), return_counts=True)
        intra_c, intra_n = np.unique(ca[ca == cb], return_counts=True)
        lmap = dict(zip(intra_c, intra_n))
        return pa.table(
            {
                "community": pa.array(comms, pa.int64()),
                "l_c": pa.array(
                    [int(lmap.get(c, 0)) for c in comms], pa.int64()
                ),
                "d_c": pa.array(d.astype(np.int64), pa.int64()),
                "n_nodes": pa.array(np.zeros(len(comms), np.int64), pa.int64()),
            }
        )

    def node_partials(batch: pa.Table) -> pa.Table:
        c, n = np.unique(
            batch.column("community").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        z = np.zeros(len(c), np.int64)
        return pa.table(
            {
                "community": pa.array(c, pa.int64()),
                "l_c": pa.array(z, pa.int64()),
                "d_c": pa.array(z, pa.int64()),
                "n_nodes": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    combined = (
        re.map_batches(edge_partials, batch_format="pyarrow")
        .union(labels.map_batches(node_partials, batch_format="pyarrow"))
        .groupby("community")
        .aggregate(
            ray.data.aggregate.Sum("l_c", alias_name="l_c"),
            ray.data.aggregate.Sum("d_c", alias_name="d_c"),
            ray.data.aggregate.Sum("n_nodes", alias_name="n_nodes"),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        l_c = batch.column("l_c").to_numpy(zero_copy_only=False).astype(np.int64)
        d_c = batch.column("d_c").to_numpy(zero_copy_only=False).astype(np.int64)
        q_num = 4 * m * l_c - d_c * d_c
        q_term = q_num.astype(np.float64) / np.float64(4 * m * m)
        return pa.table(
            {
                "community": batch.column("community").cast(pa.int64()),
                "n_nodes": batch.column("n_nodes").cast(pa.int64()),
                "l_c": pa.array(l_c, pa.int64()),
                "d_c": pa.array(d_c, pa.int64()),
                "q_num": pa.array(q_num, pa.int64()),
                "q_term": pa.array(q_term, pa.float64()),
            }
        )

    return combined.map_batches(score, batch_format="pyarrow")


def _community_modularity_sql(n_sweeps: int = 4) -> str:
    from .queries import _label_prop_ctes

    return (
        "WITH "
        + _label_prop_ctes(n_sweeps)
        + f""",
lab AS MATERIALIZED (
  SELECT node, CAST(lbl AS BIGINT) AS community
  FROM lab{n_sweeps} WHERE lbl IS NOT NULL
),
ue AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst
),
re AS MATERIALIZED (
  SELECT ue.a, ue.b, la.community AS ca, lb.community AS cb
  FROM ue JOIN lab la ON la.node = ue.a JOIN lab lb ON lb.node = ue.b
),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM re),
lc AS (
  SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS l_c
  FROM re WHERE ca = cb GROUP BY 1
),
dc AS (
  SELECT community, CAST(COUNT(*) AS BIGINT) AS d_c FROM (
    SELECT ca AS community FROM re UNION ALL SELECT cb FROM re
  ) GROUP BY 1
),
nc AS (
  SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lab GROUP BY 1
)
SELECT nc.community, nc.n_nodes,
       CAST(COALESCE(lc.l_c, 0) AS BIGINT) AS l_c,
       CAST(COALESCE(dc.d_c, 0) AS BIGINT) AS d_c,
       CAST(4 * mm.m * COALESCE(lc.l_c, 0)
            - COALESCE(dc.d_c, 0) * COALESCE(dc.d_c, 0) AS BIGINT) AS q_num,
       CAST(4 * mm.m * COALESCE(lc.l_c, 0)
            - COALESCE(dc.d_c, 0) * COALESCE(dc.d_c, 0) AS DOUBLE)
         / CAST(4 * mm.m * mm.m AS DOUBLE) AS q_term
FROM nc
LEFT JOIN lc USING (community)
LEFT JOIN dc USING (community)
CROSS JOIN mm
"""
    )


# ---------------------------------------------------------------------------
# hard_negatives — nearest different-label neighbor per query embedding
# ---------------------------------------------------------------------------

def q_hard_negatives(sf_dir: str):
    """Contrastive-training hard-negative mining: for each query vector
    (vec_id % 50 == 0) the single nearest neighbor carrying a DIFFERENT
    label — exact integer fixed-point squared L2 (the brute_l2fp
    quantize + tie discipline: ties → lowest neighbor id), so the
    oracle recomputes it operand-for-operand. Broadcast (Q, d) query
    matrix + labels, per-batch masked argmin, one tiny per-query
    reduce. The embeddings table streams once; nothing but (query,
    candidate) rows shuffle."""
    from ..stages.cluster import quantize_embeddings

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def pick_queries(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 50 == 0))

    qrows = emb.map_batches(pick_queries, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qtab = pa.Table.from_pylist(qrows)
    q_fp = quantize_embeddings(qtab)
    q_ids = np.array([r["vec_id"] for r in qrows], np.int64)
    q_labels = np.array([r["label"] for r in qrows], np.int64)
    q_ref = ray.put((q_ids, q_labels, q_fp))

    class HardNeg:
        def __init__(self):
            self.q_ids, self.q_labels, self.q_fp = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {
                "query_id": [],
                "query_label": [],
                "neg_id": [],
                "neg_label": [],
                "dist_fp": [],
            }
            if batch.num_rows:
                ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
                labels = batch.column("label").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                x = quantize_embeddings(batch)
                for qi in range(len(self.q_ids)):
                    mask = labels != self.q_labels[qi]
                    if not mask.any():
                        continue
                    diff = x[mask] - self.q_fp[qi][None, :]
                    dist = np.einsum("nd,nd->n", diff, diff)
                    cand_ids = ids[mask]
                    best = np.lexsort((cand_ids, dist))[0]
                    out["query_id"].append(int(self.q_ids[qi]))
                    out["query_label"].append(int(self.q_labels[qi]))
                    out["neg_id"].append(int(cand_ids[best]))
                    out["neg_label"].append(int(labels[mask][best]))
                    out["dist_fp"].append(int(dist[best]))
            return pa.table(
                {k: pa.array(v, pa.int64()) for k, v in out.items()}
            )

    cand = emb.map_batches(
        HardNeg, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    )

    def reduce_q(group: pa.Table) -> pa.Table:
        dist = group.column("dist_fp").to_numpy(zero_copy_only=False)
        nid = group.column("neg_id").to_numpy(zero_copy_only=False)
        best = np.lexsort((nid, dist))[0]
        return group.take([best])

    return cand.groupby("query_id").map_groups(reduce_q, batch_format="pyarrow")


SQL_HARD_NEGATIVES = """
WITH q AS (
  SELECT vec_id AS qid, label AS qlab, embedding AS e
  FROM embeddings WHERE vec_id % 50 = 0
),
qf AS (
  SELECT qid, generate_subscripts(e, 1) AS dim,
         CAST(floor(CAST(unnest(e) AS DOUBLE) * 1048576.0
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM q
),
xf AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM embeddings
),
d AS (
  SELECT qf.qid, xf.vec_id,
         CAST(SUM((qf.v - xf.v) * (qf.v - xf.v)) AS BIGINT) AS dist_fp
  FROM qf JOIN xf USING (dim)
  GROUP BY qf.qid, xf.vec_id
),
r AS (
  SELECT d.qid AS query_id,
         CAST(ql.label AS BIGINT) AS query_label,
         d.vec_id AS neg_id,
         CAST(xl.label AS BIGINT) AS neg_label,
         d.dist_fp,
         row_number() OVER (
           PARTITION BY d.qid ORDER BY d.dist_fp, d.vec_id
         ) AS rn
  FROM d
  JOIN embeddings ql ON ql.vec_id = d.qid
  JOIN embeddings xl ON xl.vec_id = d.vec_id
  WHERE xl.label <> ql.label
)
SELECT query_id, query_label, neg_id, neg_label, dist_fp
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

def register(queries: dict, oracles: dict, sql_pages: str) -> None:
    queries["token_entropy"] = q_token_entropy
    oracles["token_entropy"] = SQL_TOKEN_ENTROPY
    queries["assoc_rules"] = q_assoc_rules
    oracles["assoc_rules"] = SQL_ASSOC_RULES
    queries["cocitation_pairs"] = q_cocitation_pairs
    oracles["cocitation_pairs"] = SQL_COCITATION_PAIRS
    queries["community_modularity"] = q_community_modularity
    oracles["community_modularity"] = _community_modularity_sql()
    queries["hard_negatives"] = q_hard_negatives
    oracles["hard_negatives"] = SQL_HARD_NEGATIVES

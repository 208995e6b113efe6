"""Fifty-ninth-wave operators (round-3 continuation session,
2026-08-21) — Bloom set algebra, RANSAC, quantile treatment effects.

Registered into the main query/oracle registries via ``register()`` —
called from the tail of ``queries.py``.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

import ray


# ---------------------------------------------------------------------------
# bloom_intersect_est — intersection estimate from Bloom bit counts
# ---------------------------------------------------------------------------

_BI_M = 4096
_BI_K = 3


def _bi_positions(url: str) -> list[int]:
    h = hashlib.md5(f"bi|{url}".encode()).hexdigest()
    return [int(h[8 * j : 8 * j + 8], 16) % _BI_M for j in range(_BI_K)]


def q_bloom_intersect_est(sf_dir: str):
    """Set-intersection estimation from Bloom filter BIT COUNTS alone
    (Swamidass–Baldi): insert url-set A (doc_id%2==0) and B
    (doc_id%3==0) into m={m}, k={k} filters; with t set bits,
    n̂ = −(m/k)·ln(1−t/m), and |A∩B| ≈ n̂_A + n̂_B − n̂_{{A∪B}} — the
    way two crawl shards compare coverage WITHOUT exchanging url sets
    (union filter = OR of bit arrays; here: distinct positions of
    either set). Ground truth |A∩B| = docs with doc_id%6==0 for audit.
    Output: one row with bit counts, true sizes and the three
    estimates.

    Exactness: bit positions are md5 integers; the three set-bit
    counts are exact distinct counts; each estimate is the identical
    mirrored double expression (one ln each). Distributed shape:
    position generation is a flat map; the distinct-position counts
    are three bounded aggregates (≤ m rows each).
    """
    from .queries import _pages_ds

    pages = _pages_ds(sf_dir, columns=["url"])

    def positions(batch: pa.Table) -> pa.Table:
        rows = {"pos": [], "in_a": [], "in_b": []}
        for u in batch.column("url").to_pylist():
            d = int(u.rsplit("/", 1)[1])
            a, b = int(d % 2 == 0), int(d % 3 == 0)
            if not (a or b):
                continue
            for p in _bi_positions(u):
                rows["pos"].append(p)
                rows["in_a"].append(a)
                rows["in_b"].append(b)
        return pa.table(
            {
                "pos": pa.array(rows["pos"], pa.int64()),
                "in_a": pa.array(rows["in_a"], pa.int64()),
                "in_b": pa.array(rows["in_b"], pa.int64()),
            }
        )

    bits = (
        pages.map_batches(positions, batch_format="pyarrow")
        .groupby("pos")
        .aggregate(
            ray.data.aggregate.Max("in_a", alias_name="a"),
            ray.data.aggregate.Max("in_b", alias_name="b"),
        )
        .take_all()  # bounded: one row per position
    )
    ta = sum(1 for r in bits if r["a"])
    tb = sum(1 for r in bits if r["b"])
    tu = len(bits)

    def truth(batch: pa.Table) -> pa.Table:
        ids = np.array(
            [
                int(u.rsplit("/", 1)[1])
                for u in batch.column("url").to_pylist()
            ],
            np.int64,
        )
        return pa.table(
            {
                "na": pa.array([int((ids % 2 == 0).sum())], pa.int64()),
                "nb": pa.array([int((ids % 3 == 0).sum())], pa.int64()),
                "ni": pa.array([int((ids % 6 == 0).sum())], pa.int64()),
            }
        )

    tr = pages.map_batches(truth, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Sum("na", alias_name="na"),
        ray.data.aggregate.Sum("nb", alias_name="nb"),
        ray.data.aggregate.Sum("ni", alias_name="ni"),
    )

    def est(t: int) -> float:
        return (
            -(float(_BI_M) / float(_BI_K))
            * math.log(1.0 - float(t) / float(_BI_M))
        )

    ea, eb, eu = est(ta), est(tb), est(tu)
    return pa.table(
        {
            "t_a": pa.array([ta], pa.int64()),
            "t_b": pa.array([tb], pa.int64()),
            "t_union": pa.array([tu], pa.int64()),
            "n_a": pa.array([int(tr["na"])], pa.int64()),
            "n_b": pa.array([int(tr["nb"])], pa.int64()),
            "n_inter": pa.array([int(tr["ni"])], pa.int64()),
            "est_a": pa.array([ea], pa.float64()),
            "est_b": pa.array([eb], pa.float64()),
            "est_inter": pa.array([ea + eb - eu], pa.float64()),
        }
    )


def _sql_bloom_intersect(sql_pages: str) -> str:
    m, k = _BI_M, _BI_K
    pos_sel = " UNION ALL ".join(
        f"""SELECT doc_id,
         CAST(('0x' || substr(md5('bi|' || url), {8 * j + 1}, 8))
              AS BIGINT) % {m} AS pos
  FROM purl WHERE doc_id % 2 = 0 OR doc_id % 3 = 0"""
        for j in range(k)
    )
    e = (
        f"-(CAST({m} AS DOUBLE) / CAST({k} AS DOUBLE))"
        " * ln(1e0 - CAST({t} AS DOUBLE) / CAST(" + str(m) + " AS DOUBLE))"
    )
    return f"""
WITH {sql_pages},
posx AS ({pos_sel}),
bits AS (
  SELECT pos,
         CAST(MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(MAX(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM posx GROUP BY pos
),
t AS (
  SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb,
         CAST(COUNT(*) AS BIGINT) AS tu
  FROM bits
),
truth AS (
  SELECT CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
         CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ni
  FROM purl
)
SELECT t.ta AS t_a, t.tb AS t_b, t.tu AS t_union,
       truth.na AS n_a, truth.nb AS n_b, truth.ni AS n_inter,
       {e.format(t="t.ta")} AS est_a,
       {e.format(t="t.tb")} AS est_b,
       {e.format(t="t.ta")} + {e.format(t="t.tb")}
         - {e.format(t="t.tu")} AS est_inter
FROM t, truth
"""


# ---------------------------------------------------------------------------
# ransac_line — robust line fit with planted outliers
# ---------------------------------------------------------------------------

_RA_TRIALS = 32
_RA_TOL = 200
_RA_OUT_MOD = 41
_RA_OUT_SHIFT = 5000
_RA_SQ = 10**6


def q_ransac_line(sf_dir: str):
    """RANSAC line fit of chars ~ tokens with planted outliers
    (doc_id%{om}==0 gets +{os} chars): {t} md5-seeded trials each draw
    two support points and count inliers within ±{tol} chars; the
    best-consensus model wins — the robust fit OLS can't give you
    when a corruption process contaminates the column. Output: one
    row with the winning trial, its support points, inlier count and
    the quantized slope.

    Exactness: the inlier test cross-multiplies integers
    (|(y−y1)·dx − (x−x1)·dy| ≤ tol·|dx|); degenerate draws (dx=0 or
    identical indices) score −1 inliers; winner ties break by trial
    ASC; the slope quantizes by sign-split division. Distributed
    shape: inlier counting is one map over documents evaluating ALL
    {t} trials vectorized per batch + one {t}-column aggregate.
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    n_docs = docs.count()
    trials = []
    for t in range(_RA_TRIALS):
        i1 = int(
            hashlib.md5(f"ra|{t}|1".encode()).hexdigest()[:13], 16
        ) % n_docs
        i2 = int(
            hashlib.md5(f"ra|{t}|2".encode()).hexdigest()[:13], 16
        ) % n_docs
        trials.append((t, i1, i2))

    def feats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        x = np.fromiter(
            (
                len((t or "").split())
                for t in batch.column("text").to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        y = batch.column("n_chars").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        y = y + _RA_OUT_SHIFT * (ids % _RA_OUT_MOD == 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    pts = docs.map_batches(feats, batch_format="pyarrow").materialize()
    sup_ids = {i for _, i1, i2 in trials for i in (i1, i2)}

    def sup_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.isin(ids, np.array(sorted(sup_ids), np.int64))
        return batch.filter(pa.array(keep))

    sup = {
        int(r["doc_id"]): (int(r["x"]), int(r["y"]))
        for r in pts.map_batches(
            sup_filter, batch_format="pyarrow"
        ).take_all()  # bounded: filtered support set
    }

    def inliers(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        cols = {}
        for t, i1, i2 in trials:
            x1, y1 = sup[i1]
            x2, y2 = sup[i2]
            dx, dy = x2 - x1, y2 - y1
            if i1 == i2 or dx == 0:
                cols[f"c{t}"] = pa.array([0], pa.int64())
                continue
            lhs = np.abs((y - y1) * dx - (x - x1) * dy)
            cols[f"c{t}"] = pa.array(
                [int((lhs <= _RA_TOL * abs(dx)).sum())], pa.int64()
            )
        return pa.table(cols)

    row = pts.map_batches(inliers, batch_format="pyarrow").aggregate(
        *[
            ray.data.aggregate.Sum(f"c{t}", alias_name=f"c{t}")
            for t in range(_RA_TRIALS)
        ]
    )
    best = None
    for t, i1, i2 in trials:
        x1, y1 = sup[i1]
        x2, y2 = sup[i2]
        c = -1 if (i1 == i2 or x2 == x1) else int(row[f"c{t}"])
        cand = (-c, t)
        if best is None or cand < best[0]:
            best = (cand, t, i1, i2, c)
    _, t, i1, i2, c = best
    x1, y1 = sup[i1]
    x2, y2 = sup[i2]
    dx, dy = x2 - x1, y2 - y1
    mag = abs(dy) * _RA_SQ // abs(dx)
    slope_q = -mag if (dy < 0) != (dx < 0) else mag
    return pa.table(
        {
            "best_trial": pa.array([t], pa.int64()),
            "x1": pa.array([x1], pa.int64()),
            "y1": pa.array([y1], pa.int64()),
            "x2": pa.array([x2], pa.int64()),
            "y2": pa.array([y2], pa.int64()),
            "inliers": pa.array([c], pa.int64()),
            "n": pa.array([n_docs], pa.int64()),
            "slope_q": pa.array([slope_q], pa.int64()),
        }
    )


def _sql_ransac() -> str:
    return f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents),
pts AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS x,
         CAST(n_chars AS BIGINT)
           + CASE WHEN doc_id % {_RA_OUT_MOD} = 0
                  THEN {_RA_OUT_SHIFT} ELSE 0 END AS y
  FROM documents
),
tr AS (
  SELECT t.range AS t,
         CAST(('0x' || substr(md5('ra|' || t.range || '|1'), 1, 13))
              AS BIGINT) % nn.c AS i1,
         CAST(('0x' || substr(md5('ra|' || t.range || '|2'), 1, 13))
              AS BIGINT) % nn.c AS i2
  FROM range({_RA_TRIALS}) t, nn
),
mdl AS (
  SELECT tr.t, tr.i1, tr.i2,
         p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2,
         p2.x - p1.x AS dx, p2.y - p1.y AS dy
  FROM tr
  JOIN pts p1 ON p1.doc_id = tr.i1
  JOIN pts p2 ON p2.doc_id = tr.i2
),
cnt AS (
  SELECT mdl.t, mdl.i1, mdl.i2, mdl.x1, mdl.y1, mdl.x2, mdl.y2,
         mdl.dx, mdl.dy,
         CASE WHEN mdl.i1 = mdl.i2 OR mdl.dx = 0 THEN -1
              ELSE CAST(SUM(CASE WHEN abs((p.y - mdl.y1) * mdl.dx
                                          - (p.x - mdl.x1) * mdl.dy)
                                      <= {_RA_TOL} * abs(mdl.dx)
                                 THEN 1 ELSE 0 END) AS BIGINT)
         END AS c
  FROM mdl CROSS JOIN pts p
  GROUP BY mdl.t, mdl.i1, mdl.i2, mdl.x1, mdl.y1, mdl.x2, mdl.y2,
           mdl.dx, mdl.dy
),
best AS (SELECT * FROM cnt ORDER BY c DESC, t LIMIT 1)
SELECT best.t AS best_trial, best.x1, best.y1, best.x2, best.y2,
       best.c AS inliers,
       nn.c AS n,
       CAST(CASE WHEN dy < 0
                 THEN -((-dy) * {_RA_SQ} // dx)
                 ELSE dy * {_RA_SQ} // dx END AS BIGINT) AS slope_q
FROM best, nn
"""


# ---------------------------------------------------------------------------
# qte_quantiles — quantile treatment effects between user cohorts
# ---------------------------------------------------------------------------

_QTE_PCTS = ((1, 10), (1, 4), (1, 2), (3, 4), (9, 10))


def q_qte_quantiles(sf_dir: str):
    """Quantile treatment effects between the user_id%5==0 cohort and
    control on per-user total spend: at each probability p the QTE is
    Q_treat(p) − Q_control(p) — where diff_in_diff reads ONE mean
    shift, QTE reveals WHERE in the distribution the cohorts differ
    (heavy spenders vs the median user). Output: one row per p with
    both exact order statistics and the difference.

    Exactness: per-user spend is integer cents (the CUPED snap);
    quantiles are exact type-1 order statistics k = ⌈p·n⌉ computed by
    integer ceil-division; QTE is an integer difference. Distributed
    shape (r4 — formerly a user-sized driver fold): one groupby(user)
    sum, then the exact_percentiles pattern — per-(arm, value) counts
    via a second groupby, so the driver folds only the bounded
    value HISTOGRAM (distinct spend levels, not users) and reads the
    order statistics off cumulative counts.
    """
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        val = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "cents": pa.array(
                    np.floor(val * 100.0 + 0.5).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def arm_value(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "grp": pa.array((uid % 5 == 0).astype(np.int64), pa.int64()),
                "s": batch.column("s"),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    hist_rows = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(ray.data.aggregate.Sum("cents", alias_name="s"))
        .map_batches(arm_value, batch_format="pyarrow")
        .groupby(["grp", "s"])
        .aggregate(ray.data.aggregate.Sum("one", alias_name="n"))
        .take_all()  # bounded: (arm × distinct spend value) histogram cells
    )
    hists = {0: [], 1: []}
    for r in hist_rows:
        hists[int(r["grp"])].append((int(r["s"]), int(r["n"])))
    for g in hists:
        hists[g].sort()

    def orderstat(hist, pn, pd):
        total = sum(c for _, c in hist)
        k = (pn * total + pd - 1) // pd
        cum = 0
        for v, c in hist:
            cum += c
            if cum >= k:
                return k, v
        return k, hist[-1][0] if hist else 0

    treat, ctrl = hists[1], hists[0]

    out = {"p_num": [], "p_den": [], "k_t": [], "q_t": [], "k_c": [], "q_c": [], "qte": []}
    for pn, pd in _QTE_PCTS:
        kt, qt = orderstat(treat, pn, pd)
        kc, qc = orderstat(ctrl, pn, pd)
        out["p_num"].append(pn)
        out["p_den"].append(pd)
        out["k_t"].append(kt)
        out["q_t"].append(qt)
        out["k_c"].append(kc)
        out["q_c"].append(qc)
        out["qte"].append(qt - qc)
    return pa.table(
        {k: pa.array(v, pa.int64()) for k, v in out.items()}
    )


def _sql_qte() -> str:
    rows = []
    for pn, pd in _QTE_PCTS:
        rows.append(
            f"""
SELECT CAST({pn} AS BIGINT) AS p_num, CAST({pd} AS BIGINT) AS p_den,
       tq.k AS k_t, tq.q AS q_t, cq.k AS k_c, cq.q AS q_c,
       tq.q - cq.q AS qte
FROM (
  SELECT CAST(({pn} * COUNT(*) OVER () + {pd} - 1) // {pd} AS BIGINT)
           AS k, s AS q,
         row_number() OVER (ORDER BY s) AS rn
  FROM u WHERE grp = 1
  QUALIFY rn = ({pn} * COUNT(*) OVER () + {pd} - 1) // {pd}
) tq, (
  SELECT CAST(({pn} * COUNT(*) OVER () + {pd} - 1) // {pd} AS BIGINT)
           AS k, s AS q,
         row_number() OVER (ORDER BY s) AS rn
  FROM u WHERE grp = 0
  QUALIFY rn = ({pn} * COUNT(*) OVER () + {pd} - 1) // {pd}
) cq"""
        )
    return (
        """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(floor(value * 100e0 + 5e-1) AS BIGINT))
              AS BIGINT) AS s,
         CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END AS grp
  FROM events GROUP BY user_id
)
"""
        + " UNION ALL ".join(rows)
    )


def register(queries: dict, oracles: dict, sql_pages: str) -> None:
    queries["bloom_intersect_est"] = q_bloom_intersect_est
    oracles["bloom_intersect_est"] = _sql_bloom_intersect(sql_pages)
    queries["ransac_line"] = q_ransac_line
    oracles["ransac_line"] = _sql_ransac()
    queries["qte_quantiles"] = q_qte_quantiles
    oracles["qte_quantiles"] = _sql_qte()

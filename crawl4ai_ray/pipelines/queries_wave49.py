"""Forty-ninth-wave operators (round-3 continuation session,
2026-08-21) — annotation quality EM, conformal intervals, paired
gate testing.

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
# dawid_skene — annotator confusion-matrix EM over simulated labelers
# ---------------------------------------------------------------------------

_DS_ACC = {1: 85, 2: 70, 3: 55}  # simulated annotator accuracies, %
_DS_ACCNUM = {a: (p * (1 << 52)) // 100 for a, p in _DS_ACC.items()}
_DS_ROUNDS = 3
_DS_SM = 10**9  # Laplace smoothing, in pq units
_DS_PQ = 10**12  # posterior fixed point
_DS_WQ = 10**6  # per-doc likelihood fixed point
_DS_TQ = 10**6  # output confusion fixed point


def _ds_label(a: int, doc_id: int, true_idx: int, classes: list[str]) -> int:
    h = hashlib.md5(f"ds{a}|{doc_id}".encode()).hexdigest()
    h1 = int(h[:13], 16)
    if h1 < _DS_ACCNUM[a]:
        return true_idx
    h2 = int(h[13:26], 16)
    off = 1 + h2 % (len(classes) - 1)
    return (true_idx + off) % len(classes)


def q_dawid_skene(sf_dir: str):
    """Dawid–Skene EM over three simulated annotators labeling each
    document's language (md5-seeded: annotator a is correct with
    probability {85,70,55}%, otherwise emits a deterministic wrong
    class) — the standard crowd/RLHF label-aggregation model that
    jointly recovers per-annotator confusion matrices and per-item
    posterior labels without ground truth. Output: the full A×K×K
    confusion grid after {rounds} EM rounds — the quantized soft count
    and the row-normalized confusion entry (diagonals should order the
    annotators by true accuracy).

    Exactness: posteriors are re-quantized integers every round — the
    E-step likelihood is an EXPLICIT 4-factor product of mirrored
    double divisions (no float fold), scaled by the per-doc max (an
    order-exact MAX), floored to 10⁶ and renormalized in pure integer
    arithmetic — so the unrolled DuckDB CTE chain reproduces every
    round bit-for-bit. Distributed shape: labels + E-step are
    map_batches over documents with the (K + A·K²)-entry model
    broadcast; M-step partial sums fold per batch and close in one
    driver pass per round (the logreg loop pattern).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    classes = sorted(
        r["lang"]
        for r in docs.groupby("lang")
        .aggregate(ray.data.aggregate.Count(alias_name="c"))
        .take_all()  # bounded: one row per lang (bounded key domain)
    )
    L = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}

    def gen_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        tix = [cls_idx[l] for l in batch.column("lang").to_pylist()]
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for a in (1, 2, 3):
            cols[f"l{a}"] = pa.array(
                [_ds_label(a, d, t, classes) for d, t in zip(ids, tix)],
                pa.int64(),
            )
        # init posterior: majority vote over the three labels
        for k in range(L):
            votes = np.zeros(len(ids), np.int64)
            for a in (1, 2, 3):
                votes += (
                    np.asarray(cols[f"l{a}"], np.int64) == k
                ).astype(np.int64)
            cols[f"pq{k}"] = pa.array(votes * _DS_PQ // 3, pa.int64())
        return pa.table(cols)

    state = docs.map_batches(gen_labels, batch_format="pyarrow").materialize()

    def m_partial(batch: pa.Table) -> pa.Table:
        la = {a: batch.column(f"l{a}").to_numpy(zero_copy_only=False) for a in (1, 2, 3)}
        rows = {"a": [], "k": [], "l": [], "s": []}
        for k in range(L):
            pq = batch.column(f"pq{k}").to_numpy(zero_copy_only=False)
            rows["a"].append(0)  # a=0 encodes the class prior row
            rows["k"].append(k)
            rows["l"].append(-1)
            rows["s"].append(int(pq.sum()))
            for a in (1, 2, 3):
                for l in range(L):
                    rows["a"].append(a)
                    rows["k"].append(k)
                    rows["l"].append(l)
                    rows["s"].append(int(pq[la[a] == l].sum()))
        return pa.table(
            {
                "a": pa.array(rows["a"], pa.int64()),
                "k": pa.array(rows["k"], pa.int64()),
                "l": pa.array(rows["l"], pa.int64()),
                "s": pa.array(rows["s"], pa.int64()),
            }
        )

    def m_step(ds):
        parts = ds.map_batches(m_partial, batch_format="pyarrow").take_all()  # bounded: per-batch EM moment partials
        pi = np.zeros(L, dtype=object)
        t = np.zeros((4, L, L), dtype=object)
        for r in parts:
            if r["a"] == 0:
                pi[r["k"]] += int(r["s"])
            else:
                t[r["a"], r["k"], r["l"]] += int(r["s"])
        return pi, t

    for _ in range(_DS_ROUNDS):
        pi, t = m_step(state)
        piden = int(pi.sum())
        pi_f = np.array(
            [float(int(pi[k]) + _DS_SM) / float(piden + L * _DS_SM) for k in range(L)]
        )
        t_f = np.zeros((4, L, L))
        for a in (1, 2, 3):
            for k in range(L):
                den = float(int(pi[k]) + L * _DS_SM)
                for l in range(L):
                    t_f[a, k, l] = float(int(t[a, k, l]) + _DS_SM) / den

        def e_step(batch: pa.Table, pi_f=pi_f, t_f=t_f) -> pa.Table:
            la = {
                a: batch.column(f"l{a}").to_numpy(zero_copy_only=False)
                for a in (1, 2, 3)
            }
            w = np.empty((batch.num_rows, L))
            for k in range(L):
                w[:, k] = (
                    (pi_f[k] * t_f[1, k][la[1]]) * t_f[2, k][la[2]]
                ) * t_f[3, k][la[3]]
            wm = w.max(axis=1, keepdims=True)
            wq = np.floor(w / wm * float(_DS_WQ)).astype(np.int64)
            swq = wq.sum(axis=1)
            cols = {
                "doc_id": batch.column("doc_id"),
                "l1": batch.column("l1"),
                "l2": batch.column("l2"),
                "l3": batch.column("l3"),
            }
            for k in range(L):
                cols[f"pq{k}"] = pa.array(
                    wq[:, k] * _DS_PQ // swq, pa.int64()
                )
            return pa.table(cols)

        state = state.map_batches(e_step, batch_format="pyarrow").materialize()

    pi, t = m_step(state)
    aa, kk, ll, soft, tq = [], [], [], [], []
    for a in (1, 2, 3):
        for k in range(L):
            den = int(pi[k]) + L * _DS_SM
            for l in range(L):
                aa.append(a)
                kk.append(classes[k])
                ll.append(classes[l])
                soft.append(int(t[a, k, l]))
                tq.append((int(t[a, k, l]) + _DS_SM) * _DS_TQ // den)
    return pa.table(
        {
            "a": pa.array(aa, pa.int64()),
            "k": pa.array(kk, pa.string()),
            "l": pa.array(ll, pa.string()),
            "soft_q": pa.array(soft, pa.int64()),
            "t_q": pa.array(tq, pa.int64()),
        }
    )


def _sql_dawid_skene() -> str:
    SM, PQ, WQ, TQ = _DS_SM, _DS_PQ, _DS_WQ, _DS_TQ
    lab_selects = []
    for a in (1, 2, 3):
        lab_selects.append(
            f"""
  SELECT d.doc_id, {a} AS a,
         CASE WHEN CAST(('0x' || substr(md5('ds{a}|' || d.doc_id), 1, 13))
                        AS BIGINT) < {_DS_ACCNUM[a]}
              THEN c1.idx
              ELSE (c1.idx + 1
                    + CAST(('0x' || substr(md5('ds{a}|' || d.doc_id), 14, 13))
                           AS BIGINT) % (ll.l - 1)) % ll.l
         END AS lbl
  FROM documents d
  JOIN cls c1 ON c1.lang = d.lang, ll"""
        )
    parts = [
        f"""
cls AS (
  SELECT lang, CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT lang FROM documents)
),
ll AS (SELECT CAST(COUNT(*) AS BIGINT) AS l FROM cls),
lab AS ({" UNION ALL ".join(lab_selects)}),
labs AS (
  SELECT doc_id,
         MAX(CASE WHEN a = 1 THEN lbl END) AS l1,
         MAX(CASE WHEN a = 2 THEN lbl END) AS l2,
         MAX(CASE WHEN a = 3 THEN lbl END) AS l3
  FROM lab GROUP BY doc_id
),
p0 AS (
  SELECT labs.doc_id, labs.l1, labs.l2, labs.l3, cls.idx AS k,
         (CASE WHEN labs.l1 = cls.idx THEN 1 ELSE 0 END
          + CASE WHEN labs.l2 = cls.idx THEN 1 ELSE 0 END
          + CASE WHEN labs.l3 = cls.idx THEN 1 ELSE 0 END)
           * {PQ} // 3 AS pq
  FROM labs CROSS JOIN cls
)"""
    ]
    prev = "p0"
    for r in range(1, _DS_ROUNDS + 1):
        parts.append(
            f"""
pi{r} AS MATERIALIZED (
  SELECT k, CAST(SUM(pq) AS BIGINT) AS num FROM {prev} GROUP BY k
),
piT{r} AS (SELECT CAST(SUM(num) AS BIGINT) AS den FROM pi{r}),
t{r} AS MATERIALIZED (
  SELECT 1 AS a, k, l1 AS l, CAST(SUM(pq) AS BIGINT) AS num
  FROM {prev} GROUP BY k, l1
  UNION ALL
  SELECT 2, k, l2, CAST(SUM(pq) AS BIGINT) FROM {prev} GROUP BY k, l2
  UNION ALL
  SELECT 3, k, l3, CAST(SUM(pq) AS BIGINT) FROM {prev} GROUP BY k, l3
),
e{r} AS MATERIALIZED (
  SELECT p.doc_id, p.l1, p.l2, p.l3, p.k,
         ((CAST(pi.num + {SM} AS DOUBLE)
             / CAST(piT.den + ll.l * {SM} AS DOUBLE)
           * (CAST(COALESCE(ta.num, 0) + {SM} AS DOUBLE)
              / CAST(pi.num + ll.l * {SM} AS DOUBLE)))
          * (CAST(COALESCE(tb.num, 0) + {SM} AS DOUBLE)
             / CAST(pi.num + ll.l * {SM} AS DOUBLE)))
         * (CAST(COALESCE(tc.num, 0) + {SM} AS DOUBLE)
            / CAST(pi.num + ll.l * {SM} AS DOUBLE)) AS w
  FROM {prev} p
  JOIN pi{r} pi ON pi.k = p.k
  LEFT JOIN t{r} ta ON ta.a = 1 AND ta.k = p.k AND ta.l = p.l1
  LEFT JOIN t{r} tb ON tb.a = 2 AND tb.k = p.k AND tb.l = p.l2
  LEFT JOIN t{r} tc ON tc.a = 3 AND tc.k = p.k AND tc.l = p.l3,
  piT{r} piT, ll
),
wq{r} AS MATERIALIZED (
  SELECT doc_id, l1, l2, l3, k,
         CAST(floor(w / MAX(w) OVER (PARTITION BY doc_id) * {WQ}e0)
              AS BIGINT) AS wq
  FROM e{r}
),
p{r} AS MATERIALIZED (
  SELECT doc_id, l1, l2, l3, k,
         wq * {PQ}
           // CAST(SUM(wq) OVER (PARTITION BY doc_id) AS BIGINT) AS pq
  FROM wq{r}
)"""
        )
        prev = f"p{r}"
    parts.append(
        f"""
pif AS (SELECT k, CAST(SUM(pq) AS BIGINT) AS num FROM {prev} GROUP BY k),
tf AS (
  SELECT 1 AS a, k, l1 AS l, CAST(SUM(pq) AS BIGINT) AS num
  FROM {prev} GROUP BY k, l1
  UNION ALL
  SELECT 2, k, l2, CAST(SUM(pq) AS BIGINT) FROM {prev} GROUP BY k, l2
  UNION ALL
  SELECT 3, k, l3, CAST(SUM(pq) AS BIGINT) FROM {prev} GROUP BY k, l3
),
grid AS (
  SELECT av.a, ck.idx AS kix, ck.lang AS k, cl.idx AS lix, cl.lang AS l
  FROM (VALUES (1), (2), (3)) av(a)
  CROSS JOIN cls ck CROSS JOIN cls cl
)
SELECT g.a, g.k, g.l,
       COALESCE(tf.num, 0) AS soft_q,
       CAST(CAST(COALESCE(tf.num, 0) + {SM} AS HUGEINT) * {TQ}
            // (pif.num + ll.l * {SM}) AS BIGINT) AS t_q
FROM grid g
JOIN pif ON pif.k = g.kix
LEFT JOIN tf ON tf.a = g.a AND tf.k = g.kix AND tf.l = g.lix,
ll"""
    )
    return "WITH " + ",".join(parts)


# ---------------------------------------------------------------------------
# conformal_interval — split-conformal prediction interval + coverage
# ---------------------------------------------------------------------------

_CF_RQ = 10**9  # ratio fixed point
_CF_ALPHA_NUM = 9  # 1 - alpha = 9/10


def q_conformal_interval(sf_dir: str):
    """Split-conformal prediction interval for document length: fit the
    trivial chars-per-token predictor on the train split (doc_id%3==0),
    take the ⌈0.9·(n+1)⌉-th smallest absolute residual on the
    calibration split (%3==1) as the interval half-width, and measure
    empirical coverage on the test split (%3==2) — the
    distribution-free guarantee (coverage ≥ 90%) that underpins
    model-uncertainty gating in data pipelines. Output: one row with
    the fitted ratio, the conformal quantile and the test coverage.

    Exactness: predictor and residuals are pure integers (ratio =
    Σchars·10⁹//Σtokens; residual = |chars·10⁹ − tokens·ratio|); the
    quantile is the exact k-th order statistic; coverage is the one
    mirrored division. Distributed shape: two integer aggregates + ONE
    distributed sort bounded to the top (n−k+1) ≈ 0.1·n residuals
    (descending sort + limit + min — never materializes the sorted
    calibration set).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def feats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ntok = np.fromiter(
            (len((t or "").split()) for t in batch.column("text").to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "split": pa.array(ids % 3, pa.int64()),
                "n_tok": pa.array(ntok, pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    f = docs.map_batches(feats, batch_format="pyarrow").materialize()

    tr = f.filter(expr="split == 0").aggregate(
        ray.data.aggregate.Sum("n_chars", alias_name="sc"),
        ray.data.aggregate.Sum("n_tok", alias_name="st"),
    )
    ratio_q = int(tr["sc"]) * _CF_RQ // int(tr["st"])

    def resid(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_tok").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        r = np.abs(nc * _CF_RQ - nt * ratio_q)
        return pa.table(
            {
                "split": batch.column("split"),
                "r": pa.array(r, pa.int64()),
            }
        )

    rs = f.map_batches(resid, batch_format="pyarrow").materialize()
    cal = rs.filter(expr="split == 1")
    n_cal = cal.count()
    k = (_CF_ALPHA_NUM * (n_cal + 1) + 9) // 10
    if k > n_cal:
        q_resid = None
    else:
        top = cal.sort("r", descending=True).limit(n_cal - k + 1)
        q_resid = int(top.min("r"))
    test = rs.filter(expr="split == 2")
    n_test = test.count()

    def cover(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy(zero_copy_only=False)
        return pa.table(
            {"c": pa.array([int((r <= q_resid).sum())], pa.int64())}
        )

    covered = int(
        test.map_batches(cover, batch_format="pyarrow").sum("c")
    )
    return pa.table(
        {
            "ratio_q": pa.array([ratio_q], pa.int64()),
            "n_cal": pa.array([n_cal], pa.int64()),
            "kth": pa.array([k], pa.int64()),
            "q_resid": pa.array([q_resid], pa.int64()),
            "n_test": pa.array([n_test], pa.int64()),
            "covered": pa.array([covered], pa.int64()),
            "coverage": pa.array(
                [float(covered) / float(n_test)], pa.float64()
            ),
        }
    )


SQL_CONFORMAL_INTERVAL = f"""
WITH f AS (
  SELECT doc_id, doc_id % 3 AS split,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
),
tr AS (
  SELECT CAST(SUM(n_chars) AS BIGINT) * {_CF_RQ}
           // CAST(SUM(n_tok) AS BIGINT) AS ratio_q
  FROM f WHERE split = 0
),
res AS (
  SELECT f.split, abs(f.n_chars * {_CF_RQ} - f.n_tok * tr.ratio_q) AS r
  FROM f, tr WHERE f.split IN (1, 2)
),
calx AS (
  SELECT r, row_number() OVER (ORDER BY r) AS rn,
         COUNT(*) OVER () AS n_cal
  FROM res WHERE split = 1
),
qq AS (
  SELECT r AS q_resid, CAST(n_cal AS BIGINT) AS n_cal,
         CAST(rn AS BIGINT) AS kth
  FROM calx
  WHERE rn = ({_CF_ALPHA_NUM} * (n_cal + 1) + 9) // 10
),
tst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN res.r <= qq.q_resid THEN 1 ELSE 0 END)
              AS BIGINT) AS covered
  FROM res, qq WHERE res.split = 2
)
SELECT tr.ratio_q, qq.n_cal, qq.kth, qq.q_resid, tst.n_test, tst.covered,
       CAST(tst.covered AS DOUBLE) / CAST(tst.n_test AS DOUBLE) AS coverage
FROM tr, qq, tst
"""


# ---------------------------------------------------------------------------
# mcnemar_gates — paired McNemar test between the gopher and C4 gates
# ---------------------------------------------------------------------------


def q_mcnemar_gates(sf_dir: str):
    """McNemar's paired test on the two stage-1 quality gates: each
    document gets a keep/drop verdict from BOTH the Gopher rule bundle
    and the C4 rules, and the test asks whether their disagreement is
    symmetric — statistic (b−c)²/(b+c) over the discordant counts (b =
    gopher-only keeps, c = C4-only keeps). The paired design removes
    per-document difficulty, so this is THE test for "did swapping
    gate A for gate B actually change the corpus?". Output: one row
    with the 2×2 contingency and the statistic.

    Exactness: counts are integers; the statistic is one mirrored
    division. Distributed shape: one map computes both oracle-proven
    rule kernels per batch and folds 4 integer partials; a single
    aggregate closes it. The oracle NESTS the c4_rules / gopher_rules
    oracle texts (the quality_gate_funnel pattern — one SQL definition
    per rule bundle in the repo).
    """
    import functools

    from ..stages import textstats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    gopher = functools.partial(textstats.gopher_rules_batch, min_stops=1)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        raw = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([t or "" for t in texts], pa.string()),
            }
        )
        g = gopher(raw).column("keep").to_numpy(zero_copy_only=False)
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
        c = (
            textstats.c4_rules_batch(structured)
            .column("keep")
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "both_keep": pa.array([int((g & c).sum())], pa.int64()),
                "g_only": pa.array([int((g & ~c).sum())], pa.int64()),
                "c_only": pa.array([int((~g & c).sum())], pa.int64()),
                "neither_keep": pa.array([int((~g & ~c).sum())], pa.int64()),
            }
        )

    row = docs.map_batches(partial, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Sum("both_keep", alias_name="both_keep"),
        ray.data.aggregate.Sum("g_only", alias_name="g_only"),
        ray.data.aggregate.Sum("c_only", alias_name="c_only"),
        ray.data.aggregate.Sum("neither_keep", alias_name="neither_keep"),
    )
    both, b, c, nei = (
        int(row[k]) for k in ("both_keep", "g_only", "c_only", "neither_keep")
    )
    stat = (
        float((b - c) * (b - c)) / float(b + c) if (b + c) > 0 else None
    )
    return pa.table(
        {
            "both_keep": pa.array([both], pa.int64()),
            "g_only": pa.array([b], pa.int64()),
            "c_only": pa.array([c], pa.int64()),
            "neither_keep": pa.array([nei], pa.int64()),
            "chi2": pa.array([stat], pa.float64()),
        }
    )


def _sql_mcnemar_gates(oracles: dict) -> str:
    gopher_sql = oracles["gopher_rules"].strip()
    c4_sql = oracles["c4_rules"].strip()
    return f"""
WITH gf AS ({gopher_sql}),
c4 AS ({c4_sql}),
j AS (
  SELECT gf.keep AS g, c4.keep AS c
  FROM gf JOIN c4 ON c4.doc_id = gf.doc_id
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN g AND c THEN 1 ELSE 0 END) AS BIGINT)
      AS both_keep,
    CAST(SUM(CASE WHEN g AND NOT c THEN 1 ELSE 0 END) AS BIGINT) AS g_only,
    CAST(SUM(CASE WHEN NOT g AND c THEN 1 ELSE 0 END) AS BIGINT) AS c_only,
    CAST(SUM(CASE WHEN NOT g AND NOT c THEN 1 ELSE 0 END) AS BIGINT)
      AS neither_keep
  FROM j
)
SELECT both_keep, g_only, c_only, neither_keep,
       CASE WHEN g_only + c_only = 0 THEN NULL
            ELSE CAST((g_only - c_only) * (g_only - c_only) AS DOUBLE)
                 / CAST(g_only + c_only AS DOUBLE) END AS chi2
FROM agg
"""


def register(queries: dict, oracles: dict, sql_pages: str) -> None:
    queries["dawid_skene"] = q_dawid_skene
    oracles["dawid_skene"] = _sql_dawid_skene()
    queries["conformal_interval"] = q_conformal_interval
    oracles["conformal_interval"] = SQL_CONFORMAL_INTERVAL
    queries["mcnemar_gates"] = q_mcnemar_gates
    oracles["mcnemar_gates"] = _sql_mcnemar_gates(oracles)

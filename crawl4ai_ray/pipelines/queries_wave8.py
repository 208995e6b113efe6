"""Eighth-wave operators (round-3 continuation session, 2026-08-19).

Registered into the main query/oracle registries via ``register()`` —
called from the tail of ``queries.py`` with the shared SQL CTE prefixes,
so there is no circular import and the driver contract
(``__ray_entry__.queries() / oracle_sql()``) is unchanged.

Every query here follows the house rules: Arrow batches end to end,
map-side partials before any groupby, broadcast small sides via
``ray.put``, and an operand-for-operand DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.urls import hosts_array
from ..sources.pages import read_pages
from ..stages import cms as cms_mod


# ---------------------------------------------------------------------------
# host_counts_cms — Count-Min sketch vs exact host frequencies
# ---------------------------------------------------------------------------

def q_host_counts_cms(sf_dir: str):
    """Per-host page counts estimated by a distributed Count-Min sketch
    (stages/cms.py: map-side (d,bucket) partials → one <=256-group merge →
    broadcast dense sketch) next to the exact groupby counts. Output is one
    row per host with the exact count, the sketch estimate and the
    overcount — the CMS guarantee est >= exact is oracle-checked row by
    row because the md5-slice bucket hash is recomputed identically in
    SQL. Width 64 is deliberately small so collisions (overcount > 0)
    actually occur at test scale."""
    pages = read_pages(sf_dir, columns=["url"])

    def add_host(batch: pa.Table) -> pa.Table:
        return pa.table({"host": hosts_array(batch.column("url"))})

    hosts = pages.map_batches(add_host, batch_format="pyarrow")
    sketch = cms_mod.build_cms(hosts, "host")
    sketch_ref = ray.put(sketch)

    exact = hosts.groupby("host").count()

    def estimate(batch: pa.Table) -> pa.Table:
        sk = ray.get(sketch_ref)
        hs = batch.column("host").to_pylist()
        est = cms_mod.cms_estimate(sk, hs)
        n_exact = batch.column("count()").cast(pa.int64())
        return pa.table(
            {
                "host": batch.column("host"),
                "n_exact": n_exact,
                "n_est": pa.array(est, pa.int64()),
                "overcount": pa.array(
                    est - n_exact.to_numpy(zero_copy_only=False), pa.int64()
                ),
            }
        )

    return exact.map_batches(estimate, batch_format="pyarrow")


SQL_HOST_COUNTS_CMS = """
WITH {pages},
h AS (SELECT host FROM purl),
hb AS (
  SELECT host, d,
         CAST(('0x' || substr(md5(host), 1 + 8 * d, 8)) AS BIGINT) % 64 AS bucket
  FROM h CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS d)
),
cms AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY d, bucket
),
ex AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_exact FROM h GROUP BY host),
hd AS (SELECT DISTINCT host, d, bucket FROM hb),
est AS (
  SELECT hd.host, MIN(cms.c) AS n_est
  FROM hd JOIN cms USING (d, bucket) GROUP BY hd.host
)
SELECT ex.host, ex.n_exact, CAST(est.n_est AS BIGINT) AS n_est,
       CAST(est.n_est - ex.n_exact AS BIGINT) AS overcount
FROM ex JOIN est ON est.host = ex.host
"""


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

def register(queries: dict, oracles: dict, sql_pages: str) -> None:
    queries["host_counts_cms"] = q_host_counts_cms
    oracles["host_counts_cms"] = SQL_HOST_COUNTS_CMS.format(
        pages=sql_pages.strip().removeprefix("\n")
    )

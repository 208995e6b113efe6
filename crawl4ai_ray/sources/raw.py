"""Raw / file sources — the reference's ``raw:`` and ``file://`` schemes
(async_crawler_strategy.py:2319-2343) as Ray Data sources, plus the URL
seeder's table path (async_url_seeder.py: seed list + pattern filter).
"""

from __future__ import annotations

import fnmatch
import re
from urllib.parse import urlparse

import pyarrow as pa

import ray


def from_raw_html(items: list[tuple[str, str]]) -> "ray.data.Dataset":
    """[(url, html_str)] → pages Dataset (the ``raw:`` scheme: inline HTML
    handed straight to the extraction pipeline)."""
    tbl = pa.table(
        {
            "url": pa.array([u for u, _ in items], pa.string()),
            "html": pa.array([h.encode("utf-8") for _, h in items], pa.binary()),
        }
    )
    return ray.data.from_arrow(tbl)


def read_html_files(paths_or_dir) -> "ray.data.Dataset":
    """``file://`` sources: local HTML files → pages Dataset with
    file:// urls. Uses read_binary_files (streams; no driver loop)."""
    ds = ray.data.read_binary_files(paths_or_dir, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths], pa.string()),
                "html": batch.column("bytes"),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def seed_urls(
    seed_table: "ray.data.Dataset | list[str]",
    pattern: str | None = None,
    url_col: str = "url",
) -> "ray.data.Dataset":
    """Seed-list source with glob pattern filter — the offline analogue of
    AsyncUrlSeeder's CC-index/sitemap discovery (async_url_seeder.py:
    709-957): seeds come from a table, the ``url~glob`` filter is a
    vectorized regex match."""
    if isinstance(seed_table, list):
        seed_table = ray.data.from_arrow(
            pa.table({url_col: pa.array(seed_table, pa.string())})
        )
    if not pattern:
        return seed_table
    rx = re.compile(fnmatch.translate(pattern))

    def filt(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        mask = pa.array([rx.match(u) is not None for u in urls], pa.bool_())
        return batch.filter(mask)

    return seed_table.map_batches(filt, batch_format="pyarrow")

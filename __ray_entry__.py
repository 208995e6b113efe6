"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship extraction pipeline at sf0.001.
``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2
plus the training-data additions); each callable takes an sf_dir.
``oracle_sql()`` — DuckDB-equivalent SQL where the semantics are
SQL-expressible (the synthetic pages corpus is pure doc_id arithmetic so
even link extraction and BFS have recursive-CTE oracles); the rest are
rows-only checks.

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages corpus →
    scrape/markdown/links/media extraction → docs Dataset."""
    from crawl4ai_ray.pipelines.extract_pipeline import extract_pipeline

    return extract_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from crawl4ai_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawl4ai_ray.pipelines.queries import ORACLES

    return dict(ORACLES)

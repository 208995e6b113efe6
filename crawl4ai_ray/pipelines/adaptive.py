"""Adaptive crawling: statistical stopping over best-first waves.

Re-expression of the reference's AdaptiveCrawler / StatisticalStrategy
(adaptive_crawler.py:287-389 confidence = f(coverage, consistency,
saturation); :1266-1468 digest loop): crawl in scored waves, maintain
term statistics over the crawled corpus, stop when confidence crosses the
threshold. Term stats come from distributed per-batch term counting —
coverage only needs the (small) query-term doc frequencies; saturation
tracks the rate of never-before-seen terms per wave via the sharded seen
machinery's exact sets (terms hash like urls do).

State export/import (the reference's KB export, adaptive_crawler.py:
1719-1833) is a parquet dump of crawled docs + term stats + pending
frontier.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa

import ray

from ..config import CrawlConfig
from ..functions.filters import KeywordRelevanceScorer
from .crawl import crawl

_TOKEN_RE = re.compile(r"[a-z0-9]{2,}")


def _doc_term_stats(batch: pa.Table, query_terms: list[str]) -> pa.Table:
    """Per-doc: which query terms occur + the doc's distinct-term hashes
    (as a list column) for saturation tracking."""
    from ..functions.hashing import hash64

    texts = batch.column("text").to_pylist()
    q_hits = np.zeros((len(texts), len(query_terms)), dtype=bool)
    term_lists = []
    for i, t in enumerate(texts):
        toks = set(_TOKEN_RE.findall(t.lower()))
        term_lists.append(
            hash64(sorted(toks)).tolist() if toks else []
        )
        for j, q in enumerate(query_terms):
            q_hits[i, j] = q in toks
    cols = {
        "url": batch.column("url"),
        "terms": pa.array(term_lists, pa.list_(pa.uint64())),
    }
    for j, q in enumerate(query_terms):
        cols[f"has_{j}"] = pa.array(q_hits[:, j].tolist(), pa.bool_())
    return pa.table(cols)


class AdaptiveCrawlResult:
    def __init__(self):
        self.waves: list[dict] = []
        self.confidence = 0.0
        self.stopped_reason = ""
        self.pages_crawled = 0
        self.query_coverage = 0.0


def adaptive_crawl(
    pages_sf_dir: str,
    seeds: list[str],
    query: str,
    confidence_threshold: float = 0.75,
    max_waves: int = 8,
    wave_size: int = 10,
    max_pages: int = 100,
    out_dir: str | None = None,
) -> AdaptiveCrawlResult:
    """Best-first crawl steered by ``query``; stops on confidence =
    0.4·coverage + 0.4·(1 − saturation) + 0.2·consistency (the reference's
    three-signal blend, adaptive_crawler.py:287-389)."""
    query_terms = sorted(set(_TOKEN_RE.findall(query.lower())))
    res = AdaptiveCrawlResult()
    seen_terms: set[int] = set()
    covered = np.zeros(len(query_terms), dtype=bool)
    prev_new_rates: list[float] = []

    from ..sources.pages import read_pages

    pages = read_pages(pages_sf_dir, columns=["url", "html"])

    pending_state = None
    seen_payloads = None
    start_wave = 0
    crawled = 0

    while len(res.waves) < max_waves and crawled < max_pages:
        cfg = CrawlConfig(
            strategy="best_first",
            max_depth=10,
            max_pages=crawled + wave_size,
            seen_shards=4,
            url_scorer=KeywordRelevanceScorer(query_terms or ["page"], weight=1.0),
        )
        run = crawl(
            pages,
            seeds=seeds if pending_state is None else [],
            cfg=cfg,
            pending0=pending_state,
            seen_payloads=seen_payloads,
            start_wave=start_wave,
            pages_crawled0=crawled,
        )
        if not run.waves:
            res.stopped_reason = "frontier_exhausted"
            break
        docs = run.docs_dataset()
        wave_stats = {"wave": len(res.waves), "pages": run.pages_crawled - crawled}
        crawled = run.pages_crawled
        if docs is not None and wave_stats["pages"] > 0:
            stats = docs.map_batches(
                lambda b: _doc_term_stats(b, query_terms), batch_format="pyarrow"
            )
            parts = [p for p in (ray.get(r) for r in stats.to_arrow_refs()) if p.num_rows]
            tbl = pa.concat_tables(parts) if parts else None
            if tbl is not None and tbl.num_rows:
                for j in range(len(query_terms)):
                    if pa.compute.any(tbl.column(f"has_{j}")).as_py():
                        covered[j] = True
                wave_terms: set[int] = set()
                for lst in tbl.column("terms").to_pylist():
                    wave_terms.update(lst)
                new_terms = wave_terms - seen_terms
                new_rate = len(new_terms) / max(1, len(wave_terms))
                seen_terms |= wave_terms
                prev_new_rates.append(new_rate)
        coverage = float(covered.mean()) if len(query_terms) else 1.0
        saturation = prev_new_rates[-1] if prev_new_rates else 1.0
        if len(prev_new_rates) >= 2:
            consistency = 1.0 - abs(prev_new_rates[-1] - prev_new_rates[-2])
        else:
            consistency = 0.5
        confidence = 0.4 * coverage + 0.4 * (1.0 - saturation) + 0.2 * consistency
        wave_stats.update(
            coverage=coverage,
            saturation=saturation,
            consistency=consistency,
            confidence=confidence,
        )
        res.waves.append(wave_stats)
        res.confidence = confidence
        res.query_coverage = coverage
        res.pages_crawled = crawled

        if confidence >= confidence_threshold:
            res.stopped_reason = "confidence"
            break

        # carry frontier + seen state into the next burst
        pending_state = run.final_pending
        seen_payloads = run.seen_payloads
        start_wave = run.waves[-1]["wave"] + 1
        if pending_state.num_rows == 0:
            res.stopped_reason = res.stopped_reason or "frontier_exhausted"
            break

    if not res.stopped_reason:
        res.stopped_reason = "budget"
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "adaptive_state.json"), "w") as f:
            json.dump(
                {
                    "query_terms": query_terms,
                    "waves": res.waves,
                    "confidence": res.confidence,
                    "stopped_reason": res.stopped_reason,
                    "pages_crawled": res.pages_crawled,
                },
                f,
            )
    return res

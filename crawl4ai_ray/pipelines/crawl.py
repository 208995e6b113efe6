"""The crawl driver: iterative wave loop over Dataset pipelines.

Ray-Data-native rebuild of the reference's deep-crawl strategies
(bfs_strategy.py / dfs_strategy.py / bff_strategy.py): the asyncio
PriorityQueue becomes a per-wave ``sort(keys) + limit(budget)``; the
``visited`` set becomes the sharded Bloom+exact UrlSeenShard pool; the
RateLimiter becomes host-partitioned virtual-time politeness actors; each
wave is one streaming Dataset pipeline

    pages ⋉ frontier → extract → write docs → discover candidates
    → shard finalize (dedup + seen anti-join + mark) → sort + limit
    → robots/politeness admission → next frontier (+ checkpoint)

Strategy = the wave's sort key (SURVEY.md §2.6):
    bfs        (depth asc,  score desc, url asc)
    dfs        (depth desc, score desc, url asc)
    best_first (score desc, depth asc,  url asc)

Determinism: every wave's membership and order is a pure function of the
corpus + config (canonical dedup tie-breaks, sorted shard finalize, seeded
virtual-time politeness) — this is the crawl-order parity surface.

Checkpointing: ``out_dir/wave=NNNN/`` holds docs parquet, the next
frontier parquet, per-shard seen dumps and a manifest with lineage +
filter/dedup/politeness metrics; ``resume_crawl`` restarts from the last
complete wave (SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..config import CrawlConfig
from ..functions.urls import host_of, normalize_url_for_deep_crawl
from ..sources.pages import read_pages
from ..stages.extract import ExtractPages
from ..stages.frontier import DiscoverCandidates, FetchFromCorpus
from ..state.politeness import PolitenessPool
from ..state.seen import SeenSet

_SORT_KEYS = {
    "bfs": (["depth", "neg_score", "url_norm"], [False, False, False]),
    "dfs": (["depth", "neg_score", "url_norm"], [True, False, False]),
    "best_first": (["neg_score", "depth", "url_norm"], [False, False, False]),
}

FRONTIER_SCHEMA = pa.schema(
    [
        ("url_norm", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("score", pa.float64()),
    ]
)


def _empty_frontier() -> pa.Table:
    return FRONTIER_SCHEMA.empty_table()


def _frontier_from_seeds(seeds: list[str]) -> pa.Table:
    norm = [normalize_url_for_deep_crawl(s, s) for s in seeds]
    return pa.table(
        {
            "url_norm": pa.array(norm, pa.string()),
            "host": pa.array([host_of(u) for u in norm], pa.string()),
            "depth": pa.array([0] * len(norm), pa.int32()),
            "parent_url": pa.array([""] * len(norm), pa.string()),
            "score": pa.array([0.0] * len(norm), pa.float64()),
        }
    )


def _sort_pending(pending: pa.Table, strategy: str) -> pa.Table:
    import polars as pl

    if pending.num_rows == 0:
        return pending
    keys, desc = _SORT_KEYS[strategy]
    df = pl.from_arrow(pending).with_columns((-pl.col("score")).alias("neg_score"))
    df = df.sort(keys, descending=desc).drop("neg_score")
    return df.to_arrow().cast(FRONTIER_SCHEMA)


class CrawlRun:
    """Results + lineage of one crawl."""

    def __init__(self, out_dir: str | None):
        self.out_dir = out_dir
        self.waves: list[dict] = []
        self.docs_dirs: list[str] = []
        self.docs_mats: list = []  # materialized per-wave docs when no out_dir
        self.pages_crawled = 0
        self.final_pending = None
        self.seen_payloads: list[bytes] | None = None

    @property
    def crawl_order(self) -> list[tuple[str, int]]:
        """(url, wave) for every crawled page, in deterministic wave order."""
        out = []
        for w in self.waves:
            out.extend((u, w["wave"]) for u in w["frontier_urls"])
        return out

    def docs_dataset(self):
        dirs = [d for d in self.docs_dirs if os.path.exists(d)]
        if dirs:
            return ray.data.read_parquet(dirs)
        if self.docs_mats:
            ds = self.docs_mats[0]
            for other in self.docs_mats[1:]:
                ds = ds.union(other)
            return ds
        return None


def crawl(
    pages: "ray.data.Dataset | str",
    seeds: list[str],
    cfg: CrawlConfig | None = None,
    out_dir: str | None = None,
    robots_rules: dict[str, str] | None = None,
    pending0: pa.Table | None = None,
    seen_payloads: list[bytes] | None = None,
    start_wave: int = 0,
    pages_crawled0: int = 0,
) -> CrawlRun:
    """Run a deterministic deep crawl over an offline pages corpus.

    ``pages``: a Dataset of (url, html, …) or an sf_dir path.
    """
    cfg = cfg or CrawlConfig()
    if isinstance(pages, str):
        pages = read_pages(pages, columns=["url", "html"])
    if cfg.materialize_corpus and not cfg.corpus_bucket_dir:
        # one read; every wave then maps over plasma-resident blocks
        pages = pages.materialize()

    seen = SeenSet(num_shards=cfg.seen_shards)
    politeness = PolitenessPool(
        num_shards=max(2, cfg.seen_shards // 4),
        base_delay=cfg.base_delay_s,
        max_delay=cfg.max_delay_s,
        robots_rules=robots_rules,
    )
    run = CrawlRun(out_dir)
    run.pages_crawled = pages_crawled0

    try:
        if seen_payloads is not None:
            seen.load_all(seen_payloads)
            pending = pending0 if pending0 is not None else _empty_frontier()
        else:
            pending = _frontier_from_seeds(seeds)
            # the engine marks seeds visited up front (deterministic variant
            # of the reference's empty-start visited set, SURVEY.md §7.4)
            seen.add(pending.column("url_norm").to_pylist())

        wave = start_wave
        while pending.num_rows > 0:
            if cfg.max_pages is not None and run.pages_crawled >= cfg.max_pages:
                break
            pending = _sort_pending(pending, cfg.strategy)

            # ---- wave selection: sort + limit = the priority queue pop
            budget = pending.num_rows
            if cfg.max_pages is not None:
                budget = min(budget, cfg.max_pages - run.pages_crawled)
            if cfg.strategy == "best_first":
                # reference pops batches of 10 (bff_strategy.py:19,129-213)
                budget = min(budget, 10)
            frontier = pending.slice(0, budget)
            deferred = pending.slice(budget)

            # ---- robots + politeness admission (deterministic order)
            hosts = frontier.column("host").to_pylist()
            urls = frontier.column("url_norm").to_pylist()
            if cfg.check_robots and robots_rules:
                allowed = politeness.robots_allowed(hosts, urls)
                frontier = frontier.filter(pa.array(allowed))
                hosts = frontier.column("host").to_pylist()
                urls = frontier.column("url_norm").to_pylist()
            admitted_mask = politeness.admit(hosts, cfg.max_pages_per_host_per_wave)
            admitted = frontier.filter(pa.array(admitted_mask))
            rejected = frontier.filter(pa.array(~admitted_mask))
            # politeness defers, never drops: rejected go back to pending
            if rejected.num_rows:
                deferred = pa.concat_tables([rejected, deferred])

            if admitted.num_rows == 0:
                if rejected.num_rows:
                    break  # pathological cap: nothing admissible this wave
                pending = deferred
                continue

            frontier_urls = admitted.column("url_norm").to_pylist()
            t0 = time.time()

            # ---- fetch ⋉ + extract (one streaming pipeline), write docs
            fdict = {
                u: (int(d), p, float(s))
                for u, d, p, s in zip(
                    frontier_urls,
                    admitted.column("depth").to_pylist(),
                    admitted.column("parent_url").to_pylist(),
                    admitted.column("score").to_pylist(),
                )
            }
            # ONE fused streaming pipeline per wave: fetch ⋉ → extract →
            # candidate discovery (side-effect into the seen shards) → sink.
            if cfg.corpus_bucket_dir:
                from ..sources.bucketed import fetch_bucketed

                fetched = fetch_bucketed(cfg.corpus_bucket_dir, fdict)
            else:
                fref = ray.put(fdict)
                fetched = pages.map_batches(
                    FetchFromCorpus,
                    fn_constructor_args=(fref,),
                    batch_format="pyarrow",
                    concurrency=(1, 8),
                    batch_size=1024,
                )
            docs = (
                fetched.map_batches(
                    ExtractPages(cfg.scrape),
                    batch_format="pyarrow",
                    batch_size=cfg.scrape_batch_size,
                )
                .map_batches(
                    DiscoverCandidates(
                        seen,
                        filter_chain=cfg_filter_chain(cfg),
                        scorer=cfg_scorer(cfg),
                        score_threshold=cfg.score_threshold,
                        include_external=cfg.include_external,
                        max_depth=cfg.max_depth,
                        passthrough=True,
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.scrape_batch_size,
                )
            )
            wave_dir = None
            if out_dir:
                wave_dir = os.path.join(out_dir, f"wave={wave:04d}")
                docs_dir = os.path.join(wave_dir, "docs")
                os.makedirs(docs_dir, exist_ok=True)
                docs.write_parquet(docs_dir)
                run.docs_dirs.append(docs_dir)
                crawled_urls = {
                    r["url"]
                    for r in ray.data.read_parquet(docs_dir, columns=["url"]).take_all()
                }
            else:
                docs = docs.materialize()
                run.docs_mats.append(docs)
                # read urls straight from the materialized blocks (zero-copy
                # plasma reads; no extra Dataset execution per wave)
                crawled_urls = set()
                for ref in docs.to_arrow_refs():
                    tbl = ray.get(ref)
                    if "url" in tbl.column_names:  # skip schema-less empties
                        crawled_urls.update(tbl.column("url").to_pylist())
            n_crawled = len(crawled_urls)
            run.pages_crawled += n_crawled

            # politeness feedback (RateLimiter dynamics, async_dispatcher.py:
            # 63-83): success → ×0.75 recovery; fetch miss → 404 (no backoff;
            # only 429/503 would double the delay)
            statuses = [200 if u in crawled_urls else 404 for u in frontier_urls]
            politeness.report_status(
                [host_of(u) for u in frontier_urls], statuses
            )

            stats = {}
            new_parts = seen.finalize_wave()
            new_tables = [
                pa.table(
                    {
                        "url_norm": pa.array(p["url_norm"], pa.string()),
                        "host": pa.array(p["host"], pa.string()),
                        "depth": pa.array(p["depth"], pa.int32()),
                        "parent_url": pa.array(p["parent_url"], pa.string()),
                        "score": pa.array(p["score"], pa.float64()),
                    }
                )
                for p in new_parts
            ]
            new_frontier = (
                pa.concat_tables(new_tables) if new_tables else _empty_frontier()
            )
            pending = (
                pa.concat_tables([deferred, new_frontier])
                if deferred.num_rows or new_frontier.num_rows
                else _empty_frontier()
            )

            try:
                # dispatcher-parity memory/queue telemetry (the reference's
                # MemoryAdaptiveDispatcher monitors psutil, async_dispatcher
                # .py:147-187; here Ray's own accounting stands in)
                avail = ray.available_resources()
                total = ray.cluster_resources()
                mem_stats = {
                    "cpu_available": avail.get("CPU", 0.0),
                    "cpu_total": total.get("CPU", 0.0),
                    "object_store_total_gb": round(
                        total.get("object_store_memory", 0.0) / 1e9, 2
                    ),
                    "object_store_available_gb": round(
                        avail.get("object_store_memory", 0.0) / 1e9, 2
                    ),
                }
            except Exception:
                mem_stats = {}
            manifest = {
                "wave": wave,
                "strategy": cfg.strategy,
                "resources": mem_stats,
                "frontier_size": len(frontier_urls),
                "pages_crawled": n_crawled,
                "cumulative_pages": run.pages_crawled,
                "candidates_offered": int(stats.get("sum(n_candidates)", 0) or 0),
                "candidates_skipped": int(stats.get("sum(n_skipped)", 0) or 0),
                "new_urls": new_frontier.num_rows,
                "deferred": deferred.num_rows,
                "politeness_rejected": int(rejected.num_rows),
                "seen": seen.stats(),
                "politeness": politeness.stats(),
                "wall_s": round(time.time() - t0, 3),
                "frontier_urls": frontier_urls,
            }
            if out_dir and wave_dir:
                pq.write_table(
                    _sort_pending(pending, cfg.strategy),
                    os.path.join(wave_dir, "pending.parquet"),
                )
                for i, payload in enumerate(seen.dump_all()):
                    with open(os.path.join(wave_dir, f"seen_shard_{i:03d}.bloom"), "wb") as f:
                        f.write(payload)
                with open(os.path.join(wave_dir, "manifest.json"), "w") as f:
                    json.dump(manifest, f)
            # in-memory extras (not JSON-serializable, used by queries/tests)
            manifest["frontier_table"] = admitted
            run.waves.append(manifest)

            wave += 1
            if wave > 10_000:  # safety
                break
        # expose final state so callers (adaptive crawler, drivers) can
        # continue the crawl without re-reading disk checkpoints
        run.final_pending = _sort_pending(pending, cfg.strategy)
        run.seen_payloads = seen.dump_all()
        return run
    finally:
        seen.shutdown()
        politeness.shutdown()


def cfg_filter_chain(cfg: CrawlConfig):
    return getattr(cfg, "filter_chain", None)


def cfg_scorer(cfg: CrawlConfig):
    return getattr(cfg, "url_scorer", None)


def resume_crawl(
    pages: "ray.data.Dataset | str",
    cfg: CrawlConfig,
    out_dir: str,
    robots_rules: dict[str, str] | None = None,
) -> CrawlRun:
    """Resume from the last complete wave checkpoint in ``out_dir``."""
    waves = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("wave=")
        and os.path.exists(os.path.join(out_dir, d, "manifest.json"))
    )
    if not waves:
        raise FileNotFoundError(f"no complete wave checkpoints under {out_dir}")
    last = waves[-1]
    wave_dir = os.path.join(out_dir, last)
    with open(os.path.join(wave_dir, "manifest.json")) as f:
        manifest = json.load(f)
    pending = pq.read_table(os.path.join(wave_dir, "pending.parquet"))
    payloads = []
    i = 0
    while os.path.exists(os.path.join(wave_dir, f"seen_shard_{i:03d}.bloom")):
        with open(os.path.join(wave_dir, f"seen_shard_{i:03d}.bloom"), "rb") as f:
            payloads.append(f.read())
        i += 1
    run = crawl(
        pages,
        seeds=[],
        cfg=cfg,
        out_dir=out_dir,
        robots_rules=robots_rules,
        pending0=pending,
        seen_payloads=payloads,
        start_wave=manifest["wave"] + 1,
        pages_crawled0=manifest["cumulative_pages"],
    )
    # include the already-completed waves' docs in the run view
    for d in waves:
        docs_dir = os.path.join(out_dir, d, "docs")
        if os.path.isdir(docs_dir) and docs_dir not in run.docs_dirs:
            run.docs_dirs.insert(0, docs_dir)
    return run

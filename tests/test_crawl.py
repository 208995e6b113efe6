"""Crawl-loop conformance: BFS parity vs an in-memory reference walk,
determinism across runs, checkpoint/resume, politeness budget."""

import os

import pytest

from crawl4ai_ray.config import CrawlConfig
from crawl4ai_ray.functions.urls import normalize_url_for_deep_crawl
from crawl4ai_ray.pipelines.crawl import crawl, resume_crawl
from crawl4ai_ray.sources.pages import (
    children_of,
    host_id_of,
    n_pages,
    url_of,
)

SF = "/root/testdata/sf0.001"
SEEDS = [url_of(0), url_of(1), url_of(2)]


def reference_bfs(seed_ids, n, max_depth):
    """Pure-python level-synchronised BFS over the synthetic link graph —
    the conformance golden (children edges + per-page home link)."""
    depth = {}
    frontier = {url_of(i): 0 for i in seed_ids}
    for u, d in frontier.items():
        depth[u] = d
    while frontier:
        nxt = {}
        for u, d in frontier.items():
            if d + 1 > max_depth:
                continue
            # home links only exist on real pages (page/<id> urls)
            if "/page/" not in u:
                continue
            if "?" in u:
                continue  # pagination targets have no page rows
            pid = int(u.rsplit("/", 1)[1])
            home = f"https://site{host_id_of(pid)}.example.com"
            targets = [url_of(c) for c in children_of(pid, n)] + [home]
            if pid % 37 == 0:
                targets.append(f"{u}?page=2")
            for t in targets:
                if t not in depth:
                    depth[t] = d + 1
                    nxt[t] = d + 1
        frontier = nxt
    return depth


@pytest.fixture(scope="module")
def bfs_run(ray_session):
    cfg = CrawlConfig(max_depth=3, seen_shards=4)
    return crawl(SF, seeds=SEEDS, cfg=cfg)


def test_bfs_depths_match_reference(bfs_run):
    n = n_pages(SF)
    golden = reference_bfs([0, 1, 2], n, max_depth=3)
    ours = {}
    for w in bfs_run.waves:
        ft = w["frontier_table"]
        for u, d in zip(ft.column("url_norm").to_pylist(), ft.column("depth").to_pylist()):
            ours[u] = int(d)
    assert ours == golden


def test_bfs_wave_order_deterministic(ray_session, bfs_run):
    cfg = CrawlConfig(max_depth=3, seen_shards=2)  # different shard count
    run2 = crawl(SF, seeds=SEEDS, cfg=cfg)
    assert [w["frontier_urls"] for w in bfs_run.waves] == [
        w["frontier_urls"] for w in run2.waves
    ]


def test_bfs_seen_set_is_exact(bfs_run):
    # final visited set == union of all wave frontiers (each url exactly once)
    all_urls = [u for w in bfs_run.waves for u in w["frontier_urls"]]
    assert len(all_urls) == len(set(all_urls))
    assert bfs_run.waves[-1]["seen"]["exact_size"] == len(all_urls)


def test_max_pages_budget(ray_session):
    cfg = CrawlConfig(max_depth=3, max_pages=10, seen_shards=2)
    run = crawl(SF, seeds=SEEDS, cfg=cfg)
    # max_pages budgets successful crawls (reference counts successes only,
    # bfs_strategy.py:173-175); fetch-misses in the frontier don't consume it
    assert run.pages_crawled <= 10
    assert all(w["frontier_size"] <= 10 for w in run.waves)


def test_politeness_cap_defers_not_drops(ray_session):
    cfg = CrawlConfig(max_depth=1, seen_shards=2, max_pages_per_host_per_wave=1)
    run = crawl(SF, seeds=[url_of(0), url_of(7), url_of(14)], cfg=cfg)
    # seeds 0,7,14 all live on site0 (heavy-hitter host): cap 1/host/wave
    # → three waves of one page each at depth 0, none dropped
    depth0_waves = [
        w for w in run.waves if 0 in set(w["frontier_table"].column("depth").to_pylist())
    ]
    assert len(depth0_waves) == 3
    crawled = [u for w in run.waves for u in w["frontier_urls"]]
    for s in [url_of(0), url_of(7), url_of(14)]:
        assert normalize_url_for_deep_crawl(s, s) in crawled


def test_dfs_and_best_first_run(ray_session):
    for strategy in ("dfs", "best_first"):
        cfg = CrawlConfig(strategy=strategy, max_depth=2, max_pages=15, seen_shards=2)
        run = crawl(SF, seeds=[url_of(0)], cfg=cfg)
        assert run.pages_crawled > 0
        urls = [u for w in run.waves for u in w["frontier_urls"]]
        assert len(urls) == len(set(urls))


def reference_best_first(seed_id, n, scorer, max_depth, max_pages, batch=10):
    """Sequential priority-queue simulator (independent golden for the
    distributed best-first wave loop): pop top-`batch` by
    (score desc, depth asc, url asc), crawl, discover, repeat."""
    seed = url_of(seed_id)
    pending = {seed: (0, scorer.score(seed))}  # url -> (depth, score)
    seen = {seed}
    crawled = 0
    waves = []
    while pending and crawled < max_pages:
        order = sorted(pending.items(), key=lambda kv: (-kv[1][1], kv[1][0], kv[0]))
        wave = order[: min(batch, max_pages - crawled)]
        waves.append([u for u, _ in wave])
        for u, (d, _) in wave:
            del pending[u]
            if "/page/" not in u or "?" in u:
                continue  # fetch miss: no doc, no links, not counted
            crawled += 1
            if d + 1 > max_depth:
                continue
            pid = int(u.rsplit("/", 1)[1])
            home = f"https://site{host_id_of(pid)}.example.com"
            targets = [home] + [url_of(c) for c in children_of(pid, n)]
            if pid % 37 == 0:
                targets.append(f"{u}?page=2")
            for t in targets:
                if t not in seen:
                    seen.add(t)
                    pending[t] = (d + 1, scorer.score(t))
    return waves


def test_best_first_order_matches_reference_sim(ray_session):
    from crawl4ai_ray.functions.filters import KeywordRelevanceScorer

    n = n_pages(SF)
    cfg = CrawlConfig(
        strategy="best_first",
        max_depth=2,
        max_pages=40,
        seen_shards=4,
        url_scorer=KeywordRelevanceScorer(["page/1", "page/2"], weight=1.0),
    )
    run = crawl(SF, seeds=[url_of(0)], cfg=cfg)
    golden = reference_best_first(
        0, n, KeywordRelevanceScorer(["page/1", "page/2"], weight=1.0),
        max_depth=2, max_pages=40,
    )
    ours = [sorted(w["frontier_urls"]) for w in run.waves]
    golden_sorted = [sorted(w) for w in golden]
    assert ours == golden_sorted


def reference_dfs(seed_ids, n, max_depth, max_pages):
    """Sequential simulator for the engine's DFS variant: pending sorted
    (depth desc, score desc, url asc), whole frontier each wave."""
    pending = {url_of(i): 0 for i in seed_ids}
    seen = set(pending)
    crawled = 0
    waves = []
    while pending and crawled < max_pages:
        order = sorted(pending.items(), key=lambda kv: (-kv[1], kv[0]))
        wave = order[: max_pages - crawled] if max_pages else order
        waves.append(sorted(u for u, _ in wave))
        for u, d in wave:
            del pending[u]
            if "/page/" not in u or "?" in u:
                continue
            crawled += 1
            if d + 1 > max_depth:
                continue
            pid = int(u.rsplit("/", 1)[1])
            home = f"https://site{host_id_of(pid)}.example.com"
            targets = [home] + [url_of(c) for c in children_of(pid, n)]
            if pid % 37 == 0:
                targets.append(f"{u}?page=2")
            for t in targets:
                if t not in seen:
                    seen.add(t)
                    pending[t] = d + 1
    return waves


def test_dfs_order_matches_reference_sim(ray_session):
    n = n_pages(SF)
    cfg = CrawlConfig(strategy="dfs", max_depth=2, max_pages=30, seen_shards=2)
    run = crawl(SF, seeds=[url_of(0)], cfg=cfg)
    golden = reference_dfs([0], n, max_depth=2, max_pages=30)
    ours = [sorted(w["frontier_urls"]) for w in run.waves]
    assert ours == golden


def test_checkpoint_resume(ray_session, tmp_path):
    out1 = str(tmp_path / "full")
    cfg = CrawlConfig(max_depth=2, seen_shards=2)
    full = crawl(SF, seeds=SEEDS, cfg=cfg, out_dir=out1)

    # interrupted run: stop after wave 0 by capping pages to wave0 size,
    # then resume with the real budget
    out2 = str(tmp_path / "resumed")
    w0 = full.waves[0]["frontier_size"]
    cfg_cut = CrawlConfig(max_depth=2, seen_shards=2, max_pages=w0)
    crawl(SF, seeds=SEEDS, cfg=cfg_cut, out_dir=out2)
    resumed = resume_crawl(SF, CrawlConfig(max_depth=2, seen_shards=2), out2)

    full_urls = [u for w in full.waves for u in w["frontier_urls"]]
    resumed_urls = [u for w in resumed.waves for u in w["frontier_urls"]]
    assert full.waves[0]["frontier_urls"] + resumed_urls == full_urls
    assert os.path.exists(os.path.join(out1, "wave=0000", "manifest.json"))
    assert os.path.exists(os.path.join(out1, "wave=0000", "docs"))


def test_checkpoint_resume_dataset_mode_and_strategies(ray_session, tmp_path):
    """Resume parity holds when the frontier runs in Dataset mode (directory
    pending.parquet checkpoints) and for dfs / best_first orderings."""
    for strategy in ("dfs", "best_first"):
        cfg_kw = dict(max_depth=2, seen_shards=2, strategy=strategy,
                      frontier_small_threshold=10)
        full = crawl(SF, seeds=SEEDS, cfg=CrawlConfig(**cfg_kw),
                     out_dir=str(tmp_path / f"full_{strategy}"))
        assert any(w["frontier_dataset_mode"] for w in full.waves), strategy

        out2 = str(tmp_path / f"cut_{strategy}")
        w0 = full.waves[0]["frontier_size"]
        crawl(SF, seeds=SEEDS, cfg=CrawlConfig(max_pages=w0, **cfg_kw),
              out_dir=out2)
        resumed = resume_crawl(SF, CrawlConfig(**cfg_kw), out2)
        full_urls = [u for w in full.waves for u in w["frontier_urls"]]
        resumed_urls = [u for w in resumed.waves for u in w["frontier_urls"]]
        assert full.waves[0]["frontier_urls"] + resumed_urls == full_urls, strategy


def test_cuckoo_seen_filter_crawl_parity(ray_session, bfs_run):
    """Swapping the URL-seen approx filter (bloom → cuckoo) must not change
    crawl semantics at all: identical wave count, crawl order, and final
    seen size — the exact 128-bit store arbitrates under both filters."""
    cfg = CrawlConfig(max_depth=3, seen_shards=4, seen_filter="cuckoo")
    run = crawl(SF, seeds=SEEDS, cfg=cfg)
    assert len(run.waves) == len(bfs_run.waves)
    assert run.crawl_order == bfs_run.crawl_order
    assert (
        run.waves[-1]["seen"]["exact_size"]
        == bfs_run.waves[-1]["seen"]["exact_size"]
    )

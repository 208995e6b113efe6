"""API facade + bucketed corpus layout."""

import pyarrow as pa

import ray

from crawl4ai_ray.api import RayWebCrawler
from crawl4ai_ray.sources.bucketed import fetch_bucketed, partition_corpus
from crawl4ai_ray.sources.pages import read_pages, url_of

SF = "/root/testdata/sf0.001"


def test_run_single(ray_session):
    crawler = RayWebCrawler(SF)
    doc = crawler.run(url_of(3))
    assert doc["success"] and doc["url"] == url_of(3)
    assert "# Page 3" in doc["markdown"]
    assert crawler.run("https://nowhere.example.com/x") is None


def test_run_many_subset(ray_session):
    crawler = RayWebCrawler(SF)
    ds = crawler.run_many([url_of(0), url_of(1)])
    df = ds.to_pandas()
    assert sorted(df["url"]) == sorted([url_of(0), url_of(1)])


def test_deep_crawl_via_api(ray_session):
    crawler = RayWebCrawler(SF)
    run = crawler.deep_crawl(url_of(0), strategy="bfs", max_depth=1)
    assert run.pages_crawled >= 1
    assert len(run.waves) >= 1


def test_digest_via_api(ray_session):
    crawler = RayWebCrawler.from_sf_dir(SF)
    res = crawler.digest(url_of(0), "table scan", max_waves=2, wave_size=5, max_pages=10)
    assert res.pages_crawled > 0


def test_bucketed_corpus_fetch(ray_session, tmp_path):
    pages = read_pages(SF, columns=["url", "html"])
    corpus_dir = str(tmp_path / "bucketed")
    partition_corpus(pages, corpus_dir, num_buckets=8)
    frontier = {url_of(i): (0, "", 0.0) for i in (0, 5, 17)}
    out = fetch_bucketed(corpus_dir, frontier).to_pandas()
    assert sorted(out["url"]) == sorted(frontier)
    assert set(out.columns) >= {"url", "html", "depth", "parent_url", "score"}

"""Named queries + DuckDB oracle SQL — the correctness surface.

Each entry runs a Ray Data pipeline over the testdata tables (and the
deterministically synthesized pages corpus, sources/pages.py) and, where the
semantics are ANSI-SQL-expressible, carries a DuckDB oracle that reconstructs
the same result from the raw tables — including the pages corpus itself,
whose construction is pure doc_id arithmetic precisely so the oracle can
rebuild it in SQL (link graph via UNION of edge rules, BFS via recursive
CTE). Column names match between Ray and SQL by construction.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray

from ..config import CrawlConfig
from ..functions.filters import (
    CompositeScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
    URLPatternFilter,
)
from ..functions.urls import normalize_url, normalize_url_for_deep_crawl
from ..functions import hashing
from ..sources.pages import url_of
from ..stages import ann, dedup, sampling, textstats
from ..stages.extract import ExtractPages
from ..state.politeness import PolitenessPool
from .crawl import crawl
from .extract_pipeline import extract_pipeline

# ---------------------------------------------------------------------------
# shared SQL fragments — MUST mirror sources/pages.py arithmetic
# ---------------------------------------------------------------------------

SQL_PAGES = """
pages AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 0 ELSE doc_id % 50 END AS host_id
  FROM documents
),
purl AS (
  SELECT doc_id,
         host_id,
         'site' || host_id || '.example.com' AS host,
         'https://site' || host_id || '.example.com' AS site,
         'https://site' || host_id || '.example.com/page/' || doc_id AS url
  FROM pages
)
"""

SQL_EDGES = """
nn AS (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS src_id, (2 * doc_id + 1) % nn.c AS dst_id FROM documents, nn
  UNION ALL
  SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL
  SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
edges AS (
  SELECT DISTINCT u1.url AS src, u2.url AS dst
  FROM child JOIN purl u1 ON u1.doc_id = child.src_id
             JOIN purl u2 ON u2.doc_id = child.dst_id
  UNION
  SELECT DISTINCT url AS src, site AS dst FROM purl
  UNION
  SELECT url AS src, url || '?page=2' AS dst FROM purl WHERE doc_id % 37 = 0
)
"""


def _explode_links(
    batch: pa.Table,
    include_external: bool = False,
    require_http: bool = False,
    with_text: bool = False,
):
    """Shared link-explode for the edge/anchor queries: iterate each doc's
    scraped link lists, normalize hrefs with the seen-key normalizer, and
    yield (src, dst[, text]) rows. One definition so the normalization /
    first-wins contract can never drift between the oracles that all
    depend on it."""
    srcs, dsts, txts = [], [], []
    cols = [batch.column("url").to_pylist(), batch.column("links_internal").to_pylist()]
    ext = (
        batch.column("links_external").to_pylist()
        if include_external
        else [[] for _ in range(batch.num_rows)]
    )
    for src, li, le in zip(cols[0], cols[1], ext):
        for link in list(li) + list(le):
            key = normalize_url_for_deep_crawl(link["href"], src)
            if not key:
                continue
            if require_http and not key.startswith(("http://", "https://")):
                continue
            srcs.append(src)
            dsts.append(key)
            if with_text:
                txts.append(link["text"])
    return (srcs, dsts, txts) if with_text else (srcs, dsts)


def _pages_ds(sf_dir: str, columns=None):
    from ..sources.pages import read_pages

    return read_pages(sf_dir, columns=columns)


def _docs(sf_dir: str):
    return extract_pipeline(sf_dir)


# ---------------------------------------------------------------------------
# crawl-side queries
# ---------------------------------------------------------------------------

def q_pages_per_host(sf_dir: str):
    """Pages per host via map-side partial aggregation (stages/agg.py):
    only (host, partial) rows shuffle, so the heavy-hitter host (site0,
    ~16% of the corpus) never concentrates raw rows on one reducer."""
    from ..functions.urls import hosts_array
    from ..stages.agg import partial_count

    pages = _pages_ds(sf_dir, columns=["url"])

    def add_host(batch: pa.Table) -> pa.Table:
        return pa.table({"host": hosts_array(batch.column("url"))})

    hosts = pages.map_batches(add_host, batch_format="pyarrow")
    return partial_count(hosts, "host", out_col="n_pages")


def q_top_hosts(sf_dir: str):
    return (
        q_pages_per_host(sf_dir)
        .sort(["n_pages", "host"], descending=[True, False])
        .limit(5)
    )


def q_link_graph_edges(sf_dir: str):
    docs = _docs(sf_dir).select_columns(["url", "links_internal"])

    def explode(batch: pa.Table) -> pa.Table:
        srcs, dsts = _explode_links(batch)
        return pa.table(
            {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
        )

    edges = docs.map_batches(explode, batch_format="pyarrow")
    return edges.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def q_link_graph_edges_excluded(sf_dir: str):
    """Edges over internal ∪ EXTERNAL links under domain exclusion
    (ScrapeConfig.exclude_domains + exclude_social_media_links,
    async_configs.py:1090-1094): every synthetic page carries exactly one
    external link to www.external-site.org, which the exclusion removes, so
    the result must equal the internal-only edge oracle — proving the knobs
    drop exactly the excluded domain's links and nothing else (if the knob
    silently broke, the external edges would appear and the hash would
    mismatch)."""
    from ..config import ScrapeConfig

    cfg = ScrapeConfig(
        exclude_social_media_links=True,
        exclude_domains=("external-site.org",),
    )
    docs = extract_pipeline(sf_dir, cfg=cfg).select_columns(
        ["url", "links_internal", "links_external"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        srcs, dsts = _explode_links(batch, include_external=True, require_http=True)
        return pa.table(
            {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
        )

    edges = docs.map_batches(explode, batch_format="pyarrow")
    return edges.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def q_bfs_depth(sf_dir: str):
    cfg = CrawlConfig(max_depth=3, seen_shards=4)
    run = crawl(sf_dir, seeds=[url_of(0), url_of(1), url_of(2)], cfg=cfg)
    urls, depths = [], []
    for w in run.waves:
        ft = w["frontier_table"]
        urls.extend(ft.column("url_norm").to_pylist())
        depths.extend(int(d) for d in ft.column("depth").to_pylist())
    return pa.table(
        {"url": pa.array(urls, pa.string()), "depth": pa.array(depths, pa.int64())}
    )


def q_robots_filter(sf_dir: str):
    """Distributed robots evaluation: rules broadcast per actor, pages
    streamed through map_batches (never materialized on the driver)."""
    from ..state.politeness import RobotsFilterBatch

    rules = {
        "site0.example.com": "User-agent: *\nDisallow: /page/\n",
        "site1.example.com": "User-agent: *\nDisallow: /page/1\n",
    }
    pages = _pages_ds(sf_dir, columns=["url"])
    return pages.map_batches(
        RobotsFilterBatch,
        fn_constructor_args=(rules,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_head_filters(sf_dir: str):
    """ContentRelevanceFilter (BM25 over head fields) + SEOFilter over the
    corpus heads (reference deep_crawling/filters.py:501-690). The head
    'fetch' is the corpus head-prefix slice; evaluation is a streaming
    map_batches with the filters compiled once per actor. Thresholds sit in
    the verified gaps of the deterministic score distributions, so the
    decisions are exactly (doc_id%3==0) and (host_id==0) — which is what
    the oracle reconstructs."""
    from ..functions.filters import ContentRelevanceFilter, SEOFilter, head_fields

    pages = _pages_ds(sf_dir, columns=["url", "html"])

    class HeadFilters:
        def __init__(self):
            self.rel = ContentRelevanceFilter("summary synthetic", threshold=1.8)
            self.seo = SEOFilter(threshold=0.5, keywords=["site0"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            heads = []
            for h in batch.column("html").to_pylist():
                if isinstance(h, bytes):
                    cut = h.find(b"</head>")
                    h = (h[: cut + 7] if cut != -1 else h[:65536]).decode(
                        "utf-8", errors="replace"
                    )
                heads.append(h)
            fields = [head_fields(h) for h in heads]
            rel = self.rel.apply_head_batch(fields)
            seo = self.seo.apply_head_batch(urls, heads)
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "relevant": pa.array(rel.tolist(), pa.bool_()),
                    "seo_ok": pa.array(seo.tolist(), pa.bool_()),
                }
            )

    return pages.map_batches(
        HeadFilters, batch_format="pyarrow", concurrency=(1, 4), batch_size=128
    )


def q_url_seeder(sf_dir: str):
    """AsyncUrlSeeder analogue (async_url_seeder.py): corpus-wide url
    discovery with glob pattern + head peek + BM25 relevance filtering.
    Threshold 1.8 sits in the verified gap of the deterministic score
    distribution (2.509 for doc_id%3==0 pages vs 1.110 otherwise), so the
    selected set — and the extracted titles — are SQL-reconstructable."""
    from ..sources.seeder import seed_urls

    return seed_urls(
        sf_dir,
        pattern="*.example.com/page/*",
        extract_head=True,
        query="summary synthetic",
        score_threshold=1.8,
    ).select_columns(["url", "title", "description"])


def q_url_normalize(sf_dir: str):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_and_norm(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = []
        for i in ids:
            h = i % 50
            m = i % 3
            if m == 0:
                raw = (
                    f"HTTPS://SITE{h}.EXAMPLE.COM/Page/{i}/"
                    f"?b=2&a=1&utm_source=x&fbclid=y#frag"
                )
                base = "https://example.com"
            elif m == 1:
                raw = f"../other/page-{i}.html"
                base = f"https://site{h}.example.com/dir/sub/index.html"
            else:
                raw = f"/a/b//c/{i}?ref=x#top"
                base = f"https://site{h}.example.com"
            out.append(normalize_url(raw, base))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url_norm": pa.array(out, pa.string()),
            }
        )

    return docs.map_batches(make_and_norm, batch_format="pyarrow")


def q_url_filter_pattern(sf_dir: str):
    pages = _pages_ds(sf_dir, columns=["url"])
    filt = URLPatternFilter(["*.example.com/page/1*"])

    def apply(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        mask = filt.apply_batch(urls)
        keep = [u for u, m in zip(urls, mask) if m]
        return pa.table({"url": pa.array(keep, pa.string())})

    return pages.map_batches(apply, batch_format="pyarrow")


def q_url_scores(sf_dir: str):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    scorer = CompositeScorer(
        [PathDepthScorer(optimal_depth=3, weight=1.0), FreshnessScorer(weight=0.5)]
    )

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = []
        for i in ids:
            h = i % 50
            year = 2015 + i % 10
            extra = "/extra" if i % 4 == 0 else ""
            urls.append(f"https://site{h}.example.com/blog/{year}{extra}/item{i}")
        s = scorer.score_batch(urls)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "score": pa.array(s, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def q_url_nonsense(sf_dir: str):
    """Seeder nonsense-URL gate (async_url_seeder.py:1284-1380): derive a
    deterministic URL variant per doc (one per active rule family) and flag
    it with is_nonsense_url. The oracle re-implements every active rule
    generically in SQL — it does NOT branch on the variant index, so a rule
    regression on either side breaks the hash."""
    from ..functions.urls import is_nonsense_url

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls, flags = [], []
        for i in ids:
            base = f"https://site{i % 50}.example.com/page/{i}"
            k = i % 8
            if k == 0:
                u = base
            elif k == 1:
                u = base + "/robots.txt"
            elif k == 2:
                u = base + "/sitemap-news.xml"
            elif k == 3:
                u = base + "?print=1"
            elif k == 4:
                u = base + "/.well-known/security.txt"
            elif k == 5:
                u = base + "/wp-admin/options.html"
            elif k == 6:
                u = f"https://site{i % 50}.example.com/a"
            else:
                u = base + "/humans.txt"
            urls.append(u)
            flags.append(is_nonsense_url(u))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "nonsense": pa.array(flags, pa.bool_()),
            }
        )

    return docs.map_batches(derive, batch_format="pyarrow")


def q_url_traps(sf_dir: str):
    """Spider-trap gate (functions/urls.py trap_flags): derive one URL
    variant per doc (one per rule family + two negative controls) and emit
    every per-rule flag. Like url_nonsense, the oracle re-implements every
    rule generically in SQL over the URL STRING (segment-list form, since
    RE2 lacks backreferences) — it does not branch on the variant index."""
    from ..functions.urls import trap_flags

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = []
        for i in ids:
            base = f"https://site{i % 50}.example.com/page/{i}"
            k = i % 8
            if k == 0:
                u = base
            elif k == 1:
                u = base + "/x/x/x"
            elif k == 2:
                u = base + "/a1/a2/a3/a4/a5/a6/a7"
            elif k == 3:
                u = base + "?phpsessid=deadbeef"
            elif k == 4:
                u = base + "?a=1&b=2&c=3&d=4&e=5"
            elif k == 5:
                u = base + "/" + "x" * 200
            elif k == 6:
                u = base + "/2050/01/05/report"
            else:
                u = base + "/y/z/y/z"
            urls.append(u)
        flags = [trap_flags(u) for u in urls]
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
        }
        for rule in (
            "repeated_segment",
            "too_deep",
            "session_id",
            "many_params",
            "too_long",
            "bad_year",
            "is_trap",
        ):
            cols[rule] = pa.array([f[rule] for f in flags], pa.bool_())
        return pa.table(cols)

    return docs.map_batches(derive, batch_format="pyarrow")


def q_sitemap_urls(sf_dir: str):
    """Sitemap discovery (AsyncUrlSeeder._iter_sitemap parity,
    async_url_seeder.py:830-960): synthesize each host's sitemap corpus
    (root index → two parity-split sub-sitemap urlsets with lastmod /
    priority fields), walk it from the root indexes with the distributed
    two-level parser, glob-filter like SeedingConfig.pattern. The oracle
    re-derives every field (including the hash-derived lastmod/priority)
    straight from the pages universe — the XML build+parse round-trip on
    the Ray side must be lossless for the value hash to match."""
    from ..sources.pages import read_pages
    from ..sources.sitemap import build_sitemap_table, parse_sitemaps

    pages = read_pages(sf_dir, columns=["url"])
    sm = build_sitemap_table(pages)
    return parse_sitemaps(sm, pattern="https://site1*.example.com/*")


def q_shuffle_export(sf_dir: str):
    """Deterministic shuffle-for-training placement (stages/shuffle.py):
    every doc's (shard, in-shard position) under the seed-keyed 64-bit
    mixed order. Rank computed with the two-level distributed scan; the
    oracle recomputes key/shard in HUGEINT arithmetic and ranks with
    ROW_NUMBER over the identical order."""
    from ..stages.shuffle import shuffle_assignments

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return shuffle_assignments(docs, n_shards=16, seed=7)


def q_crawl_delta(sf_dir: str):
    """Incremental recrawl diff (stages/delta.py): two simulated snapshots
    of the corpus — prev drops doc_id%7==3, curr drops doc_id%10==6 and
    rewrites every 5th doc — classified new/gone/changed/unchanged with one
    bucketed full-outer shuffle. Oracle = FULL OUTER JOIN + CASE."""
    import hashlib

    from ..stages.delta import snapshot_delta

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def snap(keep_fn, mutate: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            texts = batch.column("text").to_pylist()
            keep = keep_fn(ids)
            out_ids, out_h = [], []
            for i, t in zip(ids[keep], [t for t, k in zip(texts, keep) if k]):
                body = t + "v2" if (mutate and i % 5 == 0) else t
                out_ids.append(int(i))
                out_h.append(hashlib.md5(body.encode()).hexdigest())
            return pa.table(
                {
                    "doc_id": pa.array(out_ids, pa.int64()),
                    "content_hash": pa.array(out_h, pa.string()),
                }
            )

        return fn

    prev = docs.map_batches(snap(lambda i: i % 7 != 3, False), batch_format="pyarrow")
    curr = docs.map_batches(snap(lambda i: i % 10 != 6, True), batch_format="pyarrow")
    return snapshot_delta(prev, curr)


def q_extract_docs(sf_dir: str):
    docs = _docs(sf_dir)
    return docs.select_columns(["url", "success", "n_links", "n_images"])


# ---------------------------------------------------------------------------
# training-data queries (documents / embeddings)
# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs.count()

    def shift(batch: pa.Table) -> pa.Table:
        ids = pa.compute.add(batch.column("doc_id"), n)
        return batch.set_column(0, "doc_id", ids)

    dup = docs.union(docs.map_batches(shift, batch_format="pyarrow"))
    keep = dedup.exact_dedup_keepers(dup)
    return keep.rename_columns({"keep_id": "keep_doc_id"})


def q_token_stats(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(textstats.token_stats_batch, batch_format="pyarrow")


def q_quality_counts(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(textstats.quality_counts_batch, batch_format="pyarrow")


def q_quality_filter(sf_dir: str):
    """Composite quality score + keep threshold (the CCNet/Gopher-style
    web-corpus quality filter): length score, punct/digit penalty,
    stopword density, averaged and thresholded at 0.5. Both engines
    evaluate the IDENTICAL rational expression tree (divisions, clips,
    left-assoc sums — no transcendentals), so the doubles are
    bit-identical and no rounding is needed."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scored = docs.map_batches(
        textstats.quality_score_batch, batch_format="pyarrow"
    )

    def add_keep(batch: pa.Table) -> pa.Table:
        q = batch.column("quality")
        return batch.append_column(
            "keep", pa.compute.greater_equal(q, pa.scalar(0.5))
        )

    return scored.map_batches(add_keep, batch_format="pyarrow")


def q_quality_deciles(sf_dir: str):
    """Curriculum binning: every doc gets its NTILE(10) decile in the
    corpus-wide (quality score, doc_id) order — the assembly step that
    feeds easy-to-hard training curricula (stages/sampling.py
    quality_decile_assign, shared with the webtext pipeline's
    curriculum stage): counting-sort global rank (broadcast score
    histogram + intra-score enumeration in one hash(score) bucket
    shuffle), deciles by SQL NTILE's first-rem-tiles-get-one-extra
    rule. Oracle = DuckDB's own NTILE(10)."""
    from ..stages.sampling import quality_decile_assign

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return quality_decile_assign(docs)


def q_lang_dist(sf_dir: str):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    out = docs.groupby("lang").count().rename_columns({"count()": "n_docs"})
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_docs"), "n_docs", b.column("n_docs").cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


def q_content_hash(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        lambda b: textstats.content_hash_batch(b, "text"), batch_format="pyarrow"
    )


def q_repetition_stats(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        textstats.repetition_stats_batch, batch_format="pyarrow"
    )


def q_line_dedup(sf_dir: str):
    """RefinedWeb-style corpus-frequency boilerplate removal
    (stages/linededup.py): segments recurring in >2 distinct docs are
    dropped from every doc and the residual text reassembled. The
    synthetic documents have no newline structure, so the deterministic
    stand-in segment model is non-overlapping 3-token windows (partial
    tail window included) — the SQL oracle applies the identical model.
    Only (128-bit key, doc_id) pairs shuffle; the boilerplate set is
    broadcast once via ray.put and probed per actor."""
    from ..stages.linededup import line_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return line_dedup(docs, width=3, max_docs=2)


def q_lm_bucket(sf_dir: str):
    """CCNet-style unigram-LM perplexity bucketing (stages/lmscore.py):
    corpus-fit capped-vocab model (top-16 tokens + one OOV class so the
    broadcast stays bounded at any corpus size), per-doc nll accumulated
    in fixed-point int64 (order-independent — no float-summation hash
    instability), head/middle/tail by fixed integer thresholds."""
    from ..stages.lmscore import unigram_lm_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return unigram_lm_score(
        docs, vocab_k=16, head_t=342_800_000, tail_t=343_500_000
    )


def q_webtext_pipeline(sf_dir: str):
    """Flagship end-to-end training-data pipeline — the composition a
    100 TB webtext run would actually execute, as ONE streaming Dataset
    chain (no stage materializes the corpus; the only driver-held state
    is the boilerplate key set and the capped LM dict, both broadcast):

      1. quality filter (CCNet/Gopher-style composite score ≥ 0.5)
      2. corpus-frequency boilerplate removal (stages/linededup.py),
         boilerplate-only docs dropped
      3. exact dedup on the CLEANED text — bucketed by hash64 % 64 so the
         shuffle has 64 scheduling units (string-exact keep-min-doc_id
         within bucket; not one group per distinct text)
      4. unigram-LM perplexity bucketing (stages/lmscore.py), tail
         dropped

    Output: survivors as (doc_id, dl, nll_fixed, mean_nll_fixed, bucket).
    The SQL oracle recomputes the identical four-stage composition."""
    from .webtext import webtext_pipeline

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return webtext_pipeline(docs)


def q_decontaminate(sf_dir: str):
    from ..stages.decontaminate import decontaminate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # Deterministic stand-in benchmark: every 97th doc (the real use reads
    # an eval-set table; only its small size matters for the plan shape).
    bench = docs.map_batches(
        lambda b: b.filter(
            pa.array(b.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0)
        ),
        batch_format="pyarrow",
    )
    return decontaminate(docs, bench, n=3)


def q_decontaminate_bloom(sf_dir: str):
    """Same contamination semantics as q_decontaminate, through the
    bloom-semijoin + bucketed-exact-verify scale path (benchmark side too
    big to broadcast exactly → broadcast its BITS, verify the bounded
    candidate trickle in place). Shares the decontaminate oracle — the
    verify pass makes the bloom variant exact."""
    from ..stages.decontaminate import decontaminate_bloom

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = docs.map_batches(
        lambda b: b.filter(
            pa.array(b.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0)
        ),
        batch_format="pyarrow",
    )
    return decontaminate_bloom(docs, bench, n=3)


def q_decontaminate_fuzzy(sf_dir: str):
    """NEAR-duplicate decontamination: a corpus doc is contaminated when
    its 3-gram Jaccard against any benchmark doc is ≥ 0.8 — the fuzzy
    complement of the verbatim-n-gram `decontaminate`. Deterministic
    stand-in benchmark: every 97th doc with its FIRST TOKEN DROPPED, so
    matches are near-duplicates (J < 1), never byte-equal — exercising
    the fuzzy path specifically. Cross-side prefix-filtered AllPairs +
    exact verify; corpus never shuffles whole."""
    from ..stages.decontaminate import decontaminate_fuzzy

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def mk_bench(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % 97 == 0
        texts = [
            " ".join(t.split()[1:])
            for t, k in zip(b.column("text").to_pylist(), keep)
            if k
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    bench = docs.map_batches(mk_bench, batch_format="pyarrow")
    return decontaminate_fuzzy(docs, bench, tau=0.8, shingle=3)


def q_warc_roundtrip(sf_dir: str):
    """Pages → `.warc.gz` shards → pages: the Common-Crawl interchange
    format as sink AND source (sources/warc.py). `digest_ok` recomputes
    each payload's md5 on read against the digest stamped at write, so
    byte-level losslessness is checked IN-BAND — the oracle asserting
    digest_ok=TRUE for every url is a corruption check, not a tautology."""
    import tempfile

    from ..sources.pages import read_pages
    from ..sources.warc import read_warc, write_warc

    pages = read_pages(sf_dir, columns=["url", "warc_ts", "html"])
    # fresh dir per run: shard names depend on block boundaries, so a
    # REUSED dir would accumulate stale shards from a differently-batched
    # earlier run and read back duplicates (caught by the sweep gate)
    out = tempfile.mkdtemp(prefix="c4r_warc_", dir="/tmp")
    write_warc(pages, out).materialize()  # drive the sink to completion
    return read_warc(out).select_columns(["url", "warc_ts", "digest_ok"])


def q_jsonl_roundtrip(sf_dir: str):
    """Documents → `.jsonl.gz` shards → documents: newline-delimited JSON
    as sink AND source (sources/jsonl.py) — the Pile/Dolma/RedPajama
    interchange format next to the WARC sibling. Each record's `_digest`
    (md5 of its canonical payload JSON, stamped at write) is recomputed
    on read, so JSON-encoding losslessness (unicode escapes, key order)
    is checked IN-BAND; the oracle's md5(text) match then proves the
    text column itself survived the round trip byte-for-byte."""
    import tempfile

    from ..sources.jsonl import read_jsonl, write_jsonl

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    # fresh dir per run: shard names depend on block boundaries (same
    # contract as warc_roundtrip — a reused dir would accumulate stale
    # shards from a differently-batched earlier run)
    out = tempfile.mkdtemp(prefix="c4r_jsonl_", dir="/tmp")
    write_jsonl(docs, out, key_col="doc_id").materialize()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
    )
    back = read_jsonl(out, schema)

    def digest_text(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        md5s = [
            _hl.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "text_md5": pa.array(md5s, pa.string()),
                "digest_ok": batch.column("digest_ok"),
            }
        )

    return back.map_batches(digest_text, batch_format="pyarrow")


def q_url_canonical_groups(sf_dir: str):
    """Mirror/variant URL consolidation — the crawl-side dedup that
    collapses scheme-case, trailing-slash, tracking-param and fragment
    variants of one page into a canonical group. Variants are exploded
    map-side, normalized with the oracled `normalize_url`, then ONE
    groupby(url_norm) with Count + Min aggregates (map-side combined);
    no row ever carries more than the url strings."""
    from ..functions.urls import normalize_url

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def variants(batch: pa.Table) -> pa.Table:
        raws = []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            raws.append(f"HTTPS://SITE{h}.EXAMPLE.COM/page/{i}/")
            if i % 2 == 0:
                raws.append(
                    f"https://site{h}.example.com/page/{i}?utm_campaign=c&gclid=g"
                )
            if i % 3 != 1:
                raws.append(f"https://site{h}.example.com/page/{i}#sec")
        norms = [normalize_url(r, "https://example.com") for r in raws]
        return pa.table(
            {
                "url_norm": pa.array(norms, pa.string()),
                "raw": pa.array(raws, pa.string()),
            }
        )

    return (
        docs.map_batches(variants, batch_format="pyarrow")
        .groupby("url_norm")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_variants"),
            ray.data.aggregate.Min("raw", alias_name="canonical_raw"),
        )
    )


def q_image_dhash_dups(sf_dir: str):
    """Image near-dup pairs by perceptual dHash: media payloads →
    actor-pool dHash (stages/multimodal.DHashImage — the difference
    hash is the REAL algorithm; only the JPEG→8×9-thumbnail decode in
    front is the container's stub seam) → the complete-within-radius
    hamming block bucketing shared with simhash (stages/dedup.
    hamming_pairs). Payloads are deterministic 8×9 grids derived from
    doc_id; every doc_id ≡ 1 (mod 50) carries its predecessor's grid
    with ONE pixel bumped — a planted near-dup at hamming ≤ 1. The
    oracle rebuilds grids, bits, and two-half packed hashes in SQL and
    takes all pairs with hamming ≤ 2."""
    from ..stages.dedup import hamming_pairs
    from ..stages.multimodal import DHashImage, raw_gray_payload

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.arange(8, dtype=np.int64)[None, :, None]
        c = np.arange(9, dtype=np.int64)[None, None, :]
        base = np.where(ids % 50 == 1, ids - 1, ids)[:, None, None]
        # squared congruential mixing: a LINEAR congruence (any
        # coefficients) leaves all ids on a one-parameter offset family
        # whose dHash patterns are mutually close (measured: 36k, then
        # still 3.3k of 125k pairs within hamming 2); squaring mod the
        # prime is non-linear in the offset, so grids decorrelate and
        # only the planted pairs stay near
        x = (base * 2654435761 + r * 40503 + c * 69427) % 1000003
        grids = (((x * x) % 1000003) % 251).astype(np.uint8)
        planted = ids % 50 == 1
        grids[planted, 0, 0] = (grids[planted, 0, 0].astype(np.int64) + 1) % 251
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [raw_gray_payload(g) for g in grids], pa.binary()
                ),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow")
    sigs = media.map_batches(
        DHashImage, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )
    return hamming_pairs(sigs, max_hamming=2, id_col="id", sig_col="dhash")


def q_audio_fp_dups(sf_dir: str):
    """Audio near-dup pairs by 64-bit band-energy fingerprint
    (stages/multimodal.AudioFingerprint — simplified Haitsma–Kalker;
    the sign/packing math is real, the decode in front is the declared
    stub seam) through the same hamming block bucketing as simhash and
    image dHash. PCM payloads are squared-congruential int16 streams;
    doc_id ≡ 2 (mod 50) carries its predecessor's samples with one
    sample nudged — a planted near-dup whose energy signs move ≤ 2
    bits. The oracle rebuilds samples → band energies → sign bits →
    lo/hi packed halves in SQL, pairs at hamming ≤ 4."""
    from ..stages.dedup import hamming_pairs
    from ..stages.multimodal import AudioFingerprint

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = np.arange(1024, dtype=np.int64)[None, :]
        base = np.where(ids % 50 == 2, ids - 1, ids)[:, None]
        x = (base * 2654435761 + t * 97003) % 1000003
        mag = ((x * x) % 1000003) % 4096  # int64 domain until the cast
        planted = ids % 50 == 2
        # one-sample nudge with wrap INSIDE the 0..4095 magnitude domain
        # (a bare +1 could push 2047 -> 2048 past int16 after the offset)
        mag[planted, 7] = (mag[planted, 7] + 1) % 4096
        samples = (mag - 2048).astype(np.int16)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [s.tobytes() for s in samples], pa.binary()
                ),
            }
        )

    media = docs.map_batches(synth, batch_format="pyarrow")
    sigs = media.map_batches(
        AudioFingerprint, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )
    return hamming_pairs(sigs, max_hamming=4, id_col="id", sig_col="afp")


def q_phrase_search(sf_dir: str):
    """Exact phrase search over the term-partitioned POSITIONAL index
    (stages/index.py build_positional_index + phrase_lookup): the
    lookup reads only the phrase terms' partitions (asserted via bytes
    telemetry), then intersects per-doc position lists — token k must
    sit at first_pos + k. The oracle scans with the equivalent
    adjacent-token predicate over the same whitespace tokenization."""
    import tempfile

    from ..stages.index import build_positional_index, phrase_lookup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = tempfile.mkdtemp(prefix="c4r_posidx_", dir="/tmp")
    build_positional_index(docs, out)
    res, tel = phrase_lookup(out, "order line")
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"], tel
    return res


def q_leakage_safe_split(sf_dir: str):
    """Contamination-safe train/eval split: duplicate CLUSTERS land on
    one side whole — a naive per-doc hash split leaks near-identical
    text across the boundary and inflates eval. Chain: planted-copy
    corpus (documents ∪ byte-identical copies at +N, the exact_dedup
    testbed) → duplicate edges per content-hash group → REAL
    connected_components propagation → side = component % 10 < 8
    (min-member id is the component label, so every duplicate follows
    its canonical doc's side). Oracle: MIN OVER (PARTITION BY md5(text))
    + the same modular rule."""
    from ..functions import hashing
    from ..stages.graph import connected_components

    corpus, _ = _docs_with_exact_copies(sf_dir)

    def key(batch: pa.Table) -> pa.Table:
        h = hashing.hash64(batch.column("text").to_pylist())
        return pa.table(
            {
                "k": pa.array(h, pa.uint64()),
                "doc_id": batch.column("doc_id"),
            }
        )

    def group_edges(group: pa.Table) -> pa.Table:
        ids = np.sort(
            np.asarray(group.column("doc_id").to_pylist(), np.int64)
        )
        if len(ids) < 2:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "src": pa.array(np.full(len(ids) - 1, ids[0]), pa.int64()),
                "dst": pa.array(ids[1:], pa.int64()),
            }
        )

    edges = (
        corpus.map_batches(key, batch_format="pyarrow")
        .groupby("k")
        .map_groups(group_edges, batch_format="pyarrow")
    )
    nodes = corpus.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    comps = connected_components(nodes, edges)

    def assign(batch: pa.Table) -> pa.Table:
        comp = batch.column("component").to_numpy(zero_copy_only=False)
        side = np.where(comp % 10 < 8, "train", "eval")
        return pa.table(
            {
                "doc_id": batch.column("node"),
                "component": batch.column("component"),
                "split": pa.array(side.tolist(), pa.string()),
            }
        )

    return comps.map_batches(assign, batch_format="pyarrow")


def q_mirror_hosts(sf_dir: str):
    """Mirror-site detection — the crawl-side application of content
    dedup: host pairs sharing ≥ 3 identical content items are mirror
    candidates (the Common-Crawl problem of the same site served under
    many domains). Content identity is a deterministic derivation
    (content_id = doc_id % 77, host = doc_id % 50 — docs with one
    content_id on different hosts ARE the planted mirrors). Plan: ONE
    groupby(content_id) emits host pairs per content (hot-content cap
    at 64 hosts, min-host anchor — same discipline as the dedup
    buckets), then ONE pair groupby counts; only (content, host) pairs
    ever shuffle."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "content_id": pa.array(ids % 77, pa.int64()),
                "host": pa.array(ids % 50, pa.int64()),
            }
        )

    pairs_src = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby(["content_id", "host"])
        .count()  # distinct (content, host)
    )

    def host_pairs(group: pa.Table) -> pa.Table:
        hosts = np.unique(
            np.asarray(group.column("host").to_pylist(), np.int64)
        )
        if len(hosts) < 2:
            return pa.table(
                {"host_a": pa.array([], pa.int64()), "host_b": pa.array([], pa.int64())}
            )
        if len(hosts) > 64:
            # hot-content cap: anchor to the min host (documented recall
            # loss for pairs both far from the anchor, as in simhash)
            a = np.full(len(hosts) - 1, hosts[0])
            b = hosts[1:]
        else:
            ii, jj = np.triu_indices(len(hosts), k=1)
            a, b = hosts[ii], hosts[jj]
        return pa.table(
            {"host_a": pa.array(a, pa.int64()), "host_b": pa.array(b, pa.int64())}
        )

    counted = (
        pairs_src.groupby("content_id")
        .map_groups(host_pairs, batch_format="pyarrow")
        .groupby(["host_a", "host_b"])
        .count()
    )

    def threshold(batch: pa.Table) -> pa.Table:
        n = batch.column("count()").cast(pa.int64())
        keep = pa.compute.greater_equal(n, pa.scalar(3))
        t = batch.filter(keep)
        return pa.table(
            {
                "host_a": t.column("host_a"),
                "host_b": t.column("host_b"),
                "n_shared": t.column("count()").cast(pa.int64()),
            }
        )

    return counted.map_batches(threshold, batch_format="pyarrow")


def q_regex_search_trigram(sf_dir: str):
    """Regex search with trigram-index pruning (the pg_trgm trick,
    stages/index.py build_trigram_index + regex_search_trigram):
    candidates = docs whose postings hold ALL trigrams of the pattern's
    literal runs (a superset of matches), the real regex runs only on
    candidates point-read by id. Exact by construction; the oracle is
    the full-scan regex itself."""
    import tempfile

    from ..stages.index import build_trigram_index, regex_search_trigram

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = tempfile.mkdtemp(prefix="c4r_tridx_", dir="/tmp")
    build_trigram_index(docs, out)
    res, tel = regex_search_trigram(
        out,
        f"{sf_dir}/documents.parquet",
        pattern=r"batch [a-z]+ window",
        literals=["batch ", " window"],
    )
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"], tel
    return res


def q_corpus_rollup(sf_dir: str):
    """Corpus-composition report (GROUP BY ROLLUP re-expressed): docs and
    chars by language × source, per-language subtotals, grand total —
    one distributed groupby over the finest cells, coarser levels folded
    from the bounded cell table."""
    from ..stages.agg import rollup_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    return rollup_stats(docs, ["lang", "source"], "n_chars")


def q_anchor_text_agg(sf_dir: str):
    """Per-destination anchor-text aggregation (the classic web-corpus
    enrichment: a page's in-link anchor texts describe it better than its
    own body — used for search indexing and training-data augmentation).
    Plan: explode (dst, text) from the scraped link lists, then ONE
    groupby on hash(dst) % P with per-bucket vectorized dedup + sorted
    string-agg — P scheduling units, not |dst| (the sessionize/asof
    bucket pattern), since Ray Data has no native string-agg."""
    import pandas as pd

    from ..functions.hashing import hash64

    P = 32
    docs = _docs(sf_dir).select_columns(["url", "links_internal"])

    def explode(batch: pa.Table) -> pa.Table:
        _, dsts, txts = _explode_links(batch, with_text=True)
        bucket = (hash64(dsts) % P).astype(np.int64) if dsts else np.array([], np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "dst": pa.array(dsts, pa.string()),
                "txt": pa.array(txts, pa.string()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        dd = g.drop_duplicates(["dst", "txt"]).sort_values(["dst", "txt"])
        grp = dd.groupby("dst", sort=True)["txt"]
        anchors = grp.agg("|".join)
        counts = grp.size()
        return pa.table(
            {
                "dst": pa.array(anchors.index.to_numpy(), pa.string()),
                "anchors": pa.array(anchors.to_numpy(), pa.string()),
                "n_anchors": pa.array(
                    counts.to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    pairs = docs.map_batches(explode, batch_format="pyarrow")
    return pairs.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def q_connected_components(sf_dir: str):
    """Connected components over the host-membership graph (each page
    linked to its host's hub page): label propagation with convergence
    detection (stages/graph.py connected_components) — the fixpoint must
    equal min-doc_id-per-host, which the oracle computes independently
    from the corpus arithmetic."""
    from ..stages.graph import connected_components

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def host_of(ids: np.ndarray) -> np.ndarray:
        return np.where(ids % 7 == 0, 0, ids % 50)

    # hubs: min doc_id per host — a 50-row aggregate, broadcast to the
    # edge builder (small-side broadcast, not a shuffle join)
    hubs_ds = docs.map_batches(
        lambda b: pa.table(
            {
                "host_id": pa.array(
                    host_of(b.column("doc_id").to_numpy(zero_copy_only=False))
                ),
                "doc_id": b.column("doc_id"),
            }
        ),
        batch_format="pyarrow",
    ).groupby("host_id").min("doc_id")
    # hosts are dense ints 0..49 — a fancy-indexable array beats a dict
    hub_arr = np.zeros(50, dtype=np.int64)
    for r in hubs_ds.take_all():  # bounded: one row per host (≤ 50 hosts)
        hub_arr[int(r["host_id"])] = int(r["min(doc_id)"])
    hub_ref = ray.put(hub_arr)

    def mk_edges(batch: pa.Table) -> pa.Table:
        hubs = ray.get(hub_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = hubs[host_of(ids)]
        keep = ids != dst  # drop self-loops
        return pa.table(
            {
                "src": pa.array(ids[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return connected_components(nodes, edges)


def q_seed_distances(sf_dir: str):
    """Multi-source BFS seed attribution over the synthetic link graph:
    every reachable doc gets (hop distance from the nearest seed, id of
    that seed, lowest-seed tiebreak) — the graph-analytics twin of the
    crawl's bfs_depth, computed by packed-int min-label propagation with
    convergence detection (stages/graph.py multi_source_bfs). The oracle
    unrolls the identical (dist·2^32 + seed) min-propagation for 16
    sweeps — ≥ the graph's seed eccentricity at every test sf, so both
    engines sit at the same fixpoint."""
    from ..stages.graph import multi_source_bfs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    return multi_source_bfs(nodes, _synthetic_link_edges(sf_dir), seeds=[0, 1, 2])


def _seed_distances_sql(n_iters: int = 16) -> str:
    """Unrolled min-label-propagation oracle for q_seed_distances: the
    packed lbl = dist*2^32 + seed arithmetic, iterated n_iters times.
    MATERIALIZED per NOTES gotcha — without it DuckDB inlines each level
    into both consumers of the next (exponential blowup)."""
    sent = 1 << 62
    hop = 1 << 32
    parts = [
        f"""e AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST((2 * doc_id + 1) % nn.c AS BIGINT) AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL
  SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
l0 AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS node,
         CAST(CASE WHEN doc_id IN (0, 1, 2) THEN doc_id
                   ELSE {sent} END AS BIGINT) AS lbl
  FROM documents
)"""
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT node, lbl FROM l{i - 1}
    UNION ALL
    SELECT e.dst AS node, l{i - 1}.lbl + {hop} AS lbl
    FROM l{i - 1} JOIN e ON e.src = l{i - 1}.node
    WHERE l{i - 1}.lbl < {sent}
  ) GROUP BY node
)"""
        )
    return (
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),\n"
        + ",\n".join(parts)
        + f"""
SELECT node,
       CAST(lbl // {hop} AS BIGINT) AS dist,
       CAST(lbl % {hop} AS BIGINT) AS seed
FROM l{n_iters} WHERE lbl < {sent}
"""
    )


def q_label_communities(sf_dir: str):
    """Seeded label-propagation communities over the synthetic link
    graph (stages/graph.py label_propagation): docs 0-4 seed five
    communities, every non-seed node adopts the in-neighbor MAJORITY
    label each sweep (ties → smallest label), 4 synchronous sweeps.
    Majority voting is the semantic that neither connected_components
    (reachability) nor seed_distances (nearest seed) gives. Oracle
    unrolls the identical vote-count → argmax → clamp → coalesce chain
    per sweep."""
    from ..stages.graph import label_propagation

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    return label_propagation(
        nodes,
        _synthetic_link_edges(sf_dir),
        seeds={i: i for i in range(5)},
        n_sweeps=4,
    )


def _label_prop_ctes(n_sweeps: int = 4) -> str:
    """The unrolled seeded-LPA CTE chain (nn, e, lab0 … lab{n}) WITHOUT
    the WITH keyword or final SELECT — shared by the label_communities
    oracle and the community_modularity oracle (wave 9), which computes
    modularity on top of the same lab{n} labels."""
    parts = [
        """e AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST((2 * doc_id + 1) % nn.c AS BIGINT) AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL
  SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
lab0 AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS node,
         CASE WHEN doc_id < 5 THEN CAST(doc_id AS BIGINT) ELSE NULL END AS lbl
  FROM documents
)"""
    ]
    for i in range(1, n_sweeps + 1):
        parts.append(
            f"""cand{i} AS MATERIALIZED (
  SELECT e.dst AS node, l.lbl, COUNT(*) AS c
  FROM e JOIN lab{i - 1} l ON l.node = e.src
  WHERE l.lbl IS NOT NULL
  GROUP BY 1, 2
),
mode{i} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM cand{i}) WHERE rn = 1
),
lab{i} AS MATERIALIZED (
  SELECT p.node,
         CASE WHEN p.node < 5 THEN p.lbl
              ELSE COALESCE(m.lbl, p.lbl) END AS lbl
  FROM lab{i - 1} p LEFT JOIN mode{i} m ON m.node = p.node
)"""
        )
    return "nn AS (SELECT COUNT(*) AS c FROM documents),\n" + ",\n".join(
        parts
    )


def _label_prop_sql(n_sweeps: int = 4) -> str:
    """Unrolled seeded-LPA oracle for q_label_communities: per sweep a
    vote count per (node, label), the (count DESC, label ASC) argmax,
    seed clamp, coalesce-to-previous. MATERIALIZED per the DuckDB
    inlining gotcha."""
    return (
        "WITH "
        + _label_prop_ctes(n_sweeps)
        + f"""
SELECT node, CAST(lbl AS BIGINT) AS community
FROM lab{n_sweeps} WHERE lbl IS NOT NULL
"""
    )


def q_tfidf_top_terms(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return textstats.tfidf_top_terms(docs, k=3)


def q_gopher_rules(sf_dir: str):
    """Gopher quality-rule bundle (stages/textstats.py gopher_rules_batch):
    per-rule flags + conjunction, all ratios compared as exact integers."""
    import functools

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # min_stops=1 on the synthetic corpus (its stopword density is low by
    # construction) so the conjunction discriminates; production default is 2
    return docs.map_batches(
        functools.partial(textstats.gopher_rules_batch, min_stops=1),
        batch_format="pyarrow",
    )


def q_dsir_weights(sf_dir: str):
    """DSIR hashed-unigram importance weights (stages/dsir.py) with
    target = English docs: per-bucket log-ratios fitted from ONE K-row
    aggregate, broadcast as fixed-point int64, per-doc weight = integer
    dot product (order-free → hash-stable). Oracle reproduces the bucket
    hash via DuckDB's md5_number_lower and the identical quantized ln."""
    from ..stages.dsir import dsir_weights

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_target", pa.compute.equal(batch.column("lang"), pa.scalar("en"))
        )

    tagged = docs.map_batches(tag, batch_format="pyarrow")
    return dsir_weights(tagged, target_col="is_target")


def q_ann_topk_pq(sf_dir: str):
    """Product-quantization ANN (stages/ann.py pq_topk): 2 subspaces ×
    8-centroid integer-exact codebooks (2 Lloyd iterations), codes built
    with one bucketed pivot shuffle, broadcast ADC lookup tables, local
    top-k per code batch. Fully fixed-point, so the oracle unrolls BOTH
    subspace k-means chains and recomputes the ADC distances in SQL."""
    from ..stages.ann import pq_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return pq_topk(
        emb, query_ids=range(5), k=10, m_subspaces=2, codebook_k=8, iters=2
    )


def q_ann_topk_ivfpq(sf_dir: str):
    """IVF-PQ ANN (stages/ann.py ivfpq_topk): 4 coarse cells (integer
    k-means over full vectors), nprobe=2, 2×8 PQ codebooks, codes
    written partitioned by cell and ONLY probed cells read back (bytes
    telemetry). faiss IndexIVFPQ semantics with by_residual=False, so
    the oracle composes THREE unrolled k-means chains (coarse + both
    subspaces), ranks cells per query by the same integer L2, and
    restricts the ADC ranking to neighbors in probed cells."""
    import tempfile

    from ..stages.ann import ivfpq_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = tempfile.mkdtemp(prefix="c4r_ivfpq_", dir="/tmp")
    res, telemetry = ivfpq_topk(
        emb,
        query_ids=range(5),
        out_dir=out,
        k=10,
        n_cells=4,
        nprobe=2,
        coarse_iters=2,
        m_subspaces=2,
        codebook_k=8,
        iters=2,
    )
    # pruning evidence when the 5 queries' probe union < all cells; the
    # strict always-pruned case is pinned by the unit test's single query
    assert 0 < telemetry["bytes_scanned"] <= telemetry["bytes_total"], telemetry
    return res


def q_ann_recall_ivfpq(sf_dir: str):
    """Recall@10 of the IVF-PQ index against the EXACT integer-L2
    ranking (stages/ann.py recall_at_k) — the evaluation operator of
    the ANN family: ground truth from brute_l2fp_topk (same fixed-point
    quantization and tie discipline as the index), intersection counted
    per query in one tagged-union groupby. The oracle recomputes BOTH
    rankings and the same n_hits/10 division."""
    import tempfile

    from ..stages.ann import brute_l2fp_topk, ivfpq_topk, recall_at_k

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = tempfile.mkdtemp(prefix="c4r_ivfpq_", dir="/tmp")
    approx, _ = ivfpq_topk(
        emb,
        query_ids=range(5),
        out_dir=out,
        k=10,
        n_cells=4,
        nprobe=2,
        coarse_iters=2,
        m_subspaces=2,
        codebook_k=8,
        iters=2,
    )
    exact = brute_l2fp_topk(emb, query_ids=range(5), k=10)
    return recall_at_k(approx, exact, k=10)


def q_mmr_rerank(sf_dir: str):
    """Maximal-Marginal-Relevance diversity re-ranking (stages/ann.py
    mmr_rerank): top-20 candidates by integer fixed-point dot product,
    then 5 greedy picks maximizing rel − max-sim-to-selected (λ = 1/2
    up to scale, ties → smaller id). Fully integer, so the oracle
    unrolls the greedy loop: per step a penalty MAX-join against the
    selected set, argmax by (score DESC, id ASC)."""
    from ..stages.ann import mmr_rerank

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return mmr_rerank(emb, query_ids=range(5), k_cand=20, k_out=5)


def _mmr_sql(k_cand: int = 20, k_out: int = 5) -> str:
    """Unrolled MMR oracle: fp embeddings, integer rel dots, top-k_cand,
    candidate-pair sims, then k_out greedy steps (penalty max-join +
    argmax per step). MATERIALIZED per the DuckDB inlining gotcha."""
    parts = [
        """efp AS MATERIALIZED (
  SELECT vec_id,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e
  FROM embeddings
),
q AS (SELECT vec_id FROM embeddings WHERE vec_id < 5),
relt AS MATERIALIZED (
  SELECT q.vec_id AS query_id, f2.vec_id AS neighbor_id,
         CAST(SUM(f.e * f2.e) AS BIGINT) AS rel
  FROM q
  JOIN efp f ON f.vec_id = q.vec_id
  JOIN efp f2 ON f2.dim = f.dim AND f2.vec_id <> q.vec_id
  GROUP BY 1, 2
),"""
        + f"""
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT query_id, neighbor_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, neighbor_id) AS rn
    FROM relt) WHERE rn <= {k_cand}
),
sims AS MATERIALIZED (
  SELECT c1.query_id, c1.neighbor_id AS a, c2.neighbor_id AS b,
         CAST(SUM(fa.e * fb.e) AS BIGINT) AS sim
  FROM cand c1
  JOIN cand c2 ON c1.query_id = c2.query_id
  JOIN efp fa ON fa.vec_id = c1.neighbor_id
  JOIN efp fb ON fb.vec_id = c2.neighbor_id AND fb.dim = fa.dim
  GROUP BY 1, 2, 3
),
sel1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel AS score FROM (
    SELECT query_id, neighbor_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, neighbor_id) AS rn
    FROM cand) WHERE rn = 1
),
selset1 AS MATERIALIZED (SELECT query_id, neighbor_id FROM sel1)"""
    ]
    for i in range(2, k_out + 1):
        parts.append(
            f"""pen{i} AS (
  SELECT s.query_id, s.a AS neighbor_id, MAX(s.sim) AS pen
  FROM sims s
  JOIN selset{i - 1} ss
    ON ss.query_id = s.query_id AND ss.neighbor_id = s.b
  GROUP BY 1, 2
),
sel{i} AS MATERIALIZED (
  SELECT query_id, neighbor_id, score FROM (
    SELECT c.query_id, c.neighbor_id, c.rel - p.pen AS score,
           row_number() OVER (PARTITION BY c.query_id
                              ORDER BY c.rel - p.pen DESC, c.neighbor_id)
             AS rn
    FROM cand c
    JOIN pen{i} p
      ON p.query_id = c.query_id AND p.neighbor_id = c.neighbor_id
    WHERE NOT EXISTS (
      SELECT 1 FROM selset{i - 1} ss
      WHERE ss.query_id = c.query_id AND ss.neighbor_id = c.neighbor_id
    )) WHERE rn = 1
),
selset{i} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM selset{i - 1}
  UNION ALL
  SELECT query_id, neighbor_id FROM sel{i}
)"""
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT query_id, CAST({i} AS BIGINT) AS rank, neighbor_id, "
        f"score AS mmr_fp FROM sel{i}"
        for i in range(1, k_out + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + finals


def q_embedding_norm_outliers(sf_dir: str):
    """Embedding sanity monitor: vectors whose squared fixed-point L2
    norm sits further than 2 population-σ from the corpus mean — the QA
    gate that catches collapsed (near-zero) or exploded rows before
    they poison ANN/dedup stages. Same discipline as event_bursts —
    z = (v·n − S1)/√(n·S2 − S1²) from exact integer moments — with one
    twist: raw norm² ≤ 2^46 would push Σv² past int64, so all moments
    are computed on v CENTERED BY THE CORPUS MIN (z is shift-invariant),
    keeping every integer inside int64 at this scale. One exactly-
    rounded divide+sqrt at the end, mirrored by the oracle."""
    from ..stages.cluster import quantize_embeddings

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def norms(batch: pa.Table) -> pa.Table:
        x = quantize_embeddings(batch)
        v = np.einsum("nd,nd->n", x, x)  # ≤ 64·2^40 — int64-safe
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "norm2_fp": pa.array(v, pa.int64()),
            }
        )

    scored = emb.map_batches(norms, batch_format="pyarrow").materialize()
    # center by the corpus min so the squared-sum moment fits int64:
    # (v−m) ≤ spread ~2^24 here, (v−m)² ≤ 2^48, ×n ≤ 2^57 — exact
    m = scored.min("norm2_fp")

    def moments(batch: pa.Table) -> pa.Table:
        v = batch.column("norm2_fp").to_numpy(zero_copy_only=False) - m
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "s1": pa.array([int(v.sum())], pa.int64()),
                "s2": pa.array([int((v * v).sum())], pa.int64()),
            }
        )

    # ONE combined aggregate pass (review finding: three .sum() calls
    # re-ran the moments map three times; event_bursts had it right)
    row = scored.map_batches(moments, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Sum("n", alias_name="n"),
        ray.data.aggregate.Sum("s1", alias_name="s1"),
        ray.data.aggregate.Sum("s2", alias_name="s2"),
    )
    n, s1, s2 = int(row["n"]), int(row["s1"]), int(row["s2"])

    def zscore(batch: pa.Table) -> pa.Table:
        v = batch.column("norm2_fp").to_numpy(zero_copy_only=False) - m
        var_num = n * s2 - s1 * s1
        if var_num > 0:
            z = (v * n - s1).astype(np.float64) / np.sqrt(float(var_num))
        else:
            z = np.zeros(len(v), np.float64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "norm2_fp": batch.column("norm2_fp"),
                "zscore": pa.array(z, pa.float64()),
                "is_outlier": pa.array(np.abs(z) > 2.0, pa.bool_()),
            }
        )

    return scored.map_batches(zscore, batch_format="pyarrow")


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding table
    (stages/cluster.py kmeans_fp): integer-exact fixed-point arithmetic
    throughout, so the iterative algorithm is SQL-reproducible — the
    oracle unrolls the same 4 iterations as CTEs."""
    from ..stages.cluster import kmeans_fp

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    assignments, _ = kmeans_fp(emb, k=8, iters=4)
    return assignments


def q_semdedup(sf_dir: str):
    """SemDeDup (cluster-then-cosine-drop) over embeddings with planted
    identical copies (vec_id + N, like embedding_neardup): every copy is
    cos=1 to its original and must be dropped; cluster assignment +
    threshold test are integer-exact so the SQL oracle reproduces the
    full pipeline including the k-means chain."""
    from ..stages.cluster import semdedup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    def copy(batch: pa.Table) -> pa.Table:
        ids = pa.compute.add(batch.column("vec_id"), n)
        return batch.set_column(
            batch.schema.get_field_index("vec_id"), "vec_id", ids
        )

    dup = emb.union(emb.map_batches(copy, batch_format="pyarrow"))
    return semdedup(dup, k=8, iters=4, tau_num=81, tau_den=100)


def q_token_budget_select(sf_dir: str):
    """Greedy quality-ordered token-budget selection
    (stages/sampling.py token_budget_select): keep the best docs while
    the running token total stays ≤ 12000 — a two-level scan over
    score-ordered bins, with bins past the budget pruned map-side before
    the only shuffle. Oracle = the quality expression tree (proven
    float-exact by quality_filter) + SUM() OVER (ORDER BY quality DESC,
    doc_id)."""
    from ..stages.sampling import token_budget_select

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # score and token count in ONE pass over the read (a join of two
    # derived maps would shuffle for nothing)
    def score_and_count(batch: pa.Table) -> pa.Table:
        s = textstats.quality_score_batch(batch)
        t = textstats.token_stats_batch(batch)
        return pa.table(
            {
                "doc_id": s.column("doc_id"),
                "quality": s.column("quality"),
                "n_tok": t.column("n_tokens"),
            }
        )

    combined = docs.map_batches(score_and_count, batch_format="pyarrow")
    return token_budget_select(
        combined, budget=12000, score_col="quality", weight_col="n_tok"
    )


def q_c4_rules(sf_dir: str):
    """C4 cleaning-rule bundle (stages/textstats.py c4_rules_batch) over
    deterministically derived structured pages (the synthetic table is
    line-less; derive_structured_page adds lines/punct/contaminations the
    SQL oracle mirrors). Pure map_batches — trivially 100 TB-safe."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def structure(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(
                    [
                        textstats.derive_structured_page(i, t)
                        for i, t in zip(ids, texts)
                    ],
                    pa.string(),
                ),
            }
        )

    return docs.map_batches(structure, batch_format="pyarrow").map_batches(
        textstats.c4_rules_batch, batch_format="pyarrow"
    )


def q_logreg_quality(sf_dir: str):
    """Trainable quality classifier (stages/logreg.py): class-weighted
    full-batch GD as iterative broadcast-aggregate with fixed-point
    integer gradient sums (order-free → hash-stable). Oracle replays the
    12 unrolled iterations in MATERIALIZED CTEs with the identical float
    expressions."""
    from ..stages.logreg import logreg_quality_scores

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return logreg_quality_scores(docs, iters=12, lr=2.0, pos_weight=6.0)


def q_logreg_calibration(sf_dir: str):
    """Reliability table for the trained quality classifier
    (stages/logreg.py logreg_calibration): per probability decile,
    (n, n_pos, Σp fixed-point) — predicted mass vs observed positives,
    the eval operator that closes the classifier loop. Exact-int
    aggregates on the same round-8 doubles both engines emit."""
    from ..stages.logreg import logreg_calibration

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return logreg_calibration(docs, iters=12, lr=2.0, pos_weight=6.0)


def q_logreg_auc(sf_dir: str):
    """ROC-AUC of the trained quality classifier via the tie-aware
    Mann-Whitney rank sum over the distinct round-8 score grid
    (stages/logreg.py logreg_auc) — the threshold-free eval closing the
    classifier loop beside logreg_calibration. Exact-int numerator, ONE
    division; oracle mirrors the doubled-average-rank fold."""
    from ..stages.logreg import logreg_auc

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return logreg_auc(docs, iters=12, lr=2.0, pos_weight=6.0)


def q_pmi_pairs(sf_dir: str):
    """Windowed PMI collocations (stages/textstats.py pmi_pairs): forward
    window 3, min_count 5. All-integer counts with one float expression at
    the end, mirrored operand-for-operand by the oracle."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return textstats.pmi_pairs(docs, window=3, min_count=5)


def q_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel over the events table
    (stages/windows.py funnel_counts — bucket-pattern sequence matching)."""
    from ..stages.windows import funnel_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_counts(events, steps=("view", "click", "purchase"))


def q_retention(sf_dir: str):
    """Cohort retention over the events table (stages/windows.py
    retention_cohorts)."""
    from ..stages.windows import retention_cohorts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return retention_cohorts(events, max_offset_days=7)


def q_media_decode(sf_dir: str):
    """Multimodal plumbing as a checked query: documents become opaque
    binary payloads (text bytes — the corpus stand-in for image bytes),
    flow through the DecodeMedia → ResizeMedia actor pools, and emit
    (media_id, mime, width, height, feat_md5). Deterministic stub codecs
    (no PIL/ffmpeg in env, declared) → pinned golden oracle."""
    import hashlib as _hashlib

    from ..stages.multimodal import media_pipeline

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = [t.encode("utf-8") for t in batch.column("text").to_pylist()]
        mimes = [("image/png", "image/jpeg", "video/mp4")[i % 3] for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "url": pa.array(
                    [f"https://media.example.com/{i}" for i in ids], pa.string()
                ),
                "mime": pa.array(mimes, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = docs.map_batches(to_media, batch_format="pyarrow")
    out = media_pipeline(media, batch_size=32)

    def finish(batch: pa.Table) -> pa.Table:
        feats = batch.column("features").to_pylist()
        h = [
            _hashlib.md5(np.asarray(f, dtype=np.float32).tobytes()).hexdigest()
            for f in feats
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": batch.column("mime"),
                "width": batch.column("width").cast(pa.int64()),
                "height": batch.column("height").cast(pa.int64()),
                "feat_md5": pa.array(h, pa.string()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type — map-side pair dedup,
    global pair groupby, partial count (stages/agg.py)."""
    from ..stages.agg import distinct_count_per_key

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return distinct_count_per_key(events, "event_type", "user_id")


def q_distinct_users_hll(sf_dir: str):
    """HyperLogLog variant of `distinct_users` (the 100 TB path: per-key
    1 KB register sketches shuffle instead of every distinct pair).
    Deterministic via the pinned hash spec; golden-pinned oracle with an
    independent scalar-python recompute (scripts/gen_golden_oracles.py)."""
    from ..stages.agg import hll_distinct_per_key

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_distinct_per_key(events, "event_type", "user_id")


def q_snapshot_latest(sf_dir: str):
    """CDX-style latest-wins dedup across crawl snapshots: a re-crawl
    (rev 2, every 3rd doc, 1000 s later) unions with the base snapshot
    and the newest capture per url survives — grouped_topk(k=1), i.e.
    map-side partial argmax + one bucketed groupby."""
    from ..stages.agg import grouped_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def snapshots(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts1 = ids  # base capture at t = doc_id seconds
        re_mask = ids % 3 == 0
        ids2 = ids[re_mask]
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids, ids2]), pa.int64()),
                "capture_ts": pa.array(
                    np.concatenate([ts1, ids2 + 1000]), pa.int64()
                ),
                "rev": pa.array(
                    np.concatenate(
                        [np.ones(len(ids)), np.full(len(ids2), 2)]
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    snaps = docs.map_batches(snapshots, batch_format="pyarrow")
    out = grouped_topk(
        snaps, key="doc_id", value="capture_ts", k=1, extra_cols=("rev",)
    )
    return out.drop_columns(["rank"])


def q_token_percentiles(sf_dir: str):
    """Exact corpus length percentiles via the bounded-histogram plan
    (stages/agg.exact_percentiles) — no distributed sort."""
    from ..stages.agg import exact_percentiles

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    stats = docs.map_batches(textstats.token_stats_batch, batch_format="pyarrow")
    return exact_percentiles(stats, "n_tokens", (0.5, 0.9, 0.95, 0.99))


def q_pagerank(sf_dir: str, small_threshold: int = 50_000):
    """PageRank over the synthetic id-level link graph (the same 3
    modular out-edge rules SQL_EDGES uses, deduplicated per row —
    collisions only ever occur within one row's 3 candidates, so dedup
    and out-degree are LOCAL, no shuffle to build the edge table).
    ``small_threshold=0`` forces the distributed BSP path (bench.py's
    pagerank_dist leg — r3 VERDICT: the bench must keep measuring the
    iterative-shuffle plan, not only the local fast path)."""
    from ..stages.graph import pagerank

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = (2 * ids + 1) % n
        d2 = (2 * ids + 2) % n
        d3 = (7 * ids + 3) % n
        dup3 = (d3 == d1) | (d3 == d2)  # d1 != d2 always (differ by 1 mod n)
        outdeg = 3.0 - dup3.astype(np.float64)
        w = 1.0 / outdeg
        keep3 = ~dup3
        src = np.concatenate([ids, ids, ids[keep3]])
        dst = np.concatenate([d1, d2, d3[keep3]])
        ws = np.concatenate([w, w, w[keep3]])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(ws, pa.float64()),
            }
        )

    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return pagerank(
        nodes, edges, n_iters=5, damping=0.85, small_threshold=small_threshold
    )


def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (random walk with restart) from the crawl's
    seed docs {0,1,2} — seed-relative authority for topic-focused
    frontier prioritization, vs global pagerank's popularity. Same
    distributed plan (the teleport vector changes, not the shuffles)."""
    from ..stages.graph import pagerank

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = (2 * ids + 1) % n
        d2 = (2 * ids + 2) % n
        d3 = (7 * ids + 3) % n
        dup3 = (d3 == d1) | (d3 == d2)
        outdeg = 3.0 - dup3.astype(np.float64)
        w = 1.0 / outdeg
        keep3 = ~dup3
        return pa.table(
            {
                "src": pa.array(np.concatenate([ids, ids, ids[keep3]]), pa.int64()),
                "dst": pa.array(np.concatenate([d1, d2, d3[keep3]]), pa.int64()),
                "w": pa.array(np.concatenate([w, w, w[keep3]]), pa.float64()),
            }
        )

    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return pagerank(nodes, edges, n_iters=5, damping=0.85, seeds=[0, 1, 2])


def q_host_pagerank(sf_dir: str):
    """Host-level (domain) authority, CC-curation style: the page link
    graph is contracted map-side to host ids, collapsed to weighted
    inter-host simple edges (self-loops dropped) by ONE int-pair groupby,
    out-weights normalized row-stochastic with the bucketed attach, then
    weighted PageRank runs on the (orders-of-magnitude smaller) host
    graph. 4 iterations, ROUND(8) both engines."""
    from ..stages.graph import (
        contract_to_host_graph,
        normalize_out_weights,
        pagerank,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_host_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = (2 * ids + 1) % n
        d2 = (2 * ids + 2) % n
        d3 = (7 * ids + 3) % n
        keep3 = ~((d3 == d1) | (d3 == d2))  # distinct page edges (local)
        src = np.concatenate([ids, ids, ids[keep3]])
        dst = np.concatenate([d1, d2, d3[keep3]])
        hs = np.where(src % 7 == 0, 0, src % 50)
        hd = np.where(dst % 7 == 0, 0, dst % 50)
        return pa.table(
            {
                "src_host": pa.array(hs, pa.int64()),
                "dst_host": pa.array(hd, pa.int64()),
            }
        )

    def mk_host_nodes(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(np.where(ids % 7 == 0, 0, ids % 50), pa.int64())}
        )

    page_edges = docs.map_batches(mk_host_edges, batch_format="pyarrow")
    host_edges = normalize_out_weights(contract_to_host_graph(page_edges))
    nodes = (
        docs.map_batches(mk_host_nodes, batch_format="pyarrow")
        .groupby("node")
        .count()
        .select_columns(["node"])
    )
    return pagerank(nodes, host_edges, n_iters=4, damping=0.85)


def q_hits(sf_dir: str):
    """HITS hubs/authorities over the synthetic id-level link graph —
    same distinct-edge model as pagerank (collisions only within one
    row's 3 candidates, so dedup is local). 4 L1-normalized sweeps,
    ROUND(8) on both engines."""
    from ..stages.graph import hits

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def mk_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d1 = (2 * ids + 1) % n
        d2 = (2 * ids + 2) % n
        d3 = (7 * ids + 3) % n
        keep3 = ~((d3 == d1) | (d3 == d2))  # d1 != d2 always
        src = np.concatenate([ids, ids, ids[keep3]])
        dst = np.concatenate([d1, d2, d3[keep3]])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return hits(nodes, edges, n_iters=4)


def q_ann_topk(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = sorted(
        emb.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]  # bounded: the k query vectors only
    )
    queries = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    out = ann.brute_force_topk(emb, queries, qids, k=10)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_ann_topk_ivf_scan(sf_dir: str):
    """In-memory IVF baseline: probes by masking but still scans every row
    — kept under the _scan name so the default ann_topk_ivf is the
    bucket-pruned storage path (r2 VERDICT #8)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = sorted(
        emb.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]  # bounded: the k query vectors only
    )
    queries = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    out = ann.ivf_topk(emb, queries, qids, k=10, n_centroids=8, nprobe=8)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_ann_topk_ivf(sf_dir: str):
    """IVF with bucket-pruned STORAGE (the default scale path): embeddings partitioned by centroid
    once (deterministic layout under /tmp), queries read only probed
    partitions. nprobe = all centroids here so the result is exact and the
    brute-force SQL oracle applies; the bytes-scanned telemetry (logged)
    demonstrates the pruning path at lower nprobe."""
    import hashlib
    import os
    import tempfile

    from ..stages.ann import ivf_topk_bucketed, partition_embeddings

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    slug = hashlib.sha1(os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    idx_dir = os.path.join(tempfile.gettempdir(), "c4r_ivf", slug)
    if not os.path.exists(os.path.join(idx_dir, "_CENTROIDS.npy")):
        partition_embeddings(emb, idx_dir, n_centroids=8)
    qrows = sorted(
        emb.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]  # bounded: the k query vectors only
    )
    queries = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    out, telem = ivf_topk_bucketed(idx_dir, queries, qids, k=10, nprobe=8)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_embedding_neardup_brute(sf_dir: str):
    """Brute-force small-N baseline (full-matrix broadcast + blocked
    matmul) — kept under the _brute name so the query users copy by default
    (q_embedding_neardup) is the scale path (r2 VERDICT #8). tau sized to
    the synthetic embeddings' cosine range (max ≈ 0.48)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    pairs = dedup.embedding_neardup_pairs(emb, tau=0.3)
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def q_embedding_neardup(sf_dir: str):
    """Cosine near-dup, SCALE PATH (the default): random-hyperplane LSH
    bucketing + exact in-bucket cosine ≥ 0.9 verification, over embeddings
    with planted identical copies (vec_id + N). Identical vectors share
    every bucket → 100% recall by construction; no full-matrix broadcast
    anywhere (contrast q_embedding_neardup_brute)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    def copy(batch: pa.Table) -> pa.Table:
        ids = pa.compute.add(batch.column("vec_id"), n)
        return batch.set_column(
            batch.schema.get_field_index("vec_id"), "vec_id", ids
        )

    dup = emb.union(emb.map_batches(copy, batch_format="pyarrow"))
    return dedup.embedding_neardup_pairs_lsh(dup, tau=0.9, id_col="vec_id")


_EXACT_COPIES_CACHE: dict[tuple, tuple] = {}


def _docs_with_exact_copies(sf_dir: str):
    """documents ∪ byte-identical copies at doc_id + N (planted exact dups
    whose pair set the oracle reconstructs in SQL).

    The materialized corpus is cached per (Ray job, sf_dir): the simhash and
    fingerprint dedup queries plant the same copies, so a driver running the
    family (the correctness gate, bench) builds the union once; the job id in
    the key drops the cache when a new ray.init would orphan the blocks."""
    import os as _os

    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    key = (job, _os.path.realpath(sf_dir))
    if key in _EXACT_COPIES_CACHE:
        return _EXACT_COPIES_CACHE[key]
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs.count()

    def copy(batch: pa.Table) -> pa.Table:
        ids = [i + n for i in batch.column("doc_id").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": batch.column("text"),
            }
        )

    # materialized: the dup set is consumed three times (candidate pipeline
    # + both verify joins); without this the union re-executes per sink
    dup = docs.union(docs.map_batches(copy, batch_format="pyarrow")).materialize()
    _EXACT_COPIES_CACHE[key] = (dup, docs)
    return dup, docs


def q_minhash_pairs(sf_dir: str):
    """Near-dup pairs = LSH candidates over the raw corpus, then EXACT
    3-gram-Jaccard verification at tau=0.9 (candidate→verify, the standard
    minhash dedup pipeline). The oracle recomputes all-pairs 3-gram Jaccard
    in SQL; the Ray side must therefore have 100% recall at tau (16 bands ×
    4 rows: miss prob ≤ (1-0.9⁴)¹⁶ ≈ 3e-8 per pair)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()  # consumed by the LSH pipeline and both verify joins
    cands = dedup.minhash_lsh_pairs(docs, num_perm=64, bands=16)
    return dedup.verify_pairs(cands, docs, mode="jaccard", tau=0.9)


def q_minhash_index_dedup(sf_dir: str):
    """Incremental near-dup check of a NEW crawl batch against a
    PERSISTED minhash index of the historical corpus (build once, probe
    per batch — signatures of the old side never recompute): bucket-
    partitioned band-key store + pruned probe (stages/dedup.py
    build_minhash_index / probe_minhash_index), then exact 3-gram-Jaccard
    verification at tau=0.9 over old∪new texts. New batch = every 31st
    doc with its first token dropped, ids lifted by 1e6."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    key = _hashlib.md5(_os.path.realpath(sf_dir).encode()).hexdigest()[:12]
    index_dir = f"/tmp/c4r_mhidx/{key}"
    if not _os.path.exists(_os.path.join(index_dir, "_SPEC.json")):
        build = f"{index_dir}.build-{_uuid.uuid4().hex[:8]}"
        dedup.build_minhash_index(docs, build, num_perm=64, bands=16)
        _os.makedirs(_os.path.dirname(index_dir), exist_ok=True)
        try:  # atomic move-into-place; a concurrent winner keeps its copy
            _os.rename(build, index_dir)
        except OSError:
            _shutil.rmtree(build, ignore_errors=True)

    def mk_new(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % 31 == 0
        texts = [
            " ".join(t.split()[1:])
            for t, k in zip(b.column("text").to_pylist(), keep)
            if k
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep] + 1_000_000, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    new_docs = docs.map_batches(mk_new, batch_format="pyarrow").materialize()
    cands, telemetry = dedup.probe_minhash_index(new_docs, index_dir)
    assert telemetry["bytes_total"] > 0
    both = docs.union(new_docs)
    return dedup.verify_pairs(cands, both, mode="jaccard", tau=0.9)


def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT all-pairs 3-gram Jaccard >= 0.9 via PREFIX-FILTERED candidate
    generation (AllPairs/ppjoin) + exact verification — identical result
    to the full inverted-index ngram_jaccard_pairs (equality locked by
    test) but ~(1-tau)^2 the pair explosion on hot shingles. The
    non-approximate sibling of q_minhash_pairs — same metric, same
    threshold, no LSH recall caveat; the oracle recomputes it from string
    grams in SQL."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.ngram_jaccard_pairs_prefix(docs, tau=0.9, shingle=3)


def q_neardup_keep(sf_dir: str):
    """End-to-end near-dup REMOVAL (the composition a training-data user
    actually runs): exact prefix-filtered 3-gram Jaccard pairs →
    undirected edges → distributed connected components (min-label
    propagation with convergence detection) → canonical winner = the
    lowest doc_id per component. → (doc_id, component, keep). The oracle
    recomputes pairs from string grams and closes components with a
    recursive CTE."""
    from ..stages.graph import connected_components

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup.ngram_jaccard_pairs_prefix(docs, tau=0.9, shingle=3)
    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "src": b.column("a").cast(pa.int64()),
                "dst": b.column("b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    comp = connected_components(nodes, edges)

    def verdict(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("node").cast(pa.int64()),
                "component": batch.column("component").cast(pa.int64()),
                "keep": pa.compute.equal(
                    batch.column("node"), batch.column("component")
                ),
            }
        )

    return comp.map_batches(verdict, batch_format="pyarrow")


def q_duplicate_spans(sf_dir: str):
    """Merged maximal cross-document duplicate 5-token spans (substring
    dedup à la exact-substring dup marking): windows whose gram occurs in
    ≥2 distinct docs, fused into (doc_id, start_tok, end_tok) islands.
    The oracle regenerates windows by list slicing in SQL and merges
    islands with window functions."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.duplicate_ngram_spans(docs, window=5)


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk training-sequence packing (seq_len=128) over the
    documents table: each doc's global token offset and sequence span in
    the deterministic doc_id-ordered token stream. Oracle = window cumsum
    over SQL token counts."""
    from ..stages import packing

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return packing.pack_sequences(docs, seq_len=128)


def q_pack_manifest(sf_dir: str):
    """Per-sequence packing manifest (seq_len=128): docs touching each
    sequence + filled token slots. Oracle explodes each doc's sequence
    range with generate_series and recomputes the overlap arithmetic."""
    from ..stages import packing

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return packing.sequence_manifest(
        packing.pack_sequences(docs, seq_len=128), seq_len=128
    )


def q_recrawl_priority(sf_dir: str):
    """Revisit scheduling by observed change rate (the adaptive-revisit
    policy of production crawlers): 4 simulated captures per url whose
    content version bumps at deterministic steps, exact distinct-version
    count per url via the map-side-dedup + bucketed-groupby machinery,
    then change_rate (identical rational expression both engines → doubles
    bit-identical) and an integer revisit interval. Urls that changed at
    every capture get the shortest interval."""
    from ..stages.agg import distinct_count_per_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def revisions(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out_ids, out_rev, out_ver = [], [], []
        # change between rev r and r+1 at step s=r iff (doc_id + 2*s) % 4 == 0:
        # odd ids never change, ids % 4 == 0 change once (s=2),
        # ids % 4 == 2 change twice (s=1 and s=3)
        for rev in range(1, 5):
            ver = np.zeros(len(ids), dtype=np.int64)
            for s in range(1, rev):
                ver += ((ids + 2 * s) % 4 == 0).astype(np.int64)
            out_ids.append(ids)
            out_rev.append(np.full(len(ids), rev, dtype=np.int64))
            out_ver.append(ver)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "rev": pa.array(np.concatenate(out_rev), pa.int64()),
                "ver": pa.array(np.concatenate(out_ver), pa.int64()),
            }
        )

    revs = docs.map_batches(revisions, batch_format="pyarrow")
    nd = distinct_count_per_key(revs, key="doc_id", value="ver")

    def schedule(batch: pa.Table) -> pa.Table:
        n_distinct = batch.column("n_distinct").to_numpy(zero_copy_only=False).astype(np.int64)
        n_revs = np.full(len(n_distinct), 4, dtype=np.int64)
        rate = (n_distinct.astype(np.float64) - 1.0) / (
            n_revs.astype(np.float64) - 1.0
        )
        interval = 86400 * n_revs // (n_distinct * 4)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_revs": pa.array(n_revs, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "change_rate": pa.array(rate, pa.float64()),
                "revisit_interval_s": pa.array(interval, pa.int64()),
            }
        )

    return nd.map_batches(schedule, batch_format="pyarrow")


def _token_counts_ds(sf_dir: str):
    """(doc_id, lang, n_tok) over documents — whitespace token counts,
    shared by the per-lang mean and sketch-quantile queries."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def counts(batch: pa.Table) -> pa.Table:
        n = np.fromiter(
            (len((t or "").split()) for t in batch.column("text").to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tok": pa.array(n, pa.int64()),
            }
        )

    return docs.map_batches(counts, batch_format="pyarrow")


def _synthetic_link_edges(sf_dir: str):
    """The synthetic doc link graph (same arithmetic as the pagerank / CC
    oracles): src -> (2s+1, 2s+2, 7s+3) mod N. Shared by the triangle and
    clustering queries — one Python site, mirrored by one SQL CTE shape."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = docs.count()

    def child_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([ids, ids, ids])
        dst = np.concatenate(
            [(2 * ids + 1) % n_docs, (2 * ids + 2) % n_docs, (7 * ids + 3) % n_docs]
        )
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return docs.map_batches(child_edges, batch_format="pyarrow")


def q_length_vs_lang_mean(sf_dir: str):
    """Per-doc length relative to its language's mean — the canonical
    broadcast-aggregate-back pattern: the big table never shuffles; the
    per-lang (sum, count) aggregate (≤ |langs| rows) is collected once,
    broadcast, and joined map-side. Ratio = n_tok * cnt / sum over exact
    int64 sums → both engines evaluate the identical double division,
    bit-identical."""
    # materialized: consumed by the aggregate AND the ratio map (one
    # tokenization pass, review finding)
    toks = _token_counts_ds(sf_dir).materialize()
    # tiny per-lang aggregate → driver dict → broadcast into the map stage
    agg = toks.groupby("lang").aggregate(
        ray.data.aggregate.Sum("n_tok", alias_name="sum_tok"),
        ray.data.aggregate.Count(alias_name="cnt"),
    ).take_all()  # bounded: one row per lang (bounded key domain)
    stats = {r["lang"]: (int(r["sum_tok"]), int(r["cnt"])) for r in agg}
    stats_ref = ray.put(stats)

    def ratio(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        langs = batch.column("lang").to_pylist()
        n = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.fromiter((st[l][0] for l in langs), dtype=np.int64, count=len(langs))
        cnts = np.fromiter((st[l][1] for l in langs), dtype=np.int64, count=len(langs))
        r = (n * cnts).astype(np.float64) / sums.astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tok": pa.array(n, pa.int64()),
                "len_ratio": pa.array(r, pa.float64()),
            }
        )

    return toks.map_batches(ratio, batch_format="pyarrow")


def q_host_curation(sf_dir: str):
    """Domain-level curation (the C4/Gopher per-domain keep/drop step):
    per-host (sum_tok, n_docs) aggregate — ≤ |hosts| rows — collected and
    broadcast, every doc annotated map-side with its host verdict
    keep = n_docs ≥ 8 AND mean tokens ≥ 52 (integer cross-multiplication:
    sum ≥ 52·n — no float anywhere). The corpus never shuffles."""
    from ..sources.pages import host_id_of

    toks = _token_counts_ds(sf_dir).materialize()

    def add_host(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = [f"site{host_id_of(int(i))}.example.com" for i in ids]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "host": pa.array(hosts, pa.string()),
                "n_tok": batch.column("n_tok"),
            }
        )

    hosted = toks.map_batches(add_host, batch_format="pyarrow").materialize()
    agg = hosted.groupby("host").aggregate(
        ray.data.aggregate.Sum("n_tok", alias_name="sum_tok"),
        ray.data.aggregate.Count(alias_name="n_docs"),
    ).take_all()  # bounded: one row per host (bounded key domain)
    stats = {r["host"]: (int(r["sum_tok"]), int(r["n_docs"])) for r in agg}
    stats_ref = ray.put(stats)

    def verdict(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        hosts = batch.column("host").to_pylist()
        n_docs = np.fromiter((st[h][1] for h in hosts), dtype=np.int64,
                             count=len(hosts))
        sums = np.fromiter((st[h][0] for h in hosts), dtype=np.int64,
                           count=len(hosts))
        keep = (n_docs >= 8) & (sums >= 52 * n_docs)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "host": batch.column("host"),
                "host_n_docs": pa.array(n_docs, pa.int64()),
                "host_keep": pa.array(keep, pa.bool_()),
            }
        )

    return hosted.map_batches(verdict, batch_format="pyarrow")


def q_token_quantiles_sketch(sf_dir: str):
    """Per-language token-count quantiles from the deterministic KLL-style
    sketch (stages/sketch.py) — the approximate, O(k log n)-memory sibling
    of the exact token_percentiles. Deterministic by construction (ordered
    id-range partials, bucket-ordered fold) → golden-pinned oracle with an
    independent scalar recompute in scripts/gen_golden_oracles.py."""
    from ..stages.sketch import quantiles_per_key

    toks = _token_counts_ds(sf_dir)
    return quantiles_per_key(
        toks, key="lang", value="n_tok", qs=[0.25, 0.5, 0.9], k=64
    )


_TERM_INDEX_CACHE: dict[str, str] = {}


def q_term_index_lookup(sf_dir: str):
    """Point lookup against the term-partitioned postings layout
    (stages/index.py): (doc_id, tf) for the term 'merge', reading ONE of
    32 partitions (bytes-scanned telemetry asserted in tests). The layout
    is built once per session per sf_dir. Oracle recomputes the term's tf
    from the text in SQL."""
    import hashlib as _hl

    from ..stages.index import build_term_index, term_lookup

    key = os.path.realpath(sf_dir)
    if key not in _TERM_INDEX_CACHE:
        out = os.path.join(
            "/tmp/c4r_term_index", _hl.md5(key.encode()).hexdigest()[:12]
        )
        if not os.path.exists(os.path.join(out, "_META")):
            docs = ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
            build_term_index(docs, out, num_partitions=32)
        _TERM_INDEX_CACHE[key] = out
    ds, _tel = term_lookup(_TERM_INDEX_CACHE[key], "merge")
    return ds


def q_grouped_sample(sf_dir: str):
    """Deterministic exact-k (k=5) sample per language — smallest Knuth
    bucket of doc_id wins, ties by id; the fixed-size complement of the
    rate-based stratified_sample. Oracle = ROW_NUMBER window over the
    same integer decision function."""
    from ..stages import sampling

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return sampling.grouped_sample(docs, k=5)


def q_rebalance_mix(sf_dir: str):
    """Language-mix rebalancing: target 50% en / 20% de / 20% fr / 10% es
    (zh dropped) over a 250-doc budget, deterministic integer-cut
    down-sampling. Oracle reproduces the two-phase cut arithmetic in
    BIGINT SQL."""
    from ..stages import sampling

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return sampling.rebalance_mix(
        docs,
        target_bp={"en": 5000, "de": 2000, "fr": 2000, "es": 1000},
        total_keep=250,
    )


def q_bpe_merges(sf_dir: str):
    """Distributed BPE merge learning (stages/bpe.py, sharded incremental
    scale path): top-24 merges over the documents corpus word
    frequencies. Iterative + argmax-valued — not SQL-expressible;
    golden-pinned at sf0.01 with an independent scalar recompute asserted
    by the generator (learn_bpe_scalar)."""
    from ..stages.bpe import learn_bpe

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return learn_bpe(docs, num_merges=24)


def q_bpe_tokenize(sf_dir: str):
    """Tokenizer train→apply: learn 48 merges (sharded incremental), then
    stream the corpus through the cached actor-pool encoder — per-doc
    (doc_id, n_words, n_chars, n_tokens). Golden-pinned at sf0.01; the
    generator recomputes it with the SEQUENTIAL reference encoder
    (tokenize_scalar), so the rank-argmin encode is cross-validated."""
    from ..stages.bpe import learn_bpe, tokenize_corpus

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    m = learn_bpe(docs, num_merges=48)
    merges = list(zip(m.column("left").to_pylist(), m.column("right").to_pylist()))
    return tokenize_corpus(docs, merges)


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled (α=1/2) language-mix sampling over a 250-doc
    budget: per-stratum shares ∝ isqrt(count), integer-exact cuts, same
    map-only deterministic keep rule as the other samplers. The oracle
    recomputes isqrt as FLOOR(SQRT(...)) — exact for counts < 2^52."""
    from ..stages import sampling

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return sampling.temperature_mix(docs, total_keep=250)


def q_ngram_df_histogram(sf_dir: str):
    """Gram document-frequency histogram (boilerplate profile): n_grams
    per doc_freq. Two-level aggregation — per-bucket full reduction, tiny
    partial histograms, final groupby over ≤max(df) rows."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.ngram_doc_freq_histogram(docs, shingle=3)


def q_simhash_pairs(sf_dir: str):
    """Exact-dup pairs via simhash candidates (hamming ≤ 3 block bucketing)
    + byte-equality verification over the corpus with planted identical
    copies. Identical texts share all blocks → 100% recall by construction;
    the equality verify kills near-miss candidates, so the output is exactly
    the planted pair set (SQL-reconstructable)."""
    dup, _ = _docs_with_exact_copies(sf_dir)
    cands = dedup.simhash_pairs(dup, max_hamming=3)
    return dedup.verify_pairs(cands, dup, mode="equal")


def q_fingerprints(sf_dir: str):
    """Winnowing fingerprints, exploded to one row per kept window hash
    (doc_id, idx, fp). Hash-valued → oracle = pinned golden (generated and
    independently recomputed in pure python by
    scripts/gen_golden_oracles.py)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    fps = docs.map_batches(textstats.fingerprint_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, vals = [], [], []
        for i, fp in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("fingerprint").to_pylist(),
        ):
            for j, v in enumerate(fp):
                ids.append(i)
                idxs.append(j)
                vals.append(v)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
                "fp": pa.array(vals, pa.uint64()),
            }
        )

    return fps.map_batches(explode, batch_format="pyarrow")


def q_fingerprint_dups(sf_dir: str):
    """Exact-dup pairs via winnowing-fingerprint candidates (docs sharing a
    kept window-hash) with FUSED in-bucket equality verification (content
    hash rides in the bucket rows — no verify shuffle at all), planted
    identical copies. Identical token streams keep identical window minima
    → 100% recall; equality verify → exactly the planted pairs."""
    dup, _ = _docs_with_exact_copies(sf_dir)
    return dedup.fingerprint_dup_pairs_fused(dup)


def q_redact(sf_dir: str):
    """Redaction scrub stage over the documents table. The operator ships
    the 21-pattern PII catalog (emails/phones/IPs/…); the synthetic corpus
    contains none of those, so the query exercises the same machinery with
    a corpus-matching keyword pattern — the oracle re-derives the rewrite
    with DuckDB's regexp_replace."""
    from ..stages.redact import redact

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return redact(
        docs, patterns={"kw": r"\b(spark|dup)\b"}, concurrency=(1, 4)
    )


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language downsampling (training-data mixing):
    keep iff knuth_bucket(doc_id) < rate[lang]·10000. Map-only — no
    shuffle, no RNG; the oracle recomputes the same arithmetic in SQL."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return sampling.stratified_sample(
        docs, rates={"en": 0.5, "de": 0.25, "fr": 0.25}, default_rate=0.1
    )


def q_dataset_split_counts(sf_dir: str):
    """Train/val/test assignment as a pure function of doc_id, aggregated
    to (split, lang) counts — the reproducible-split operator every
    training pipeline needs before a single byte is trained on."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    tagged = sampling.deterministic_split(docs, val_frac=0.1, test_frac=0.1)
    out = tagged.groupby(["split", "lang"]).aggregate(
        ray.data.aggregate.Count(alias_name="n_docs")
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_docs"),
            "n_docs",
            b.column("n_docs").cast(pa.int64()),
        ),
        batch_format="pyarrow",
    )


def q_lang_id(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        textstats.LangId, batch_format="pyarrow", concurrency=(1, 4), batch_size=256
    )


def q_best_first_order(sf_dir: str):
    cfg = CrawlConfig(
        strategy="best_first",
        max_depth=2,
        max_pages=40,
        seen_shards=4,
        url_scorer=KeywordRelevanceScorer(["page/1", "page/2"], weight=1.0),
    )
    run = crawl(sf_dir, seeds=[url_of(0)], cfg=cfg)
    urls, waves = [], []
    for w in run.waves:
        for u in w["frontier_urls"]:
            urls.append(u)
            waves.append(w["wave"])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "wave": pa.array(waves, pa.int64()),
        }
    )


def q_dfs_order(sf_dir: str):
    """DFS crawl-order conformance: strategy="dfs" sorts the pending set
    (depth desc, url asc — score 0 with no scorer) and admits the whole
    frontier each wave up to the page budget. Completes the
    ordering-oracle triple (bfs_depth / best_first_order / dfs_order);
    the oracle replays the wave loop as a recursive CTE, the same
    construction as best_first_order's."""
    cfg = CrawlConfig(strategy="dfs", max_depth=2, max_pages=30, seen_shards=4)
    run = crawl(sf_dir, seeds=[url_of(0)], cfg=cfg)
    urls, waves = [], []
    for w in run.waves:
        for u in w["frontier_urls"]:
            urls.append(u)
            waves.append(w["wave"])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "wave": pa.array(waves, pa.int64()),
        }
    )


def q_politeness_budget(sf_dir: str):
    cfg = CrawlConfig(
        max_depth=2, seen_shards=4, max_pages_per_host_per_wave=2
    )
    run = crawl(sf_dir, seeds=[url_of(0), url_of(1), url_of(2)], cfg=cfg)
    urls, waves = [], []
    for w in run.waves:
        for u in w["frontier_urls"]:
            urls.append(u)
            waves.append(w["wave"])
    return pa.table(
        {"url": pa.array(urls, pa.string()), "wave": pa.array(waves, pa.int64())}
    )


# ---------------------------------------------------------------------------
# relational demonstrators (TPC-H-ish; exercise join + groupby at scale)
# ---------------------------------------------------------------------------

def q_link_preview(sf_dir: str):
    """Link targets joined to corpus head metadata (Dataset.join path)."""
    from ..sources.pages import read_pages
    from ..stages.link_preview import link_preview

    docs = _docs(sf_dir)
    pages = read_pages(sf_dir, columns=["url", "html"])
    return link_preview(docs, pages)


def q_link_preview_filtered(sf_dir: str):
    """LinkPreviewConfig knobs exercised: exclude glob prunes targets
    map-side, max_links=5 caps distinct previewed targets per source
    (first-by-target-asc, via grouped_topk)."""
    from ..sources.pages import read_pages
    from ..stages.link_preview import link_preview

    docs = _docs(sf_dir)
    pages = read_pages(sf_dir, columns=["url", "html"])
    return link_preview(
        docs, pages, exclude_patterns=["*/page/1*"], max_links=5
    )


def q_adaptive_crawl(sf_dir: str):
    """Statistical-stopping adaptive crawl (rows-only: iterative algorithm)."""
    from .adaptive import adaptive_crawl

    res = adaptive_crawl(
        sf_dir, [url_of(0)], query="table scan merge join",
        max_waves=4, wave_size=8, max_pages=40,
    )
    return pa.table(
        {
            "wave": pa.array([w["wave"] for w in res.waves], pa.int64()),
            "pages": pa.array([w["pages"] for w in res.waves], pa.int64()),
            "confidence": pa.array(
                [w["confidence"] for w in res.waves], pa.float64()
            ),
        }
    )


def q_schema_extract(sf_dir: str):
    """JsonCssExtractionStrategy over the pages corpus: h1 text per page."""
    from ..functions.extraction import ExtractStage, JsonCssExtractionStrategy

    pages = _pages_ds(sf_dir, columns=["url", "html"])
    schema = {
        "baseSelector": "h1",
        "fields": [{"name": "h1", "type": "text"}],
    }
    stage = ExtractStage(JsonCssExtractionStrategy(schema), content_col="html")

    def flatten(batch: pa.Table) -> pa.Table:
        import json as _json

        urls, h1s = [], []
        for u, ex in zip(
            batch.column("url").to_pylist(), batch.column("extracted").to_pylist()
        ):
            for rec in _json.loads(ex):
                urls.append(u)
                h1s.append(rec.get("h1", ""))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "h1": pa.array(h1s, pa.string())}
        )

    return pages.map_batches(stage, batch_format="pyarrow").map_batches(
        flatten, batch_format="pyarrow"
    )


def q_regex_extract(sf_dir: str):
    """RegexExtractionStrategy with a custom pattern over page HTML: the
    deterministic code-block function names (every 7th page)."""
    from ..functions.extraction import ExtractStage, RegexExtractionStrategy

    pages = _pages_ds(sf_dir, columns=["url", "html"])
    stage = ExtractStage(
        RegexExtractionStrategy(patterns={"fn": r"sample_\d+"}), content_col="html"
    )

    def flatten(batch: pa.Table) -> pa.Table:
        import json as _json

        urls, values = [], []
        for u, ex in zip(
            batch.column("url").to_pylist(), batch.column("extracted").to_pylist()
        ):
            seen = set()
            for rec in _json.loads(ex):
                if rec["value"] not in seen:
                    seen.add(rec["value"])
                    urls.append(u)
                    values.append(rec["value"])
        return pa.table(
            {"url": pa.array(urls, pa.string()), "value": pa.array(values, pa.string())}
        )

    return pages.map_batches(stage, batch_format="pyarrow").map_batches(
        flatten, batch_format="pyarrow"
    )


def q_adaptive_embedding(sf_dir: str):
    """Embedding-strategy adaptive crawl (adaptive_crawler.py:593-960
    analogue): deterministic query expansion → distributed best-cosine
    coverage updates → gap-steered best-first waves. Deterministic output;
    oracle = pinned golden (iterative algorithm, not SQL-expressible)."""
    from .adaptive import adaptive_crawl

    res = adaptive_crawl(
        sf_dir, [url_of(0)], query="table scan merge join",
        max_waves=4, wave_size=8, max_pages=32, strategy="embedding",
    )
    return pa.table(
        {
            "wave": pa.array([w["wave"] for w in res.waves], pa.int64()),
            "pages": pa.array([w["pages"] for w in res.waves], pa.int64()),
            "gaps": pa.array([w["gaps"] for w in res.waves], pa.int64()),
            "confidence": pa.array(
                [round(w["confidence"], 9) for w in res.waves], pa.float64()
            ),
        }
    )


def q_cosine_sections(sf_dir: str):
    """Cosine-cluster section extraction (rows-only: stub embedder)."""
    from ..stages.embed import cosine_sections

    pages = _pages_ds(sf_dir, columns=["url", "text"])
    return cosine_sections(pages).select_columns(["url", "cluster", "n_chunks"])


def q_top_k_relevant(sf_dir: str):
    """BM25 top-k most relevant documents for a query (adaptive
    get_relevant_content analogue; rows-only: float scores)."""
    import math

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    query_terms = ["table", "scan", "merge"]

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        scores = []
        for t in texts:
            toks = t.lower().split()
            n = len(toks) or 1
            s = sum(toks.count(q) / n for q in query_terms)
            scores.append(s)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(scores, pa.float64()),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(10)
        .select_columns(["doc_id"])
    )


def _bm25_scored(sf_dir: str, terms=("table", "scan", "merge")):
    """Shared BM25 scoring plan (doc_id, score): one tokenize pass emits
    per-doc (tf…, dl); collection stats fold on the driver and broadcast
    back into the scoring map. Used by q_bm25_topk and q_hybrid_rrf."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    terms = list(terms)
    K1, B = 1.2, 0.75

    def tfs(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch.column("doc_id")}
        texts = [(t or "").lower().split() for t in batch.column("text").to_pylist()]
        cols["dl"] = pa.array([len(t) for t in texts], pa.int64())
        for i, q in enumerate(terms):
            cols[f"tf{i}"] = pa.array([t.count(q) for t in texts], pa.int64())
        return pa.table(cols)

    # materialized: consumed by the stats aggregate, the df aggregate AND
    # the scoring map — without it the corpus is read+tokenized three
    # times (review finding)
    tf_ds = docs.map_batches(tfs, batch_format="pyarrow").materialize()
    aggs = [ray.data.aggregate.Count(alias_name="n_docs"),
            ray.data.aggregate.Sum("dl", alias_name="sum_dl")]
    stats_row = tf_ds.aggregate(*aggs)
    # df per term: tiny second aggregate over boolean masks
    def df_part(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                f"df{i}": pa.array(
                    [int((batch.column(f"tf{i}").to_numpy(zero_copy_only=False) > 0).sum())],
                    pa.int64(),
                )
                for i in range(len(terms))
            }
        )

    df_row = tf_ds.map_batches(df_part, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(f"df{i}", alias_name=f"df{i}") for i in range(len(terms))]
    )
    n_docs = int(stats_row["n_docs"])
    sum_dl = int(stats_row["sum_dl"])
    dfs = [int(df_row[f"df{i}"]) for i in range(len(terms))]
    avgdl = float(sum_dl) / float(n_docs)
    import math

    # math.log (libm) rather than np.log: numpy's SIMD log can differ
    # from DuckDB's libm ln in the last ulp
    idfs = [
        math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) for df in dfs
    ]

    def score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(terms)):
            tf = batch.column(f"tf{i}").to_numpy(zero_copy_only=False).astype(np.float64)
            s += idfs[i] * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(np.round(s, 8), pa.float64()),
            }
        )

    return tf_ds.map_batches(score, batch_format="pyarrow")


def q_bm25_topk(sf_dir: str):
    """Full BM25 (Robertson idf + length normalization, k1=1.2 b=0.75)
    top-10 document search — the lexical sibling of the ANN queries and
    the corpus-level big brother of the seeder's head-field BM25. Both
    engines evaluate the identical expression tree over exact int64
    counts and ROUND to 8 decimals (the pagerank float discipline), with
    doc_id tiebreak."""
    return (
        _bm25_scored(sf_dir)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(10)
    )


def q_bm25_topk_indexed(sf_dir: str):
    """BM25 top-10 over the PERSISTED term index (stages/index.py
    bm25_lookup): only the three query terms' partitions are read
    (asserted via bytes telemetry), df comes from the pruned postings,
    dl rides each posting (keep_dl layout), avgdl/N from the build-time
    _META. The score is the identical float expression as the full-scan
    bm25_topk — absent terms contribute exactly 0.0 — so this query
    shares bm25_topk's oracle verbatim: index path ≡ scan path."""
    import tempfile

    from ..stages.index import bm25_lookup, build_term_index

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = tempfile.mkdtemp(prefix="c4r_bm25idx_", dir="/tmp")
    build_term_index(docs, out, keep_dl=True)
    res, tel = bm25_lookup(out, ["table", "scan", "merge"], k=10)
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"], tel
    return res


def q_bm25_topk_merged(sf_dir: str):
    """Index lifecycle: the corpus is indexed as TWO crawl segments
    (doc_id < N/2 and the rest), compacted with merge_term_indexes
    applying tombstone deletes (doc_id ≡ 0 mod 31 — recrawled docs),
    then queried with bm25_lookup. The defining property under test:
    BM25 over the compacted index ≡ BM25 over a fresh index of the
    surviving corpus — the oracle is the scan formula over documents
    WHERE doc_id % 31 <> 0."""
    import tempfile

    from ..stages.index import bm25_lookup, build_term_index, merge_term_indexes

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs.count()
    half = n // 2
    seg_a = docs.filter(expr=f"doc_id < {half}")
    seg_b = docs.filter(expr=f"doc_id >= {half}")
    d_a = tempfile.mkdtemp(prefix="c4r_bm25seg_a_", dir="/tmp")
    d_b = tempfile.mkdtemp(prefix="c4r_bm25seg_b_", dir="/tmp")
    merged = tempfile.mkdtemp(prefix="c4r_bm25merged_", dir="/tmp")
    build_term_index(seg_a, d_a, keep_dl=True)
    build_term_index(seg_b, d_b, keep_dl=True)
    deletes = {i for i in range(0, n, 31)}
    merge_term_indexes([d_a, d_b], merged, delete_ids=deletes)
    res, tel = bm25_lookup(merged, ["table", "scan", "merge"], k=10)
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"], tel
    return res


def q_search_snippets(sf_dir: str):
    """Result snippets for the BM25 top-10: per hit, the 10-token window
    containing the most query-term tokens (ties → leftmost), the last
    piece of the search stack after ranking. The top-10 reuses the
    oracle-proven scan ranking; snippet extraction touches ONLY those 10
    docs (point-read by id). Output (doc_id, n_hits, snippet)."""
    import pyarrow.dataset as pds

    W = 10
    qset = {"table", "scan", "merge"}
    top = (
        _bm25_scored(sf_dir)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(10)
        .take_all()  # bounded: ≤ 10 rows (sort+limit)
    )
    ids = sorted(int(r["doc_id"]) for r in top)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pds.field("doc_id").isin(pa.array(ids, pa.int64())),
    )

    def snip(batch: pa.Table) -> pa.Table:
        out_d, out_h, out_s = [], [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = (text or "").lower().split()
            n_win = max(1, len(toks) - W + 1)
            hits = np.array(
                [
                    sum(1 for t in toks[i : i + W] if t in qset)
                    for i in range(n_win)
                ],
                np.int64,
            )
            best = int(hits.argmax())  # argmax takes the FIRST max — leftmost
            out_d.append(did)
            out_h.append(int(hits[best]))
            out_s.append(" ".join(toks[best : best + W]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "n_hits": pa.array(out_h, pa.int64()),
                "snippet": pa.array(out_s, pa.string()),
            }
        )

    return docs.map_batches(snip, batch_format="pyarrow")


def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    top-20 and the exact-cosine semantic top-20 (query = embedding 0,
    vec_id aligned with doc_id). Fusion is integer-exact —
    contribution = 10^9 // (60 + rank) — so only the two input RANKINGS
    carry float comparisons (both already oracle-proven: bm25_topk,
    ann_topk). → (doc_id, rrf_fp, rank) top-10."""
    from ..stages.ann import brute_force_topk, rrf_fuse

    lex20 = (
        _bm25_scored(sf_dir)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(20)
    )

    def lex_rank(batch: pa.Table) -> pa.Table:
        # post-limit the dataset is ≤20 ordered rows in one block
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "rank": pa.array(
                    np.arange(1, batch.num_rows + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    lex = lex20.repartition(1).map_batches(
        lex_rank, batch_format="pyarrow", batch_size=None
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    q0 = sorted(
        emb.filter(expr="vec_id < 1").take_all(), key=lambda r: r["vec_id"]  # bounded: the k query vectors only
    )
    queries = np.asarray([r["embedding"] for r in q0], dtype=np.float64)
    sem = brute_force_topk(emb, queries, [0], k=20).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("neighbor_id").cast(pa.int64()),
                "rank": b.column("rank").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return rrf_fuse([lex, sem], k_const=60, topk=10)


def q_triangles(sf_dir: str):
    """Exact triangle enumeration over the synthetic doc link graph (the
    pagerank/CC corpus arithmetic): degree-ordered node-iterator as five
    bounded union+groupby shuffles (stages/graph.py triangle_enumerate).
    Oracle = the textbook three-way self-join on the deduped undirected
    edge list."""
    from ..stages.graph import triangle_enumerate

    return triangle_enumerate(_synthetic_link_edges(sf_dir))


def q_clustering_coeff(sf_dir: str):
    """Local clustering coefficients over the synthetic link graph —
    triangles credited to their three corners, degrees from the deduped
    edge list, identical (2.0·T)/(deg·(deg−1)) expression both engines."""
    from ..stages.graph import clustering_coefficients

    return clustering_coefficients(_synthetic_link_edges(sf_dir))


def q_events_window(sf_dir: str):
    """Tumbling 1h window counts per event_type (custom windowed-aggregate
    operator; count-only so the oracle compare is float-free)."""
    from ..stages.windows import tumbling_window_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    out = tumbling_window_counts(events, "1h", value_col=None)
    return out.select_columns(["window_start", "event_type", "n_events"])


def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate: 1 h windows every 30 min (each event in 2
    windows). Oracle: UNION of the two window starts in SQL."""
    from ..stages.windows import hopping_window_counts

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    return hopping_window_counts(events, size_minutes=60, hop_minutes=30)


def q_text_normalize(sf_dir: str):
    """Unicode/whitespace normalization (functions/text.normalize_text):
    NFC compose, C0-control strip, horizontal-space collapse, blank-line
    cap, edge trim — the ftfy-lite pass before tokenization. The corpus
    text is clean by construction, so each doc gets a deterministic
    messy derivation planted first (combining accents, a BEL control, a
    tab, 4 newlines, trailing spaces — keyed on doc_id, mirrored
    verbatim by the oracle); map-only, zero shuffles."""
    from ..functions.text import normalize_text

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def messy_then_norm(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            m = t
            if i % 3 == 0:
                m += " mid\x07dle"
            if i % 5 == 0:
                m += "\n\n\n\nz"
            m += " Café\t tail  "
            out.append(normalize_text(m))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_norm": pa.array(out, pa.string()),
                "n_chars": pa.array([len(t) for t in out], pa.int64()),
            }
        )

    return docs.map_batches(messy_then_norm, batch_format="pyarrow")


def q_event_bursts(sf_dir: str):
    """Burst/anomaly detection per (event_type, hour): flag hours whose
    event count sits further than 2 population-σ from the type's mean
    hourly count — the ops-side monitor a production crawl runs over its
    fetch/error event stream. Plan: ONE (type, hour) partial-count
    groupby (map-side combined; events themselves never shuffle again),
    then the per-type moments (n, Σc, Σc²) — ≤|types| rows — collected
    and BROADCAST back over the count table (broadcast-aggregate-back,
    no second wide shuffle). Float discipline: z = (c·n − S1) /
    √(n·S2 − S1²) evaluated from exact int64 moments with one final
    double division — both engines run the identical expression, and
    IEEE sqrt/divide are exactly rounded, so doubles match bit-for-bit;
    zero-variance types are guarded to z = 0."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def type_hour(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        out = (
            df.with_columns(pl.col("ts").dt.truncate("1h").alias("hour"))
            .group_by(["event_type", "hour"])
            .len(name="c")
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("hour", pa.timestamp("us")),
                    ("c", pa.int64()),
                ]
            )
        )

    counts = (
        events.map_batches(type_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("c")
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "hour": b.column("hour"),
                    "c": b.column("sum(c)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # consumed twice: moments aggregate + z-score map
    )

    def moments(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "s1": pa.array(c, pa.int64()),
                "s2": pa.array(c * c, pa.int64()),
            }
        )

    agg = (
        counts.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("s1", alias_name="s1"),
            ray.data.aggregate.Sum("s2", alias_name="s2"),
        )
        .take_all()
    )  # ≤ |event types| rows — driver-safe, broadcast below
    stats = {
        r["event_type"]: (int(r["n"]), int(r["s1"]), int(r["s2"])) for r in agg
    }
    stats_ref = ray.put(stats)

    def zscore(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        types = batch.column("event_type").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.array([st[t][0] for t in types], np.int64)
        s1 = np.array([st[t][1] for t in types], np.int64)
        s2 = np.array([st[t][2] for t in types], np.int64)
        var_num = n * s2 - s1 * s1  # n²·population-variance, exact int64
        safe = var_num > 0
        z = np.where(
            safe,
            (c * n - s1).astype(np.float64)
            / np.sqrt(np.where(safe, var_num, 1).astype(np.float64)),
            0.0,
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": batch.column("hour"),
                "n_events": pa.array(c, pa.int64()),
                "zscore": pa.array(z, pa.float64()),
                "is_burst": pa.array(np.abs(z) > 2.0, pa.bool_()),
            }
        )

    return counts.map_batches(zscore, batch_format="pyarrow")


def q_event_transitions(sf_dir: str):
    """Behavior transition matrix: corpus-wide counts of (event_type →
    next event_type) within each user's time-ordered stream — the
    Markov-chain summary funnels/retention build on. One hash(user) % P
    shuffle co-locates each user's history; per bucket a vectorized
    sort + shift pairs each event with its successor (ties broken by
    event_id, mirrored by the oracle's LEAD ordering) and partial-
    counts the pairs map-side; ONE tiny pair groupby closes it."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )
    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((u % P).astype(np.int64)),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
            }
        )

    def pairs(g) -> pa.Table:
        import pandas as pd

        if g.empty:
            return pa.table(
                {
                    "src_type": pa.array([], pa.string()),
                    "dst_type": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        src = g["event_type"].to_numpy()[:-1][same_user]
        dst = g["event_type"].to_numpy()[1:][same_user]
        part = (
            pd.DataFrame({"src_type": src, "dst_type": dst})
            .groupby(["src_type", "dst_type"], sort=True)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "src_type": pa.array(part["src_type"], pa.string()),
                "dst_type": pa.array(part["dst_type"], pa.string()),
                "c": pa.array(part["c"].to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["src_type", "dst_type"])
        .sum("c")
        .map_batches(
            lambda b: pa.table(
                {
                    "src_type": b.column("src_type"),
                    "dst_type": b.column("dst_type"),
                    "n": b.column("sum(c)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def q_chunk_counts(sf_dir: str):
    """SlidingWindowChunking over documents → chunks per doc (the chunking
    strategy family's oracle surface: counts are pure token arithmetic)."""
    from ..functions.extraction import SlidingWindowChunking

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    chunker = SlidingWindowChunking(window_size=100, step=50)

    def count(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        n = [len(chunker.chunk(t)) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": ids, "n_chunks": pa.array(n, pa.int64())})

    return docs.map_batches(count, batch_format="pyarrow")


def q_asof_orders(sf_dir: str):
    """As-of join: each event picks the customer's latest order at or
    before the event time (custom operator: union-tag → groupby(entity) →
    per-group vectorized merge_asof)."""
    from ..stages.windows import asof_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    # duplicate (cust, date) rows are resolved inside the asof's
    # per-bucket pass: ascending price tiebreak + merge_asof last-wins ==
    # max(o_totalprice) per (cust, date), replacing the previous
    # groupby().max().materialize() pre-step (~16 s fixed Aggregate cost)
    out = asof_join(
        events,
        orders,
        by_left="user_id",
        by_right="o_custkey",
        ts_left="ts",
        ts_right="o_orderdate",
        right_value_cols=["o_totalprice"],
        right_tiebreak_cols=["o_totalprice"],
    )
    def project(batch: pa.Table) -> pa.Table:
        # union with the tagged right side promoted l_event_id to float
        return pa.table(
            {
                "event_id": batch.column("l_event_id").cast(pa.int64()),
                "best_price": batch.column("o_totalprice"),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_fit_markdown(sf_dir: str):
    """Content-filtered fit_markdown over the corpus (PruningContentFilter).
    Output = (url, n_fit_chars, fit_md5): the md5 pins the full fit text
    byte-for-byte while keeping the oracle row compact. Heuristic scores
    aren't SQL-expressible → oracle = pinned golden
    (scripts/gen_golden_oracles.py)."""
    from ..functions.content_filter import PruningContentFilter, fit_markdown

    pages = _pages_ds(sf_dir, columns=["url", "html"])

    class FitStage:
        def __init__(self):
            self.filt = PruningContentFilter(threshold=0.4)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..html.dom import decode_html

            import hashlib

            urls = batch.column("url").to_pylist()
            out, digests = [], []
            for h in batch.column("html").to_pylist():
                md, _ = fit_markdown(decode_html(h), self.filt)
                out.append(len(md))
                digests.append(hashlib.md5(md.encode("utf-8")).hexdigest())
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "n_fit_chars": pa.array(out, pa.int64()),
                    "fit_md5": pa.array(digests, pa.string()),
                }
            )

    return pages.map_batches(
        FitStage, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    )


def q_sessionize(sf_dir: str):
    """Gap-based session windows per user (30-min gap)."""
    from ..stages.windows import sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return sessionize(events, gap_minutes=30)


def q_events_props(sf_dir: str):
    """JSON property extraction from the events props column (the
    split_and_parse_json_objects capability, vectorized)."""
    import json as _json

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )

    def extract_k(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch.column("props").to_pylist():
            try:
                ks.append(int(_json.loads(p).get("k")))
            except Exception:
                ks.append(None)
        return pa.table(
            {"event_id": batch.column("event_id"), "k": pa.array(ks, pa.int64())}
        )

    return events.map_batches(extract_k, batch_format="pyarrow")


def q_top_orders_per_cust(sf_dir: str):
    """Grouped top-k (the ROW_NUMBER window Ray Data lacks natively):
    top-3 orders per customer by price. Map-side partial top-k per batch,
    then ONE bucketed groupby — stages/agg.py grouped_topk."""
    from ..stages.agg import grouped_topk

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    return grouped_topk(
        orders, key="o_custkey", value="o_totalprice", k=3,
        extra_cols=("o_orderkey",),
    )


def q_orders_per_nation(sf_dir: str):
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    oc = orders.join(
        customer, join_type="inner", num_partitions=8, on=("o_custkey",),
        right_on=("c_custkey",),
    )
    # nation is 25 rows: broadcast it instead of a second JoinOperator —
    # Ray 2.49's join costs ~4 s of actor-pool spin-up PER CALL (NOTES
    # r3), and chaining joins is exactly the shape that breaks on empty
    # shuffle partitions. One native join stays as the API demonstrator;
    # the small side goes map-side like every other broadcast lookup.
    nmap = {
        int(r["n_nationkey"]): r["n_name"] for r in nation.take_all()
    }
    nmap_ref = ray.put(nmap)

    def attach_nation(batch: pa.Table) -> pa.Table:
        nm = ray.get(nmap_ref)
        keys = batch.column("c_nationkey").to_pylist()
        return pa.table(
            {"n_name": pa.array([nm[int(k)] for k in keys], pa.string())}
        )

    ocn = oc.map_batches(attach_nation, batch_format="pyarrow")
    out = ocn.groupby("n_name").count().rename_columns({"count()": "n_orders"})
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_orders"),
            "n_orders",
            b.column("n_orders").cast(pa.int64()),
        ),
        batch_format="pyarrow",
    )


def q_qty_by_flag(sf_dir: str):
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    out = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        ray.data.aggregate.Sum("l_quantity", alias_name="sum_qty"),
        ray.data.aggregate.Count(alias_name="n_rows"),
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_rows"), "n_rows", b.column("n_rows").cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


def q_neardup_resolve(sf_dir: str):
    """END-TO-END near-dup resolution — what a training-data pipeline
    actually runs: minhash-LSH candidates → exact Jaccard verify (the
    minhash_pairs pipeline) → connected components over surviving pairs →
    keep the min doc_id per cluster. Output: every document with its
    cluster id and a keep flag (survivors of the dedup). The oracle
    recomputes the pair set from string grams and resolves clusters with
    a transitive-closure recursive CTE — exact at any cluster diameter,
    unlike an unrolled fixed-iteration replay."""
    from ..stages.graph import connected_components

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    cands = dedup.minhash_lsh_pairs(docs, num_perm=64, bands=16)
    pairs = dedup.verify_pairs(cands, docs, mode="jaccard", tau=0.9)
    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "src": b.column("a").cast(pa.int64()),
                "dst": b.column("b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    comp = connected_components(nodes, edges)

    def project(batch: pa.Table) -> pa.Table:
        node = batch.column("node").cast(pa.int64())
        cl = batch.column("component").cast(pa.int64())
        return pa.table(
            {
                "doc_id": node,
                "cluster": cl,
                "keep": pa.compute.equal(node, cl),
            }
        )

    return comp.map_batches(project, batch_format="pyarrow")


def q_heavy_hitter_hosts(sf_dir: str):
    """Exact heavy hitters (> 5% of pages) over the corpus hosts via the
    two-phase Misra–Gries sketch-then-verify operator (stages/agg.py
    heavy_hitters). The synthetic corpus plants one heavy host (site0,
    ~16%); the other 49 sit at ~1.7% — the sketch must keep exactly the
    planted one and the verify pass must report its exact count."""
    from ..functions.urls import hosts_array
    from ..stages.agg import heavy_hitters

    pages = _pages_ds(sf_dir, columns=["url"])

    def add_host(batch: pa.Table) -> pa.Table:
        return pa.table({"host": hosts_array(batch.column("url"))})

    hosts = pages.map_batches(add_host, batch_format="pyarrow")
    return heavy_hitters(hosts, "host", phi=0.05)


def q_range_events(sf_dir: str):
    """Range (interval) join demonstrator: each event matches every
    same-user event whose trailing 1-hour window contains it
    (r.ts <= l.ts < r.ts + 1h — a self interval join with overlapping
    intervals), then a per-event rollup (n_window, sum_value).
    Exercises the time-chunked interval-join operator (stages/windows.py
    range_join): intervals replicate into overlapped chunks, one
    hash(entity, chunk) groupby, in-group vectorized merge — no
    all-pairs-per-entity blowup for hot users."""
    from ..stages.windows import range_join

    HOUR_US = 3_600_000_000
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    right = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def add_end(batch: pa.Table) -> pa.Table:
        start = batch.column("ts").cast(pa.timestamp("us"))
        end = pa.compute.add(start, pa.scalar(HOUR_US, pa.duration("us")))
        return batch.append_column("w_end", end)

    joined = range_join(
        events,
        right.map_batches(add_end, batch_format="pyarrow"),
        by_left="user_id",
        by_right="user_id",
        ts_left="ts",
        start_right="ts",
        end_right="w_end",
        right_value_cols=["value"],
        chunk_us=HOUR_US,
    )
    agg = joined.groupby("l_event_id").aggregate(
        ray.data.aggregate.Count(alias_name="n_window"),
        ray.data.aggregate.Sum("value", alias_name="sum_value"),
    )

    def project(batch: pa.Table) -> pa.Table:
        # float64 sums: summation order differs from the oracle's, ~1e-12
        # absolute; ROUND(6) on both sides absorbs it. pc.round is up to
        # one ULP off DuckDB's decimal-correct ROUND (322.28000000000003
        # vs 322.28), so round via the decimal string — post-aggregation
        # output only, one tiny pass over the final rows
        vals = [
            None if v is None else float(f"{v:.6f}")
            for v in batch.column("sum_value").to_pylist()
        ]
        return pa.table(
            {
                "event_id": batch.column("l_event_id").cast(pa.int64()),
                "n_window": batch.column("n_window").cast(pa.int64()),
                "sum_value": pa.array(vals, pa.float64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "pages_per_host": q_pages_per_host,
    "top_hosts": q_top_hosts,
    "link_graph_edges": q_link_graph_edges,
    "link_graph_edges_excluded": q_link_graph_edges_excluded,
    "bfs_depth": q_bfs_depth,
    "robots_filter": q_robots_filter,
    "head_filters": q_head_filters,
    "url_seeder": q_url_seeder,
    "url_normalize": q_url_normalize,
    "url_filter_pattern": q_url_filter_pattern,
    "url_scores": q_url_scores,
    "url_nonsense": q_url_nonsense,
    "sitemap_urls": q_sitemap_urls,
    "url_traps": q_url_traps,
    "shuffle_export": q_shuffle_export,
    "crawl_delta": q_crawl_delta,
    "extract_docs": q_extract_docs,
    "exact_dedup": q_exact_dedup,
    "token_stats": q_token_stats,
    "quality_counts": q_quality_counts,
    "quality_filter": q_quality_filter,
    "quality_deciles": q_quality_deciles,
    "repetition_stats": q_repetition_stats,
    "decontaminate": q_decontaminate,
    "decontaminate_bloom": q_decontaminate_bloom,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "corpus_rollup": q_corpus_rollup,
    "url_canonical_groups": q_url_canonical_groups,
    "warc_roundtrip": q_warc_roundtrip,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "pagerank": q_pagerank,
    "hits_scores": q_hits,
    "host_pagerank": q_host_pagerank,
    "personalized_pagerank": q_personalized_pagerank,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pmi_pairs": q_pmi_pairs,
    "logreg_quality": q_logreg_quality,
    "logreg_calibration": q_logreg_calibration,
    "logreg_auc": q_logreg_auc,
    "gopher_rules": q_gopher_rules,
    "c4_rules": q_c4_rules,
    "token_budget_select": q_token_budget_select,
    "dsir_weights": q_dsir_weights,
    "kmeans_embeddings": q_kmeans_embeddings,
    "embedding_norm_outliers": q_embedding_norm_outliers,
    "ann_topk_pq": q_ann_topk_pq,
    "ann_topk_ivfpq": q_ann_topk_ivfpq,
    "ann_recall_ivfpq": q_ann_recall_ivfpq,
    "mmr_rerank": q_mmr_rerank,
    "minhash_index_dedup": q_minhash_index_dedup,
    "semdedup": q_semdedup,
    "neardup_keep": q_neardup_keep,
    "hybrid_rrf": q_hybrid_rrf,
    "host_curation": q_host_curation,
    "anchor_text_agg": q_anchor_text_agg,
    "token_percentiles": q_token_percentiles,
    "snapshot_latest": q_snapshot_latest,
    "distinct_users": q_distinct_users,
    "distinct_users_hll": q_distinct_users_hll,
    "media_decode": q_media_decode,
    "image_dhash_dups": q_image_dhash_dups,
    "audio_fp_dups": q_audio_fp_dups,
    "phrase_search": q_phrase_search,
    "regex_search_trigram": q_regex_search_trigram,
    "mirror_hosts": q_mirror_hosts,
    "leakage_safe_split": q_leakage_safe_split,
    "funnel": q_funnel,
    "retention": q_retention,
    "connected_components": q_connected_components,
    "seed_distances": q_seed_distances,
    "label_communities": q_label_communities,
    "lang_dist": q_lang_dist,
    "content_hash": q_content_hash,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_ivf_scan": q_ann_topk_ivf_scan,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_brute": q_embedding_neardup_brute,
    "minhash_pairs": q_minhash_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "ngram_df_histogram": q_ngram_df_histogram,
    "duplicate_spans": q_duplicate_spans,
    "pack_sequences": q_pack_sequences,
    "pack_manifest": q_pack_manifest,
    "rebalance_mix": q_rebalance_mix,
    "temperature_mix": q_temperature_mix,
    "bpe_merges": q_bpe_merges,
    "bpe_tokenize": q_bpe_tokenize,
    "grouped_sample": q_grouped_sample,
    "term_index_lookup": q_term_index_lookup,
    "line_dedup": q_line_dedup,
    "lm_bucket": q_lm_bucket,
    "webtext_pipeline": q_webtext_pipeline,
    "recrawl_priority": q_recrawl_priority,
    "length_vs_lang_mean": q_length_vs_lang_mean,
    "token_quantiles_sketch": q_token_quantiles_sketch,
    "simhash_pairs": q_simhash_pairs,
    "fingerprints": q_fingerprints,
    "fingerprint_dups": q_fingerprint_dups,
    "lang_id": q_lang_id,
    "redact": q_redact,
    "stratified_sample": q_stratified_sample,
    "dataset_split_counts": q_dataset_split_counts,
    "best_first_order": q_best_first_order,
    "dfs_order": q_dfs_order,
    "politeness_budget": q_politeness_budget,
    "link_preview": q_link_preview,
    "link_preview_filtered": q_link_preview_filtered,
    "adaptive_crawl": q_adaptive_crawl,
    "adaptive_embedding": q_adaptive_embedding,
    "schema_extract": q_schema_extract,
    "regex_extract": q_regex_extract,
    "cosine_sections": q_cosine_sections,
    "top_k_relevant": q_top_k_relevant,
    "bm25_topk": q_bm25_topk,
    "bm25_topk_indexed": q_bm25_topk_indexed,
    "bm25_topk_merged": q_bm25_topk_merged,
    "search_snippets": q_search_snippets,
    "triangles": q_triangles,
    "clustering_coeff": q_clustering_coeff,
    "events_window": q_events_window,
    "events_hopping": q_events_hopping,
    "event_bursts": q_event_bursts,
    "event_transitions": q_event_transitions,
    "text_normalize": q_text_normalize,
    "chunk_counts": q_chunk_counts,
    "asof_orders": q_asof_orders,
    "range_events": q_range_events,
    "heavy_hitter_hosts": q_heavy_hitter_hosts,
    "neardup_resolve": q_neardup_resolve,
    "events_props": q_events_props,
    "sessionize": q_sessionize,
    "fit_markdown": q_fit_markdown,
    "top_orders_per_cust": q_top_orders_per_cust,
    "orders_per_nation": q_orders_per_nation,
    "qty_by_flag": q_qty_by_flag,
}

_STOP_RE = r"\b(the|a|and|of|to|in|is|it|that|for)\b"


def _nonsense_sql_cond(path: str, ul: str) -> str:
    """The is_nonsense_url active rules as a SQL boolean over a lowered
    path expression and a lowered-url expression (shared by the
    url_nonsense and url_seeder oracles — the seeder filters nonsense
    urls by default, SeedingConfig :1676)."""
    return rf"""( regexp_matches({path}, '/(robots\.txt|sitemap\.xml|sitemap_index\.xml)$')
    OR (position('/sitemap' IN {path}) > 0
        AND regexp_matches({path}, '(\.xml|\.xml\.gz|\.txt)$'))
    OR regexp_matches({path},
        '/(ads\.txt|humans\.txt|security\.txt|crossdomain\.xml|browserconfig\.xml|manifest\.json|apple-app-site-association|favicon\.ico|apple-touch-icon\.png|android-chrome-192x192\.png)$')
    OR regexp_matches({path}, '(^|/)\.')
    OR position('/wp-admin' IN {path}) > 0 OR position('/wp-includes' IN {path}) > 0
    OR position('/wp-content/uploads' IN {path}) > 0
    OR position('/admin' IN {path}) > 0 OR position('/login' IN {path}) > 0
    OR position('/signin' IN {path}) > 0 OR position('/signup' IN {path}) > 0
    OR position('/register' IN {path}) > 0 OR position('/checkout' IN {path}) > 0
    OR position('/cart' IN {path}) > 0 OR position('/account' IN {path}) > 0
    OR position('/profile' IN {path}) > 0 OR position('/search' IN {path}) > 0
    OR position('/404' IN {path}) > 0 OR position('/error' IN {path}) > 0
    OR position('/.git' IN {path}) > 0 OR position('/.svn' IN {path}) > 0
    OR position('/.hg' IN {path}) > 0 OR position('/cgi-bin' IN {path}) > 0
    OR position('/scripts' IN {path}) > 0 OR position('/includes' IN {path}) > 0
    OR position('?print=' IN {ul}) > 0 OR position('&print=' IN {ul}) > 0
    OR position('/print/' IN {ul}) > 0 OR position('_print.' IN {ul}) > 0
    OR (length(trim({path}, '/')) < 3
        AND {path} NOT IN ('/', '/en', '/de', '/fr', '/es', '/it')) )"""


def _logreg_sql(
    iters: int = 12,
    lr: str = "2.0",
    pos_weight: str = "6.0",
    final: str = "scores",
) -> str:
    """Unrolled-iteration logistic-GD oracle (stages/logreg.py). Gradient
    sums are fixed-point BIGINTs (order-free, bit-exact); the per-doc
    sigmoid and the per-iteration weight update are the IDENTICAL float
    expression trees the Ray side evaluates (libm exp both sides)."""
    J = range(5)
    z = "(" + " + ".join(f"w.w{j} * x{j}" for j in J) + ")"
    head = f"""f AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
    CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
    CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
    CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS BIGINT) AS n_stop
  FROM documents
),
x AS (
  SELECT doc_id,
    CAST(1.0 AS DOUBLE) AS x0,
    CAST(n_tok AS DOUBLE) / CAST(50.0 AS DOUBLE) AS x1,
    CAST(n_punct AS DOUBLE) / CAST(10.0 AS DOUBLE) AS x2,
    CAST(n_digit AS DOUBLE) / CAST(10.0 AS DOUBLE) AS x3,
    CAST(n_stop AS DOUBLE) / CAST(10.0 AS DOUBLE) AS x4,
    CASE WHEN 10 * n_stop >= n_tok THEN CAST(1.0 AS DOUBLE)
         ELSE CAST(0.0 AS DOUBLE) END AS y
  FROM x0src
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
w0 AS (SELECT {", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in J)})"""
    head = head.replace("FROM x0src", "FROM f")
    parts = [head]
    for k in range(1, iters + 1):
        sums = ",\n    ".join(
            f"CAST(SUM(CAST(floor(((p - y) * wt) * x{j} * 1e9 + CAST(0.5 AS DOUBLE)) "
            f"AS BIGINT)) AS BIGINT) AS g{j}"
            for j in J
        )
        ups = ",\n    ".join(
            f"w.w{j} - CAST({lr} AS DOUBLE) * (CAST(g.g{j} AS DOUBLE) / nn.n) "
            f"* 1e-9 AS w{j}"
            for j in J
        )
        # MATERIALIZED: without it DuckDB inlines each wk into both its
        # consumers and the weight expression tree doubles per iteration
        parts.append(
            f""",
g{k} AS MATERIALIZED (
  SELECT
    {sums}
  FROM (
    SELECT x.*,
           CAST(1.0 AS DOUBLE)
           / (CAST(1.0 AS DOUBLE) + exp(-{z})) AS p,
           CASE WHEN y = CAST(1.0 AS DOUBLE) THEN CAST({pos_weight} AS DOUBLE)
                ELSE CAST(1.0 AS DOUBLE) END AS wt
    FROM x, w{k - 1} w
  )
),
w{k} AS MATERIALIZED (
  SELECT
    {ups}
  FROM w{k - 1} w, g{k} g, nn
)"""
        )
    scored = f"""(
  SELECT x.doc_id, x.y,
         ROUND(CAST(1.0 AS DOUBLE)
               / (CAST(1.0 AS DOUBLE) + exp(-{z})), 8) AS pr
  FROM x, w{iters} w
)"""
    if final == "scores":
        parts.append(
            f"""
SELECT doc_id, pr AS p, (pr >= CAST(0.5 AS DOUBLE)) AS pred
FROM {scored}"""
        )
    elif final == "auc":
        # tie-aware Mann-Whitney rank sum over the round-8 score grid
        # (stages/logreg.py logreg_auc): a tie group of size g after a
        # lower rows contributes np*(2a+g+1) of doubled average rank —
        # the numerator stays an exact BIGINT, ONE division at the end
        parts.append(
            f""",
grp AS (
  SELECT pr, CAST(COUNT(*) AS BIGINT) AS g,
         CAST(SUM(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM {scored} GROUP BY pr
),
ordg AS (
  SELECT g, np,
         CAST(COALESCE(SUM(g) OVER (ORDER BY pr
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS a
  FROM grp
),
tot AS (
  SELECT CAST(SUM(np) AS BIGINT) AS npos, CAST(SUM(g) AS BIGINT) AS ntot
  FROM grp
),
s2 AS (SELECT CAST(SUM(np * (2 * a + g + 1)) AS BIGINT) AS auc2 FROM ordg)
SELECT tot.npos AS n_pos, tot.ntot - tot.npos AS n_neg,
       CASE WHEN tot.npos = 0 OR tot.ntot = tot.npos THEN NULL
            ELSE CAST(s2.auc2 - tot.npos * (tot.npos + 1) AS DOUBLE)
                 / CAST(2 * tot.npos * (tot.ntot - tot.npos) AS DOUBLE)
       END AS auc
FROM s2, tot"""
        )
    else:  # calibration reliability table (stages/logreg.py
        # logreg_calibration): identical doubles → identical bins, exact
        # integer aggregates
        parts.append(
            f"""
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pos,
       CAST(SUM(CAST(round(pr * 1e8) AS BIGINT)) AS BIGINT) AS sum_p_fp
FROM (
  SELECT y, pr,
         LEAST(CAST(floor(pr * 10) AS BIGINT), 9) AS bin
  FROM {scored}
)
GROUP BY bin"""
        )
    return "WITH " + "".join(parts)


def _pagerank_sql(n_iters: int = 5) -> str:
    """Unrolled-iteration PageRank oracle. Floating-point discipline:
    every constant is CAST AS DOUBLE and the per-edge contribution is
    written rank * (1.0/outdeg) — the exact expression the Ray side
    evaluates — so the only divergence is summation order (~1e-19),
    absorbed by the final ROUND to 8 decimals on both sides."""
    head = """nn AS (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS src_id, (2 * doc_id + 1) % nn.c AS dst_id FROM documents, nn
  UNION ALL SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
e AS (SELECT DISTINCT src_id AS src, dst_id AS dst FROM child),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (
  SELECT doc_id AS node, CAST(1.0 AS DOUBLE) / (SELECT c FROM nn) AS rank
  FROM documents
)"""
    parts = [head]
    prev = "r0"
    for k in range(1, n_iters + 1):
        parts.append(
            f""",
r{k} AS (
  SELECT d2.doc_id AS node,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT c FROM nn)
         + CAST(0.85 AS DOUBLE)
           * COALESCE(SUM(p.rank * (CAST(1.0 AS DOUBLE) / deg.outdeg)), 0) AS rank
  FROM documents d2
  LEFT JOIN e ON e.dst = d2.doc_id
  LEFT JOIN deg ON deg.src = e.src
  LEFT JOIN {prev} p ON p.node = e.src
  GROUP BY d2.doc_id
)"""
        )
        prev = f"r{k}"
    return (
        "WITH "
        + "".join(parts)
        + f"\nSELECT node, ROUND(rank, 8) AS rank FROM {prev}"
    )

def _hits_sql(n_iters: int = 4) -> str:
    """Unrolled-iteration HITS oracle. Same float discipline as pagerank
    (CAST every constant AS DOUBLE, mirror the raw-sum-then-divide
    expression, absorb summation-order drift with the final ROUND) plus
    the logreg lesson: every iterative CTE is AS MATERIALIZED, otherwise
    DuckDB inlines each score CTE into both consumers of the next sweep
    and the plan blows up exponentially."""
    head = """WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS src_id, (2 * doc_id + 1) % nn.c AS dst_id FROM documents, nn
  UNION ALL SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
e AS MATERIALIZED (SELECT DISTINCT src_id AS src, dst_id AS dst FROM child),
h0 AS MATERIALIZED (
  SELECT doc_id AS node, CAST(1.0 AS DOUBLE) / (SELECT c FROM nn) AS s
  FROM documents
)"""
    parts = [head]
    prev_h = "h0"
    for k in range(1, n_iters + 1):
        parts.append(
            f""",
a{k}r AS MATERIALIZED (
  SELECT d.doc_id AS node, COALESCE(SUM(h.s), CAST(0.0 AS DOUBLE)) AS s
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN {prev_h} h ON h.node = e.src
  GROUP BY d.doc_id
),
a{k} AS MATERIALIZED (
  SELECT node, s / (SELECT SUM(s) FROM a{k}r) AS s FROM a{k}r
),
h{k}r AS MATERIALIZED (
  SELECT d.doc_id AS node, COALESCE(SUM(a.s), CAST(0.0 AS DOUBLE)) AS s
  FROM documents d
  LEFT JOIN e ON e.src = d.doc_id
  LEFT JOIN a{k} a ON a.node = e.dst
  GROUP BY d.doc_id
),
h{k} AS MATERIALIZED (
  SELECT node, s / (SELECT SUM(s) FROM h{k}r) AS s FROM h{k}r
)"""
        )
        prev_h = f"h{k}"
    return (
        "".join(parts)
        + f"""
SELECT h.node, ROUND(h.s, 8) AS hub, ROUND(a.s, 8) AS auth
FROM h{n_iters} h JOIN a{n_iters} a USING (node)"""
    )


def _ppr_sql(n_iters: int = 5, seeds: tuple = (0, 1, 2)) -> str:
    """Unrolled personalized-PageRank oracle: identical chain to
    _pagerank_sql except teleport mass (init AND per-iteration base) goes
    only to the seed set, 1/|S| each."""
    seed_list = ", ".join(str(s) for s in seeds)
    ns = len(seeds)
    head = f"""nn AS (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS src_id, (2 * doc_id + 1) % nn.c AS dst_id FROM documents, nn
  UNION ALL SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
e AS (SELECT DISTINCT src_id AS src, dst_id AS dst FROM child),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (
  SELECT doc_id AS node,
         CASE WHEN doc_id IN ({seed_list})
              THEN CAST(1.0 AS DOUBLE) / {ns} ELSE CAST(0.0 AS DOUBLE) END AS rank
  FROM documents
)"""
    parts = [head]
    prev = "r0"
    for k in range(1, n_iters + 1):
        parts.append(
            f""",
r{k} AS (
  SELECT d2.doc_id AS node,
         CASE WHEN d2.doc_id IN ({seed_list})
              THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / {ns}
              ELSE CAST(0.0 AS DOUBLE) END
         + CAST(0.85 AS DOUBLE)
           * COALESCE(SUM(p.rank * (CAST(1.0 AS DOUBLE) / deg.outdeg)), 0) AS rank
  FROM documents d2
  LEFT JOIN e ON e.dst = d2.doc_id
  LEFT JOIN deg ON deg.src = e.src
  LEFT JOIN {prev} p ON p.node = e.src
  GROUP BY d2.doc_id
)"""
        )
        prev = f"r{k}"
    return (
        "WITH "
        + "".join(parts)
        + f"\nSELECT node, ROUND(rank, 8) AS rank FROM {prev}"
    )


def _host_pagerank_sql(n_iters: int = 4) -> str:
    """Unrolled weighted host-level PageRank oracle: distinct page edges
    → host contraction (self-loops dropped) → row-stochastic weights via
    a window sum (float(cnt)/float(tot): integer-exact doubles, identical
    to the Ray division) → pagerank iterations, ROUND(8)."""
    head = """WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS src_id, (2 * doc_id + 1) % nn.c AS dst_id FROM documents, nn
  UNION ALL SELECT doc_id, (2 * doc_id + 2) % nn.c FROM documents, nn
  UNION ALL SELECT doc_id, (7 * doc_id + 3) % nn.c FROM documents, nn
),
pe AS (SELECT DISTINCT src_id, dst_id FROM child),
he AS MATERIALIZED (
  SELECT CASE WHEN src_id % 7 = 0 THEN 0 ELSE src_id % 50 END AS src,
         CASE WHEN dst_id % 7 = 0 THEN 0 ELSE dst_id % 50 END AS dst,
         COUNT(*) AS cnt
  FROM pe
  WHERE (CASE WHEN src_id % 7 = 0 THEN 0 ELSE src_id % 50 END)
     <> (CASE WHEN dst_id % 7 = 0 THEN 0 ELSE dst_id % 50 END)
  GROUP BY 1, 2
),
hw AS MATERIALIZED (
  SELECT src, dst,
         CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE) AS w
  FROM he
),
hn AS MATERIALIZED (
  SELECT DISTINCT CASE WHEN doc_id % 7 = 0 THEN 0 ELSE doc_id % 50 END AS node
  FROM documents
),
hc AS MATERIALIZED (SELECT COUNT(*) AS c FROM hn),
r0 AS MATERIALIZED (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT c FROM hc) AS rank FROM hn
)"""
    parts = [head]
    prev = "r0"
    for k in range(1, n_iters + 1):
        parts.append(
            f""",
r{k} AS MATERIALIZED (
  SELECT h.node,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT c FROM hc)
         + CAST(0.85 AS DOUBLE)
           * COALESCE(SUM(p.rank * hw.w), CAST(0.0 AS DOUBLE)) AS rank
  FROM hn h
  LEFT JOIN hw ON hw.dst = h.node
  LEFT JOIN {prev} p ON p.node = hw.src
  GROUP BY h.node
)"""
        )
        prev = f"r{k}"
    return (
        "".join(parts)
        + f"\nSELECT node, ROUND(rank, 8) AS rank FROM {prev}"
    )


ORACLES = {
    "pages_per_host": f"""
WITH {SQL_PAGES}
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages FROM purl GROUP BY host
""",
    "top_hosts": f"""
WITH {SQL_PAGES}
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages FROM purl
GROUP BY host ORDER BY n_pages DESC, host LIMIT 5
""",
    "heavy_hitter_hosts": f"""
WITH {SQL_PAGES}
SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM purl
GROUP BY host
HAVING COUNT(*) > CAST(0.05 AS DOUBLE) * (SELECT COUNT(*) FROM purl)
""",
    "link_graph_edges": f"""
WITH {SQL_PAGES}, {SQL_EDGES}
SELECT src, dst FROM edges
""",
    "link_graph_edges_excluded": f"""
WITH {SQL_PAGES}, {SQL_EDGES}
SELECT src, dst FROM edges
""",
    "bfs_depth": f"""
WITH RECURSIVE {SQL_PAGES}, {SQL_EDGES},
seeds AS (SELECT url FROM purl WHERE doc_id IN (0, 1, 2)),
walk(url, depth) AS (
  SELECT url, 0 FROM seeds
  UNION ALL
  SELECT e.dst, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.url
  WHERE w.depth < 3
)
SELECT url, CAST(MIN(depth) AS BIGINT) AS depth FROM walk GROUP BY url
""",
    "robots_filter": f"""
WITH {SQL_PAGES}
SELECT url,
       CASE WHEN host_id = 0 THEN FALSE
            WHEN host_id = 1 AND CAST(doc_id AS VARCHAR) LIKE '1%' THEN FALSE
            ELSE TRUE END AS allowed
FROM purl
""",
    "head_filters": f"""
WITH {SQL_PAGES}
SELECT url,
       (doc_id % 3 = 0) AS relevant,
       -- the \\d{{4}} url-path penalty drops 4-digit doc_ids below the
       -- threshold (0.493 < 0.5 < 0.523 — verified score gaps)
       (host_id = 0 AND doc_id < 1000) AS seo_ok
FROM purl
""",
    "url_seeder": f"""
WITH {SQL_PAGES},
cand AS (
  SELECT url, doc_id, host, lang FROM purl JOIN documents USING (doc_id)
  WHERE doc_id % 3 = 0
),
pn AS (
  SELECT *,
    lower(regexp_replace(regexp_replace(url, '^[a-z]+://[^/]*', ''), '\\?.*$', '')) AS path,
    lower(url) AS ul
  FROM cand
)
SELECT url,
       'Page ' || doc_id || ' — ' || host AS title,
       'Synthetic page ' || doc_id || ' in lang ' || lang AS description
FROM pn
WHERE NOT {_nonsense_sql_cond("path", "ul")}
""",
    "url_normalize": """
SELECT doc_id,
  CASE doc_id % 3
    WHEN 0 THEN 'https://site' || (doc_id % 50) || '.example.com/Page/' || doc_id || '?a=1&b=2'
    WHEN 1 THEN 'https://site' || (doc_id % 50) || '.example.com/dir/other/page-' || doc_id || '.html'
    ELSE 'https://site' || (doc_id % 50) || '.example.com/a/b//c/' || doc_id
  END AS url_norm
FROM documents
""",
    "url_filter_pattern": f"""
WITH {SQL_PAGES}
SELECT url FROM purl WHERE url LIKE '%.example.com/page/1%'
""",
    "url_scores": """
SELECT doc_id,
  'https://site' || (doc_id % 50) || '.example.com/blog/' || (2015 + doc_id % 10)
    || (CASE WHEN doc_id % 4 = 0 THEN '/extra' ELSE '' END)
    || '/item' || doc_id AS url,
  (CASE WHEN doc_id % 4 = 0 THEN 0.5::DOUBLE ELSE 1.0::DOUBLE END)
  + 0.5::DOUBLE * (CASE 2024 - (2015 + doc_id % 10)
      WHEN 0 THEN 1.0::DOUBLE WHEN 1 THEN 0.9::DOUBLE WHEN 2 THEN 0.8::DOUBLE
      WHEN 3 THEN 0.7::DOUBLE WHEN 4 THEN 0.6::DOUBLE WHEN 5 THEN 0.5::DOUBLE
      WHEN 6 THEN 0.4::DOUBLE
      ELSE greatest(0.1::DOUBLE,
                    1.0::DOUBLE - (2024 - (2015 + doc_id % 10))::DOUBLE * 0.1::DOUBLE)
      END) AS score
FROM documents
""",
    "url_nonsense": rf"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 8
      WHEN 0 THEN base
      WHEN 1 THEN base || '/robots.txt'
      WHEN 2 THEN base || '/sitemap-news.xml'
      WHEN 3 THEN base || '?print=1'
      WHEN 4 THEN base || '/.well-known/security.txt'
      WHEN 5 THEN base || '/wp-admin/options.html'
      WHEN 6 THEN 'https://site' || (doc_id % 50) || '.example.com/a'
      ELSE base || '/humans.txt'
    END AS url
  FROM (SELECT doc_id,
               'https://site' || (doc_id % 50) || '.example.com/page/' || doc_id AS base
        FROM documents)
),
p AS (
  SELECT doc_id, url,
    lower(regexp_replace(regexp_replace(url, '^[a-z]+://[^/]*', ''), '\?.*$', '')) AS path,
    lower(url) AS ul
  FROM u
)
SELECT doc_id, url,
  {_nonsense_sql_cond("path", "ul")} AS nonsense
FROM p
""",
    "shuffle_export": """
WITH k AS (
  SELECT doc_id,
    (CAST(doc_id AS HUGEINT) * 6364136223846793005
     + 1442695040888963407 + 7) % CAST('18446744073709551616' AS HUGEINT) AS key
  FROM documents
)
SELECT doc_id,
  CAST(key % 16 AS BIGINT) AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY key % 16 ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
FROM k
""",
    "crawl_delta": """
WITH prev AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 3
),
curr AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS h
  FROM documents WHERE doc_id % 10 <> 6
)
SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
  CASE WHEN c.doc_id IS NULL THEN 'gone'
       WHEN p.doc_id IS NULL THEN 'new'
       WHEN p.h = c.h THEN 'unchanged'
       ELSE 'changed' END AS status
FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
""",
    "exact_dedup": """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
dup AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + nn.c, text FROM documents, nn
)
SELECT md5(text) AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM dup GROUP BY md5(text)
""",
    "token_stats": r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
    "quality_counts": rf"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
       CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS BIGINT) AS n_stop,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
FROM documents
""",
    "quality_deciles": rf"""
WITH s AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS BIGINT)
           * 1000
           // GREATEST(CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT),
                       1) AS score
  FROM documents
)
SELECT doc_id, score,
       CAST(NTILE(10) OVER (ORDER BY score, doc_id) AS BIGINT) AS decile
FROM s
""",
    "quality_filter": rf"""
WITH c AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
         CAST(length(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digit,
         CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS DOUBLE) AS n_stop
  FROM documents
),
s AS (
  SELECT doc_id,
    (LEAST(GREATEST(n_tok / CAST(100.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
     + LEAST(GREATEST(CAST(1.0 AS DOUBLE) - CAST(5.0 AS DOUBLE) * (n_punct + n_digit) / GREATEST(n_chars, CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
     + LEAST(GREATEST(CAST(5.0 AS DOUBLE) * n_stop / GREATEST(n_tok, CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
    ) / CAST(3.0 AS DOUBLE) AS quality
  FROM c
)
SELECT doc_id, quality, (quality >= CAST(0.5 AS DOUBLE)) AS keep FROM s
""",
    "repetition_stats": r"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS lst FROM documents),
tok AS (SELECT doc_id, unnest(lst) AS tok FROM d),
tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
a1 AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS max_token_count
  FROM tc GROUP BY doc_id
),
bg AS (
  SELECT d.doc_id, lst[i] || ' ' || lst[i + 1] AS big
  FROM d, UNNEST(range(1, len(lst))) AS t(i)
  WHERE len(lst) >= 2
),
bc AS (SELECT doc_id, big, COUNT(*) AS c FROM bg GROUP BY doc_id, big),
a2 AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_bigram_count FROM bc GROUP BY doc_id)
SELECT a1.doc_id, a1.n_tokens, a1.n_distinct, a1.max_token_count,
       CAST(COALESCE(a2.max_bigram_count, 0) AS BIGINT) AS max_bigram_count
FROM a1 LEFT JOIN a2 USING (doc_id)
""",
    "decontaminate": r"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS lst FROM documents),
tg AS (
  SELECT d.doc_id, lst[i] || ' ' || lst[i + 1] || ' ' || lst[i + 2] AS tg
  FROM d, UNNEST(range(1, len(lst) - 1)) AS t(i)
  WHERE len(lst) >= 3
),
bench AS (SELECT DISTINCT tg FROM tg WHERE doc_id % 97 = 0),
hits AS (
  SELECT t.doc_id, COUNT(DISTINCT t.tg) AS n
  FROM tg t JOIN bench b USING (tg) GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated,
       CAST(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM d LEFT JOIN hits h USING (doc_id)
""",
    "pagerank": _pagerank_sql(5),
    "hits_scores": _hits_sql(4),
    "host_pagerank": _host_pagerank_sql(4),
    "personalized_pagerank": _ppr_sql(5, (0, 1, 2)),
    "corpus_rollup": r"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM documents GROUP BY lang, source
UNION ALL
SELECT lang, 'ALL',
       CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
FROM documents GROUP BY lang
UNION ALL
SELECT 'ALL', 'ALL',
       CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
FROM documents
""",
    # normalize_url semantics for these variant families are pinned by the
    # url_normalize oracle: lowercase scheme+host, strip trailing slash,
    # drop tracking params and fragments — so the oracle can write the
    # normalized form directly.
    "url_canonical_groups": r"""
WITH v AS (
  SELECT doc_id,
         'HTTPS://SITE' || (doc_id % 50) || '.EXAMPLE.COM/page/' || doc_id || '/'
         AS raw
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://site' || (doc_id % 50) || '.example.com/page/' || doc_id
           || '?utm_campaign=c&gclid=g'
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id,
         'https://site' || (doc_id % 50) || '.example.com/page/' || doc_id || '#sec'
  FROM documents WHERE doc_id % 3 <> 1
),
n AS (
  SELECT 'https://site' || (doc_id % 50) || '.example.com/page/' || doc_id
           AS url_norm,
         raw
  FROM v
)
SELECT url_norm,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       MIN(raw) AS canonical_raw
FROM n GROUP BY url_norm
""",
    "warc_roundtrip": f"""
WITH {SQL_PAGES}
SELECT url,
       TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
       TRUE AS digest_ok
FROM purl
""",
    "jsonl_roundtrip": """
SELECT doc_id, lang, md5(text) AS text_md5, TRUE AS digest_ok
FROM documents
""",
    "anchor_text_agg": f"""
WITH {SQL_PAGES},
nn AS (SELECT COUNT(*) AS c FROM documents),
raw AS (
  SELECT (2 * doc_id + 1) % nn.c AS dst_id,
         'first link ' || ((2 * doc_id + 1) % nn.c) AS txt
  FROM documents, nn
  UNION ALL
  SELECT (2 * doc_id + 2) % nn.c,
         'second link ' || ((2 * doc_id + 2) % nn.c)
  FROM documents, nn
  UNION ALL
  -- the third anchor style is dropped by the scraper's first-wins dedup
  -- (keyed on the NORMALIZED href) whenever it collides with c1/c2
  SELECT (7 * doc_id + 3) % nn.c,
         'third link ' || ((7 * doc_id + 3) % nn.c)
  FROM documents, nn
  WHERE (7 * doc_id + 3) % nn.c NOT IN
        ((2 * doc_id + 1) % nn.c, (2 * doc_id + 2) % nn.c)
),
atxt AS (
  SELECT u2.url AS dst, raw.txt FROM raw JOIN purl u2 ON u2.doc_id = raw.dst_id
  UNION ALL
  SELECT site AS dst, 'home' FROM purl
  UNION ALL
  SELECT url || '?page=2', 'pagination link' FROM purl WHERE doc_id % 37 = 0
),
dd AS (SELECT DISTINCT dst, txt FROM atxt)
SELECT dst,
       string_agg(txt, '|' ORDER BY txt) AS anchors,
       CAST(COUNT(*) AS BIGINT) AS n_anchors
FROM dd GROUP BY dst
""",
    "seed_distances": _seed_distances_sql(),
    "label_communities": _label_prop_sql(),
    "connected_components": """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 0 ELSE doc_id % 50 END AS host_id
  FROM documents
)
SELECT doc_id AS node,
       CAST(MIN(doc_id) OVER (PARTITION BY host_id) AS BIGINT) AS component
FROM p
""",
    "text_normalize": r"""
WITH messy AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' mid' || chr(7) || 'dle' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || chr(10) || chr(10) || chr(10) || 'z'
                 ELSE '' END
         || ' Cafe' || chr(769) || chr(9) || ' tail  ' AS m
  FROM documents
),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(regexp_replace(
           nfc_normalize(m),
           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
           '[ \t]+', ' ', 'g'),
           '\n{3,}', chr(10) || chr(10), 'g'), ' ' || chr(10)) AS text_norm
  FROM messy
)
SELECT doc_id, text_norm, CAST(length(text_norm) AS BIGINT) AS n_chars
FROM norm
""",
    "event_transitions": """
WITH nxt AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS dst_type
  FROM events
)
SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n
FROM nxt WHERE dst_type IS NOT NULL
GROUP BY src_type, dst_type
""",
    "event_bursts": """
WITH counts AS MATERIALIZED (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, hour
),
m AS MATERIALIZED (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM counts GROUP BY event_type
),
z AS (
  SELECT counts.event_type, counts.hour, counts.c AS n_events,
         CASE WHEN m.n * m.s2 - m.s1 * m.s1 > 0
              THEN CAST(counts.c * m.n - m.s1 AS DOUBLE)
                   / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
              ELSE CAST(0 AS DOUBLE) END AS zscore
  FROM counts JOIN m USING (event_type)
)
SELECT event_type, hour, n_events, zscore,
       abs(zscore) > CAST(2 AS DOUBLE) AS is_burst
FROM z
""",
    "retention": """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, ud.day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN first f USING (user_id)
WHERE date_diff('day', f.cohort_day, ud.day) <= 7
GROUP BY f.cohort_day, day_offset
""",
    "funnel": """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS ts FROM events e
  JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.ts
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS ts FROM events e
  JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS stage, CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_users
UNION ALL
SELECT CAST(2 AS BIGINT), CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
UNION ALL
SELECT CAST(3 AS BIGINT), CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
""",
    "distinct_users": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
""",
    "snapshot_latest": """
WITH snaps AS (
  SELECT doc_id, doc_id AS capture_ts, CAST(1 AS BIGINT) AS rev FROM documents
  UNION ALL
  SELECT doc_id, doc_id + 1000, CAST(2 AS BIGINT) FROM documents WHERE doc_id % 3 = 0
),
ranked AS (
  SELECT doc_id, rev, capture_ts,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY capture_ts DESC, rev
         ) AS rn
  FROM snaps
)
SELECT doc_id, rev, CAST(capture_ts AS BIGINT) AS capture_ts
FROM ranked WHERE rn = 1
""",
    "token_percentiles": r"""
WITH t AS (
  SELECT CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS v FROM documents
)
SELECT CAST(0.5 AS DOUBLE) AS pct, CAST(quantile_disc(v, 0.5) AS BIGINT) AS value FROM t
UNION ALL
SELECT CAST(0.9 AS DOUBLE), CAST(quantile_disc(v, 0.9) AS BIGINT) FROM t
UNION ALL
SELECT CAST(0.95 AS DOUBLE), CAST(quantile_disc(v, 0.95) AS BIGINT) FROM t
UNION ALL
SELECT CAST(0.99 AS DOUBLE), CAST(quantile_disc(v, 0.99) AS BIGINT) FROM t
""",
    "tfidf_top_terms": r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         CAST(tf.tf AS DOUBLE) * ln((SELECT c FROM nn) / df.df) AS score
  FROM tf JOIN df USING (tok)
),
ranked AS (
  SELECT doc_id, tok, score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, tok
         ) AS rnk
  FROM scored
)
SELECT doc_id, tok AS term, CAST(rnk AS BIGINT) AS rank, ROUND(score, 8) AS score
FROM ranked WHERE rnk <= 3
""",
    "logreg_quality": _logreg_sql(12),
    "logreg_calibration": _logreg_sql(12, final="calibration"),
    "logreg_auc": _logreg_sql(12, final="auc"),
    "dsir_weights": r"""
WITH d AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         regexp_extract_all(lower(text), '[a-z]+') AS toks
  FROM documents
),
tok AS (SELECT doc_id, is_target, unnest(toks) AS tok FROM d),
b AS (
  SELECT doc_id, is_target,
         CAST(md5_number_lower(tok) % 1024 AS BIGINT) AS bucket
  FROM tok
),
cnt AS (
  SELECT bucket,
    CAST(COUNT(*) AS BIGINT) AS n_all,
    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS n_t
  FROM b GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(n_all) AS BIGINT) AS a_tot, CAST(SUM(n_t) AS BIGINT) AS t_tot
  FROM cnt
),
r AS (
  SELECT bucket,
    CAST(floor(
      ln(((CAST(n_t AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(t_tot + 1024 AS DOUBLE))
       / ((CAST(n_all AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(a_tot + 1024 AS DOUBLE)))
      * CAST(1000000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rfp
  FROM cnt, tot
),
dc AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM b GROUP BY doc_id, bucket
),
w AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feat,
         CAST(SUM(c * rfp) AS BIGINT) AS logw_fp
  FROM dc JOIN r USING (bucket) GROUP BY doc_id
)
SELECT d2.doc_id,
  COALESCE(w.n_feat, 0) AS n_feat,
  COALESCE(w.logw_fp, 0) AS logw_fp,
  d2.is_target
FROM (SELECT doc_id, (lang = 'en') AS is_target FROM documents) d2
LEFT JOIN w USING (doc_id)
""",
    "token_budget_select": rf"""
WITH c AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
         CAST(length(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digit,
         CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS DOUBLE) AS n_stop
  FROM documents
),
s AS (
  SELECT doc_id,
    (LEAST(GREATEST(n_tok / CAST(100.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
     + LEAST(GREATEST(CAST(1.0 AS DOUBLE) - CAST(5.0 AS DOUBLE) * (n_punct + n_digit) / GREATEST(n_chars, CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
     + LEAST(GREATEST(CAST(5.0 AS DOUBLE) * n_stop / GREATEST(n_tok, CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
    ) / CAST(3.0 AS DOUBLE) AS quality,
    CAST(n_tok AS BIGINT) AS n_tok
  FROM c
),
w AS (
  SELECT doc_id, quality, n_tok,
    CAST(SUM(n_tok) OVER (ORDER BY quality DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
  FROM s
)
SELECT doc_id, quality, n_tok, cum_tok FROM w WHERE cum_tok <= 12000
""",
    "c4_rules": r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS arr,
         3 + doc_id % 5 AS k
  FROM documents
),
ln AS (
  SELECT doc_id, gs AS li,
    array_to_string(arr[((gs-1)*k + 1):(gs*k)], ' ')
    || CASE WHEN (doc_id + gs) % 13 = 0 THEN ' javascript' ELSE '' END
    || CASE (doc_id + gs) % 4 WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?' ELSE '' END AS line
  FROM t, UNNEST(generate_series(1, (len(arr) + k - 1) // k)) s(gs)
),
doc AS (
  SELECT d.doc_id,
    string_agg(ln.line, chr(10) ORDER BY ln.li)
    || CASE WHEN d.doc_id % 41 = 0 THEN ' lorem ipsum' ELSE '' END
    || CASE WHEN d.doc_id % 43 = 0 THEN ' {' ELSE '' END
    || CASE WHEN d.doc_id % 37 = 0 THEN ' badword' ELSE '' END AS s
  FROM (SELECT DISTINCT doc_id FROM t) d JOIN ln ON ln.doc_id = d.doc_id
  GROUP BY d.doc_id
),
r AS (
  SELECT doc_id, s, string_split(s, chr(10)) AS ls,
    list_filter(string_split(s, chr(10)),
      l -> regexp_matches(rtrim(l), '[.!?"]$')
           AND len(regexp_extract_all(l, '\S+')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM doc
),
f AS (
  SELECT doc_id, s, len(ls) AS n_lines, len(kept) AS n_kept,
    COALESCE(array_to_string(kept, chr(10)), '') AS retained
  FROM r
)
SELECT doc_id,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_kept AS BIGINT) AS n_kept_lines,
  CAST(len(regexp_extract_all(retained, '[.!?]')) AS BIGINT) AS n_sentences,
  list_has_any(regexp_extract_all(lower(s), '[a-z]+'), ['badword']) AS has_bad_word,
  contains(lower(s), 'lorem ipsum') AS has_lorem,
  contains(s, '{') AS has_brace,
  (n_kept >= 1 AND len(regexp_extract_all(retained, '[.!?]')) >= 3
   AND NOT list_has_any(regexp_extract_all(lower(s), '[a-z]+'), ['badword'])
   AND NOT contains(lower(s), 'lorem ipsum')
   AND NOT contains(s, '{')) AS keep,
  CAST(length(retained) AS BIGINT) AS clean_chars
FROM f
""",
    "gopher_rules": r"""
WITH base AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS arr FROM documents
),
m AS (
  SELECT doc_id,
    len(arr) AS n,
    length(regexp_replace(text, '\s+', '', 'g')) AS chars,
    (length(text) - length(replace(text, '#', '')))
      + (length(text) - length(replace(text, '...', ''))) // 3 AS syms,
    len(list_filter(arr, w -> regexp_matches(w, '\p{L}'))) AS alpha,
    (CASE WHEN list_contains(arr, 'the') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'be') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'to') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'of') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'and') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'that') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'have') THEN 1 ELSE 0 END
     + CASE WHEN list_contains(arr, 'with') THEN 1 ELSE 0 END) AS stops
  FROM base
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_words,
  (n BETWEEN 50 AND 100000) AS ok_word_count,
  (n > 0 AND 3 * n <= chars AND chars <= 10 * n) AS ok_mean_len,
  (10 * syms <= n) AS ok_symbol,
  (5 * alpha >= 4 * n) AS ok_alpha,
  (stops >= 1) AS ok_stop,
  ((n BETWEEN 50 AND 100000) AND (n > 0 AND 3 * n <= chars AND chars <= 10 * n)
   AND (10 * syms <= n) AND (5 * alpha >= 4 * n) AND (stops >= 1)) AS keep
FROM m
""",
    "host_curation": rf"""
WITH {SQL_PAGES},
toks AS (
  SELECT doc_id, CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
  FROM documents
),
j AS (SELECT p.doc_id, p.host, t.n_tok FROM purl p JOIN toks t USING (doc_id)),
h AS (SELECT host, SUM(n_tok) AS s, COUNT(*) AS c FROM j GROUP BY host)
SELECT j.doc_id, j.host,
  CAST(h.c AS BIGINT) AS host_n_docs,
  (h.c >= 8 AND h.s >= 52 * h.c) AS host_keep
FROM j JOIN h USING (host)
""",
    "pmi_pairs": r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS arr FROM documents),
pos AS (
  SELECT doc_id, gs AS i, arr[gs] AS tok
  FROM t, UNNEST(generate_series(1, len(arr))) AS s(gs)
),
pairs AS (
  SELECT p1.tok AS x, p2.tok AS y, COUNT(*) AS n_xy
  FROM pos p1
  JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.i > p1.i AND p2.i <= p1.i + 3
  GROUP BY p1.tok, p2.tok
),
l AS (SELECT x, SUM(n_xy) AS lx FROM pairs GROUP BY x),
r AS (SELECT y, SUM(n_xy) AS ry FROM pairs GROUP BY y),
tot AS (SELECT SUM(n_xy) AS p FROM pairs)
SELECT x, y, CAST(n_xy AS BIGINT) AS n_xy,
  ROUND(ln((CAST(n_xy AS DOUBLE) * CAST((SELECT p FROM tot) AS DOUBLE))
           / (CAST(lx AS DOUBLE) * CAST(ry AS DOUBLE))), 8) AS pmi
FROM pairs JOIN l USING (x) JOIN r USING (y)
WHERE n_xy >= 5
""",
    "lang_dist": """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
""",
    "content_hash": """
SELECT doc_id, md5(text) AS content_hash FROM documents
""",
    "ann_topk": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id
         ) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 10
""",
    "embedding_neardup_brute": """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3
""",
    "embedding_neardup": """
WITH nn AS (SELECT COUNT(*) AS c FROM embeddings),
dup AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + nn.c, embedding FROM embeddings, nn
)
SELECT a.vec_id AS a, b.vec_id AS b
FROM dup a CROSS JOIN dup b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.9
""",
    "minhash_pairs": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ) AS g
  FROM toks
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE)
      >= 0.9
""",
    # cross-side exact 3-gram Jaccard at 0.9 between the corpus and the
    # derived "new batch" (every 31st doc minus its first token, id + 1e6);
    # the LSH index prunes candidates, verify_pairs makes the result exact,
    # so the oracle recomputes the metric directly (miss prob ≤ 3e-8/pair
    # at J = 0.9 with 16 bands × 4 rows, vanishing above it).
    "minhash_index_dedup": r"""
WITH ctoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
ntoks AS (
  SELECT doc_id + 1000000 AS doc_id, t[2:len(t)] AS t
  FROM ctoks WHERE doc_id % 31 = 0
),
cgrams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN generate_series(1, len(t) - 2)]
      END AS gl
    FROM ctoks WHERE len(t) > 0
  ), UNNEST(gl) AS u(g)
),
ngrams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN generate_series(1, len(t) - 2)]
      END AS gl
    FROM ntoks WHERE len(t) > 0
  ), UNNEST(gl) AS u(g)
),
csz AS (SELECT doc_id, COUNT(*) AS sz FROM cgrams GROUP BY doc_id),
nsz AS (SELECT doc_id, COUNT(*) AS sz FROM ngrams GROUP BY doc_id),
inter AS (
  SELECT cg.doc_id AS a, ng.doc_id AS b, COUNT(*) AS i
  FROM cgrams cg JOIN ngrams ng ON cg.g = ng.g
  GROUP BY 1, 2
)
SELECT i.a, i.b
FROM inter i
JOIN csz ON csz.doc_id = i.a
JOIN nsz ON nsz.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / (csz.sz + nsz.sz - i.i) >= CAST(0.9 AS DOUBLE)
""",
    "neardup_resolve": r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         ) AS g
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE)
        >= 0.9
),
und AS (SELECT a AS s, b AS t FROM pairs UNION SELECT b, a FROM pairs),
reach(s, t) AS (
  SELECT s, t FROM und
  UNION
  SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s
),
comp AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.t), d.doc_id)) AS cluster
  FROM documents d LEFT JOIN reach r ON r.s = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, cluster, (doc_id = cluster) AS keep FROM comp
""",
    "redact": r"""
SELECT doc_id,
       regexp_replace(text, '\b(spark|dup)\b', '[KW]', 'g') AS text_redacted,
       CAST(len(regexp_extract_all(text, '\b(spark|dup)\b')) AS BIGINT)
         AS n_redacted
FROM documents
""",
    # knuth-hash bucket arithmetic is int64-exact on both engines
    "stratified_sample": """
SELECT doc_id, lang FROM documents
WHERE (doc_id * 2654435761 + 12345) % 1000000007 % 10000 <
      CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                WHEN 'fr' THEN 2500 ELSE 1000 END
""",
    "dataset_split_counts": """
WITH b AS (
  SELECT lang,
         (doc_id * 2654435761 + 12345) % 1000000007 % 10000 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 1000 THEN 'val'
            WHEN bucket < 2000 THEN 'test'
            ELSE 'train' END AS split,
       lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM b GROUP BY 1, 2
""",
    # postings-based formulation (mirrors the Ray plan: explode distinct
    # grams, count shared grams per pair, Jaccard from sizes) — same metric
    # as the minhash oracle's pairwise form, independently expressed
    "ngram_jaccard_pairs": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN generate_series(1, len(t) - 2)]
      END AS gl
    FROM toks WHERE len(t) > 0
  ), UNNEST(gl) AS u(g)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS i
  FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.i >= 0.9 * (sa.sz + sb.sz - i.i)
""",
    "duplicate_spans": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
wins AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS g
  FROM toks, LATERAL UNNEST(generate_series(1, len(t) - 4)) AS s(i)
  WHERE len(t) >= 5
),
dupg AS (
  SELECT g FROM (SELECT DISTINCT doc_id, g FROM wins)
  GROUP BY g HAVING COUNT(*) >= 2
),
dupw AS (SELECT w.doc_id, w.pos FROM wins w JOIN dupg USING (g)),
brks AS (
  SELECT doc_id, pos,
         CASE WHEN pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 5
                OR LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM dupw
),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brks
)
SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + 5 AS end_tok
FROM isl GROUP BY doc_id, island
""",
    "length_vs_lang_mean": r"""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tok
  FROM documents
),
st AS (
  SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY lang
)
SELECT t.doc_id, t.lang, CAST(t.n_tok AS BIGINT) AS n_tok,
       CAST(t.n_tok * st.cnt AS DOUBLE) / CAST(st.sum_tok AS DOUBLE) AS len_ratio
FROM toks t JOIN st USING (lang)
""",
    "recrawl_priority": r"""
WITH revs AS (
  SELECT doc_id, r.rev,
         (CASE WHEN (doc_id + 2) % 4 = 0 AND r.rev > 1 THEN 1 ELSE 0 END
        + CASE WHEN (doc_id + 4) % 4 = 0 AND r.rev > 2 THEN 1 ELSE 0 END
        + CASE WHEN (doc_id + 6) % 4 = 0 AND r.rev > 3 THEN 1 ELSE 0 END) AS ver
  FROM documents, LATERAL UNNEST(generate_series(1, 4)) AS r(rev)
),
d AS (
  SELECT doc_id, COUNT(DISTINCT ver) AS n_distinct, COUNT(*) AS n_revs
  FROM revs GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_revs AS BIGINT) AS n_revs,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       (CAST(n_distinct AS DOUBLE) - CAST(1.0 AS DOUBLE))
         / (CAST(n_revs AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS change_rate,
       CAST(86400 * n_revs // (n_distinct * 4) AS BIGINT) AS revisit_interval_s
FROM d
""",
    "term_index_lookup": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
),
tf AS (
  SELECT doc_id,
         CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tf
  FROM toks
)
SELECT doc_id, tf FROM tf WHERE tf > 0
""",
    "grouped_sample": r"""
WITH b AS (
  SELECT doc_id, lang,
         ((doc_id * 2654435761 + 12345) % 1000000007) % 10000 AS bkt
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bkt, doc_id) AS rk
  FROM b
)
SELECT lang, doc_id, CAST(rk AS BIGINT) AS sample_rank
FROM r WHERE rk <= 5
""",
    "rebalance_mix": r"""
WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
cuts AS (
  SELECT lang,
         LEAST(10000,
           (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                      WHEN 'fr' THEN 2000 WHEN 'es' THEN 1000
                      ELSE 0 END * 250) // c) AS cut
  FROM cnt
)
SELECT d.doc_id, d.lang
FROM documents d JOIN cuts USING (lang)
WHERE ((d.doc_id * 2654435761 + 12345) % 1000000007) % 10000 < cuts.cut
""",
    "pack_sequences": r"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n
  FROM documents
),
nz AS (SELECT doc_id, n FROM toks WHERE n > 0),
cum AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM nz
)
SELECT doc_id, n AS n_tok, tok_start,
       CAST(tok_start // 128 AS BIGINT) AS seq_start,
       CAST((tok_start + n - 1) // 128 AS BIGINT) AS seq_end,
       CAST(tok_start % 128 AS BIGINT) AS seq_offset,
       CAST(128 AS BIGINT) AS seq_len
FROM cum
""",
    "pack_manifest": r"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n
  FROM documents
),
nz AS (SELECT doc_id, n FROM toks WHERE n > 0),
cum AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM nz
),
spans AS (
  SELECT doc_id, n, tok_start,
         CAST(tok_start // 128 AS BIGINT) AS seq_start,
         CAST((tok_start + n - 1) // 128 AS BIGINT) AS seq_end
  FROM cum
),
touch AS (
  SELECT s.doc_id, q.seq_id,
         LEAST(s.tok_start + s.n, (q.seq_id + 1) * 128)
         - GREATEST(s.tok_start, q.seq_id * 128) AS fill
  FROM spans s,
       LATERAL UNNEST(generate_series(s.seq_start, s.seq_end)) AS q(seq_id)
)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(fill) AS BIGINT) AS n_filled
FROM touch GROUP BY seq_id
""",
    "ngram_df_histogram": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN generate_series(1, len(t) - 2)]
      END AS gl
    FROM toks WHERE len(t) > 0
  ), UNNEST(gl) AS u(g)
),
df AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g)
SELECT c AS doc_freq, CAST(COUNT(*) AS BIGINT) AS n_grams
FROM df GROUP BY c
""",
    "leakage_safe_split": """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
dup AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + nn.c, text FROM documents, nn
),
comp AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS component
  FROM dup
)
SELECT doc_id, CAST(component AS BIGINT) AS component,
       CASE WHEN component % 10 < 8 THEN 'train' ELSE 'eval' END AS split
FROM comp
""",
    "mirror_hosts": """
WITH ch AS (
  SELECT DISTINCT doc_id % 77 AS content_id, doc_id % 50 AS host
  FROM documents
),
p AS (
  SELECT a.host AS host_a, b.host AS host_b
  FROM ch a JOIN ch b
    ON a.content_id = b.content_id AND a.host < b.host
)
SELECT host_a, host_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM p GROUP BY host_a, host_b
HAVING COUNT(*) >= 3
""",
    "regex_search_trigram": r"""
WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), 'batch [a-z]+ window'))
              AS BIGINT) AS n_matches
  FROM documents
)
SELECT doc_id, n_matches FROM m WHERE n_matches > 0
""",
    "phrase_search": r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS lst FROM documents
),
m AS (
  SELECT d.doc_id, i
  FROM d, UNNEST(range(1, len(lst))) AS t(i)
  WHERE lst[i] = 'order' AND lst[i + 1] = 'line'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(i) - 1 AS BIGINT) AS first_pos
FROM m GROUP BY doc_id
""",
    "audio_fp_dups": """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 2 THEN doc_id - 1 ELSE doc_id END AS b
  FROM documents
),
s AS MATERIALIZED (
  SELECT doc_id, t,
         CASE WHEN doc_id % 50 = 2 AND t = 7
              THEN ((m + 1) % 4096) - 2048
              ELSE m - 2048 END AS v
  FROM (
    SELECT base.doc_id, t.t AS t,
           (((base.b * 2654435761 + t.t * 97003) % 1000003)
            * ((base.b * 2654435761 + t.t * 97003) % 1000003))
             % 1000003 % 4096 AS m
    FROM base, range(1024) t(t)
  )
),
e AS MATERIALIZED (
  SELECT doc_id, t // 512 AS n, (t % 512) // 15 AS m,
         CAST(SUM(v * v) AS BIGINT) AS en
  FROM s WHERE t % 512 < 495
  GROUP BY 1, 2, 3
),
bits AS MATERIALIZED (
  SELECT a.doc_id, CAST(a.n * 32 + a.m AS INTEGER) AS k,
         CASE WHEN a.en > b.en THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.n = a.n AND b.m = a.m + 1
  WHERE a.m < 32
),
h AS MATERIALIZED (
  SELECT doc_id,
         bit_or(CASE WHEN k < 32 THEN CAST(bit AS BIGINT) << k
                     ELSE CAST(0 AS BIGINT) END) AS lo,
         bit_or(CASE WHEN k >= 32 THEN CAST(bit AS BIGINT) << (k - 32)
                     ELSE CAST(0 AS BIGINT) END) AS hi
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 4
""",
    "image_dhash_dups": """
WITH g AS MATERIALIZED (
  SELECT doc_id, r, c,
         CASE WHEN doc_id % 50 = 1 AND r = 0 AND c = 0
              THEN (((x * x) % 1000003) % 251 + 1) % 251
              ELSE ((x * x) % 1000003) % 251 END AS v
  FROM (
    SELECT d.doc_id, t_r.r, t_c.c,
           (CASE WHEN d.doc_id % 50 = 1 THEN d.doc_id - 1 ELSE d.doc_id END
              * 2654435761 + t_r.r * 40503 + t_c.c * 69427) % 1000003 AS x
    FROM documents d, range(8) t_r(r), range(9) t_c(c)
  )
),
bits AS MATERIALIZED (
  SELECT a.doc_id, CAST(a.r * 8 + a.c AS INTEGER) AS k,
         CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8
),
h AS MATERIALIZED (
  SELECT doc_id,
         bit_or(CASE WHEN k < 32 THEN CAST(bit AS BIGINT) << k
                     ELSE CAST(0 AS BIGINT) END) AS lo,
         bit_or(CASE WHEN k >= 32 THEN CAST(bit AS BIGINT) << (k - 32)
                     ELSE CAST(0 AS BIGINT) END) AS hi
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 2
""",
    "simhash_pairs": """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
dup AS (
  SELECT doc_id AS id, md5(text) AS h FROM documents
  UNION ALL
  SELECT doc_id + nn.c, md5(text) FROM documents, nn
)
SELECT a.id AS a, b.id AS b
FROM dup a JOIN dup b ON a.h = b.h AND a.id < b.id
""",
    "fingerprint_dups": """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
dup AS (
  SELECT doc_id AS id, md5(text) AS h FROM documents
  UNION ALL
  SELECT doc_id + nn.c, md5(text) FROM documents, nn
)
SELECT a.id AS a, b.id AS b
FROM dup a JOIN dup b ON a.h = b.h AND a.id < b.id
""",
    "extract_docs": f"""
WITH {SQL_PAGES}
SELECT url, TRUE AS success,
       CAST(6 + CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END AS INT) AS n_links,
       CAST(1 + CASE WHEN doc_id % 9 = 0 THEN 3 ELSE 0 END AS INT) AS n_images
FROM purl
""",
    "ann_topk_ivf_scan": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id
         ) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 10
""",
    "ann_topk_ivf": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id
         ) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 10
""",
    "lang_id": r"""
WITH c AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|for|with)\b')) AS c_en,
    len(regexp_extract_all(lower(text), '\b(le|la|les|de|des|et|est|que|une|pour)\b')) AS c_fr,
    len(regexp_extract_all(lower(text), '\b(el|la|los|de|que|y|es|en|una|por)\b')) AS c_es,
    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|den|mit|für|ein)\b')) AS c_de,
    len(regexp_extract_all(lower(text), '\b(il|la|di|che|e|per|una|sono|con|del)\b')) AS c_it
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(c_en, c_fr, c_es, c_de, c_it) = 0 THEN 'unknown'
       WHEN c_en >= c_fr AND c_en >= c_es AND c_en >= c_de AND c_en >= c_it THEN 'en'
       WHEN c_fr >= c_es AND c_fr >= c_de AND c_fr >= c_it THEN 'fr'
       WHEN c_es >= c_de AND c_es >= c_it THEN 'es'
       WHEN c_de >= c_it THEN 'de'
       ELSE 'it' END AS lang_pred
FROM c
""",
    # best_first_order / politeness_budget: full wave-loop simulations as
    # recursive CTEs carrying (visited, pending, output) as list-typed state
    # — one row per wave. The corpus link graph is pure doc_id arithmetic
    # (sources/pages.py), so fetch, discovery, scoring (keyword-substring),
    # and the positional per-host politeness cap are all scalar SQL.
    # (DuckDB 1.0 quirk: a cross join breaks lambda binding, so N rides in
    # the recursion state instead of a joined CTE.)
    "dfs_order": r"""
WITH RECURSIVE
sim(wave, crawled, n, visited, pending, outp) AS (
  SELECT 0, 0, (SELECT COUNT(*) FROM documents),
         ['https://site0.example.com/page/0'],
         [{'nd': 0, 'u': 'https://site0.example.com/page/0', 'd': 0}],
         CAST([] AS STRUCT(u VARCHAR, w INTEGER)[])
  UNION ALL
  SELECT s.wave + 1,
         s.crawled + len(s.fetched),
         s.n,
         s.visited || s.newu,
         list_slice(s.sp, s.budget + 1, len(s.sp))
           || list_transform(s.newu, u -> {
                'nd': -list_aggregate(list_transform(list_filter(s.cands, c -> c.u = u), c -> c.d), 'min'),
                'u': u,
                'd': list_aggregate(list_transform(list_filter(s.cands, c -> c.u = u), c -> c.d), 'min')}),
         s.outp || list_transform(list_slice(s.sp, 1, s.budget), x -> {'u': x.u, 'w': s.wave})
  FROM (
    SELECT wave, crawled, n, visited, outp, sp, budget, fetched, cands,
           list_distinct(list_transform(cands, c -> c.u)) AS newu
    FROM (
      SELECT wave, crawled, n, visited, outp, sp, budget, fetched,
             list_filter(
               flatten(list_transform(list_filter(fetched, x -> x.d < 2), x ->
                 list_concat(
                   [{'u': 'https://site' || regexp_extract(x.u, 'site(\d+)', 1) || '.example.com',
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n) % 7 = 0 THEN 0
                                ELSE ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n) % 50 END)
                          || '.example.com/page/' || ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n),
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n) % 7 = 0 THEN 0
                                ELSE ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n) % 50 END)
                          || '.example.com/page/' || ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n),
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n) % 7 = 0 THEN 0
                                ELSE ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n) % 50 END)
                          || '.example.com/page/' || ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n),
                     'd': x.d + 1}],
                   CASE WHEN CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT) % 37 = 0
                        THEN [{'u': x.u || '?page=2', 'd': x.d + 1}]
                        ELSE CAST([] AS STRUCT(u VARCHAR, d INTEGER)[]) END))),
               c -> NOT list_contains(visited, c.u)) AS cands
      FROM (
        SELECT wave, crawled, n, visited, outp, sp,
               least(30 - crawled, len(sp)) AS budget,
               list_filter(list_slice(sp, 1, least(30 - crawled, len(sp))),
                           x -> regexp_matches(x.u, '^https://site\d+\.example\.com/page/\d+$')) AS fetched
        FROM (
          SELECT wave, crawled, n, visited, outp, list_sort(pending) AS sp
          FROM sim
          WHERE len(pending) > 0 AND crawled < 30
        )
      )
    )
  ) s
),
last AS (SELECT outp FROM sim ORDER BY wave DESC LIMIT 1),
flat AS (SELECT unnest(outp) AS r FROM last)
SELECT r.u AS url, CAST(r.w AS BIGINT) AS wave FROM flat
""",
    "best_first_order": r"""
WITH RECURSIVE
sim(wave, crawled, n, visited, pending, outp) AS (
  SELECT 0, 0, (SELECT COUNT(*) FROM documents),
         ['https://site0.example.com/page/0'],
         [{'ns': -0.0, 'd': 0, 'u': 'https://site0.example.com/page/0'}],
         CAST([] AS STRUCT(u VARCHAR, w INTEGER)[])
  UNION ALL
  SELECT s.wave + 1,
         s.crawled + len(s.fetched),
         s.n,
         s.visited || s.newu,
         list_slice(s.sp, s.budget + 1, len(s.sp))
           || list_transform(s.newu, u -> {
                'ns': -((CASE WHEN contains(lower(u), 'page/1') THEN 0.5 ELSE 0.0 END)
                       + (CASE WHEN contains(lower(u), 'page/2') THEN 0.5 ELSE 0.0 END)),
                'd': list_aggregate(list_transform(list_filter(s.cands, c -> c.u = u), c -> c.d), 'min'),
                'u': u}),
         s.outp || list_transform(list_slice(s.sp, 1, s.budget), x -> {'u': x.u, 'w': s.wave})
  FROM (
    SELECT wave, crawled, n, visited, outp, sp, budget, fetched, cands,
           list_distinct(list_transform(cands, c -> c.u)) AS newu
    FROM (
      SELECT wave, crawled, n, visited, outp, sp, budget, fetched,
             list_filter(
               flatten(list_transform(list_filter(fetched, x -> x.d < 2), x ->
                 list_concat(
                   [{'u': 'https://site' || regexp_extract(x.u, 'site(\d+)', 1) || '.example.com',
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n) % 7 = 0 THEN 0
                                ELSE ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n) % 50 END)
                          || '.example.com/page/' || ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n),
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n) % 7 = 0 THEN 0
                                ELSE ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n) % 50 END)
                          || '.example.com/page/' || ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n),
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n) % 7 = 0 THEN 0
                                ELSE ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n) % 50 END)
                          || '.example.com/page/' || ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n),
                     'd': x.d + 1}],
                   CASE WHEN CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT) % 37 = 0
                        THEN [{'u': x.u || '?page=2', 'd': x.d + 1}]
                        ELSE CAST([] AS STRUCT(u VARCHAR, d INTEGER)[]) END))),
               c -> NOT list_contains(visited, c.u)) AS cands
      FROM (
        SELECT wave, crawled, n, visited, outp, sp,
               least(10, 40 - crawled, len(sp)) AS budget,
               list_filter(list_slice(sp, 1, least(10, 40 - crawled, len(sp))),
                           x -> regexp_matches(x.u, '^https://site\d+\.example\.com/page/\d+$')) AS fetched
        FROM (
          SELECT wave, crawled, n, visited, outp, list_sort(pending) AS sp
          FROM sim
          WHERE len(pending) > 0 AND crawled < 40
        )
      )
    )
  ) s
),
last AS (SELECT outp FROM sim ORDER BY wave DESC LIMIT 1),
flat AS (SELECT unnest(outp) AS r FROM last)
SELECT r.u AS url, CAST(r.w AS BIGINT) AS wave FROM flat
""",
    "politeness_budget": r"""
WITH RECURSIVE
sim(wave, n, visited, pending, outp) AS (
  SELECT 0, (SELECT COUNT(*) FROM documents),
         ['https://site0.example.com/page/0', 'https://site1.example.com/page/1', 'https://site2.example.com/page/2'],
         [{'d': 0, 'u': 'https://site0.example.com/page/0'},
          {'d': 0, 'u': 'https://site1.example.com/page/1'},
          {'d': 0, 'u': 'https://site2.example.com/page/2'}],
         CAST([] AS STRUCT(u VARCHAR, w INTEGER)[])
  UNION ALL
  SELECT s.wave + 1, s.n,
         s.visited || s.newu,
         s.rejected || list_transform(s.newu, u -> {
             'd': list_aggregate(list_transform(list_filter(s.cands, c -> c.u = u), c -> c.d), 'min'),
             'u': u}),
         s.outp || list_transform(s.admitted, x -> {'u': x.u, 'w': s.wave})
  FROM (
    SELECT wave, n, visited, outp, admitted, rejected, cands,
           list_distinct(list_transform(cands, c -> c.u)) AS newu
    FROM (
      SELECT wave, n, visited, outp, admitted, rejected,
             list_filter(
               flatten(list_transform(
                 list_filter(admitted, x -> x.d < 2
                             AND regexp_matches(x.u, '^https://site\d+\.example\.com/page/\d+$')), x ->
                 list_concat(
                   [{'u': 'https://site' || regexp_extract(x.u, 'site(\d+)', 1) || '.example.com',
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n) % 7 = 0 THEN 0
                                ELSE ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n) % 50 END)
                          || '.example.com/page/' || ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+1) % n),
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n) % 7 = 0 THEN 0
                                ELSE ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n) % 50 END)
                          || '.example.com/page/' || ((2*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+2) % n),
                     'd': x.d + 1},
                    {'u': 'https://site' ||
                          (CASE WHEN ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n) % 7 = 0 THEN 0
                                ELSE ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n) % 50 END)
                          || '.example.com/page/' || ((7*CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT)+3) % n),
                     'd': x.d + 1}],
                   CASE WHEN CAST(regexp_extract(x.u,'page/(\d+)',1) AS BIGINT) % 37 = 0
                        THEN [{'u': x.u || '?page=2', 'd': x.d + 1}]
                        ELSE CAST([] AS STRUCT(u VARCHAR, d INTEGER)[]) END))),
               c -> NOT list_contains(visited, c.u)) AS cands
      FROM (
        SELECT wave, n, visited, outp,
               list_transform(
                 list_filter(range(1, len(sp) + 1),
                   i -> len(list_filter(list_slice(sp, 1, i - 1),
                            y -> regexp_extract(y.u, '^https://([^/]+)', 1)
                                 = regexp_extract(sp[i].u, '^https://([^/]+)', 1))) < 2),
                 i -> sp[i]) AS admitted,
               list_transform(
                 list_filter(range(1, len(sp) + 1),
                   i -> len(list_filter(list_slice(sp, 1, i - 1),
                            y -> regexp_extract(y.u, '^https://([^/]+)', 1)
                                 = regexp_extract(sp[i].u, '^https://([^/]+)', 1))) >= 2),
                 i -> sp[i]) AS rejected
        FROM (
          SELECT wave, n, visited, outp, list_sort(pending) AS sp
          FROM sim
          WHERE len(pending) > 0
        )
      )
      WHERE len(admitted) > 0
    )
  ) s
),
last AS (SELECT outp FROM sim ORDER BY wave DESC LIMIT 1),
flat AS (SELECT unnest(outp) AS r FROM last)
SELECT r.u AS url, CAST(r.w AS BIGINT) AS wave FROM flat
""",
    "triangles": r"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS s, (2*doc_id+1) % nn.c AS d FROM documents, nn
  UNION ALL SELECT doc_id, (2*doc_id+2) % nn.c FROM documents, nn
  UNION ALL SELECT doc_id, (7*doc_id+3) % nn.c FROM documents, nn
),
e AS (SELECT DISTINCT LEAST(s,d) AS a, GREATEST(s,d) AS b FROM child WHERE s <> d)
SELECT e1.a AS a, e1.b AS b, e2.b AS c
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
""",
    "clustering_coeff": r"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
child AS (
  SELECT doc_id AS s, (2*doc_id+1) % nn.c AS d FROM documents, nn
  UNION ALL SELECT doc_id, (2*doc_id+2) % nn.c FROM documents, nn
  UNION ALL SELECT doc_id, (7*doc_id+3) % nn.c FROM documents, nn
),
e AS (SELECT DISTINCT LEAST(s,d) AS a, GREATEST(s,d) AS b FROM child WHERE s <> d),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
corners AS (
  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
ntri AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
)
SELECT deg.node,
       CAST(deg.d AS BIGINT) AS deg,
       CAST(COALESCE(ntri.t, 0) AS BIGINT) AS n_tri,
       CAST(2.0 AS DOUBLE) * CAST(COALESCE(ntri.t, 0) AS DOUBLE)
         / CAST(deg.d * (deg.d - 1) AS DOUBLE) AS coeff
FROM deg LEFT JOIN ntri USING (node)
WHERE deg.d >= 2
""",
    "bm25_topk": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, len(t) AS dl,
         len(list_filter(t, x -> x = 'table')) AS tf0,
         len(list_filter(t, x -> x = 'scan'))  AS tf1,
         len(list_filter(t, x -> x = 'merge')) AS tf2
  FROM toks
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl,
         CAST(COUNT(*) FILTER (tf0 > 0) AS BIGINT) AS df0,
         CAST(COUNT(*) FILTER (tf1 > 0) AS BIGINT) AS df1,
         CAST(COUNT(*) FILTER (tf2 > 0) AS BIGINT) AS df2
  FROM tf
),
scored AS (
  SELECT tf.doc_id,
    ROUND(
      ln((st.n_docs - st.df0 + CAST(0.5 AS DOUBLE)) / (st.df0 + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (tf.tf0 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        / (tf.tf0 + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
    + ln((st.n_docs - st.df1 + CAST(0.5 AS DOUBLE)) / (st.df1 + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (tf.tf1 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        / (tf.tf1 + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
    + ln((st.n_docs - st.df2 + CAST(0.5 AS DOUBLE)) / (st.df2 + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (tf.tf2 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        / (tf.tf2 + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
    , 8) AS score
  FROM tf, st
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
""",
    "top_k_relevant": r"""
WITH s AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
),
scored AS (
  SELECT doc_id,
         len(list_filter(t, x -> x = 'table')) AS c1,
         len(list_filter(t, x -> x = 'scan')) AS c2,
         len(list_filter(t, x -> x = 'merge')) AS c3,
         greatest(len(t), 1) AS n
  FROM s
)
SELECT doc_id FROM scored
ORDER BY (CAST(c1 AS DOUBLE) / n + CAST(c2 AS DOUBLE) / n + CAST(c3 AS DOUBLE) / n) DESC,
         doc_id
LIMIT 10
""",
    "link_preview": f"""
WITH {SQL_PAGES}, {SQL_EDGES}
SELECT e.src, e.dst, 'Page ' || u2.doc_id || ' — ' || u2.host AS dst_title
FROM edges e JOIN purl u2 ON u2.url = e.dst
""",
    "link_preview_filtered": f"""
WITH {SQL_PAGES}, {SQL_EDGES},
f AS (SELECT src, dst FROM edges WHERE dst NOT LIKE '%/page/1%'),
r AS (
  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
  FROM f
)
SELECT r.src, r.dst, 'Page ' || u2.doc_id || ' — ' || u2.host AS dst_title
FROM r JOIN purl u2 ON u2.url = r.dst
WHERE r.rn <= 5
""",
    "schema_extract": f"""
WITH {SQL_PAGES}
SELECT url, 'Page ' || doc_id AS h1 FROM purl
""",
    "regex_extract": f"""
WITH {SQL_PAGES}
SELECT url, 'sample_' || doc_id AS value FROM purl WHERE doc_id % 7 = 0
""",
    "events_props": """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
""",
    "sessionize": """
SELECT event_id, user_id,
       CAST(SUM(new_sess) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS session_idx
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL THEN 1
              WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_sess
  FROM events
)
""",
    "events_hopping": r"""
WITH starts AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type FROM events
)
SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM starts GROUP BY 1, 2
""",
    "chunk_counts": r"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN n = 0 THEN 0
                 WHEN n <= 100 THEN 1
                 ELSE (n - 100) // 50 + 1 END AS BIGINT) AS n_chunks
FROM toks
""",
    "events_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
""",
    "asof_orders": """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_totalprice) AS best_price
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, r.best_price
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts
""",
    "range_events": """
SELECT l.event_id,
       CAST(COUNT(*) AS BIGINT) AS n_window,
       ROUND(SUM(r.value), 6) AS sum_value
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND l.ts >= r.ts
 AND l.ts <  r.ts + INTERVAL 1 HOUR
GROUP BY l.event_id
""",
    "top_orders_per_cust": """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rank
  FROM orders
) WHERE rank <= 3
""",
    "orders_per_nation": """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name
""",
    "qty_by_flag": """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
}

# Pinned sf0.01 golden oracles for the non-SQL-expressible queries
# (hash-valued / iterative / heuristic): deterministic output captured as
# literal VALUES tables by scripts/gen_golden_oracles.py, with an
# independent pure-python recompute where possible (fingerprints). The
# driver's correctness gate runs at sf=0.01, which these pins target.
try:
    from .golden_sf001 import GOLDEN_SQL as _GOLDEN_SQL

    ORACLES.update(_GOLDEN_SQL)
    # These oracles are literal VALUES pinned at sf0.01 — comparing them
    # at any other scale factor is meaningless by construction. Local
    # sweeps at other sfs should skip them, not report MISMATCH.
    GOLDEN_PINNED_SF001 = frozenset(_GOLDEN_SQL)
except ImportError:  # pragma: no cover — before first generation
    GOLDEN_PINNED_SF001 = frozenset()

# the bloom-semijoin variant is exact (bucketed verify kills false
# positives) → same contamination oracle as the broadcast-exact path
ORACLES["decontaminate_bloom"] = ORACLES["decontaminate"]

# Fuzzy (near-dup) decontamination: bench = every 97th doc with its first
# token dropped; gram model identical to the ngram_jaccard_pairs oracle;
# the Jaccard predicate mirrors verify_pairs' judge operand-for-operand
# (float division, not the cross-multiplied form).
ORACLES["decontaminate_fuzzy"] = r"""
WITH ctoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
btoks AS (
  SELECT doc_id, t[2:len(t)] AS t FROM ctoks WHERE doc_id % 97 = 0
),
cgrams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN generate_series(1, len(t) - 2)]
      END AS gl
    FROM ctoks WHERE len(t) > 0
  ), UNNEST(gl) AS u(g)
),
bgrams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN generate_series(1, len(t) - 2)]
      END AS gl
    FROM btoks WHERE len(t) > 0
  ), UNNEST(gl) AS u(g)
),
csz AS (SELECT doc_id, COUNT(*) AS sz FROM cgrams GROUP BY doc_id),
bsz AS (SELECT doc_id, COUNT(*) AS sz FROM bgrams GROUP BY doc_id),
inter AS (
  SELECT cg.doc_id AS a, bg.doc_id AS b, COUNT(*) AS i
  FROM cgrams cg JOIN bgrams bg ON cg.g = bg.g
  GROUP BY 1, 2
),
hits AS (
  SELECT i.a, COUNT(*) AS n
  FROM inter i
  JOIN csz ON csz.doc_id = i.a
  JOIN bsz ON bsz.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / (csz.sz + bsz.sz - i.i) >= CAST(0.8 AS DOUBLE)
  GROUP BY i.a
)
SELECT c.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_fuzzy_matches,
       CAST(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS fuzzy_contaminated
FROM ctoks c LEFT JOIN hits h ON h.a = c.doc_id
"""

# RefinedWeb-style boilerplate line dedup: identical segment model as the
# Ray side (non-overlapping 3-token windows incl. the partial tail;
# whitespace-split tokens), doc-frequency > 2 = boilerplate. Parallel
# unnest(range(...)) zips the per-row segment index; empty-token docs fall
# out of segs and are restored by the LEFT JOIN with ('', 0, 0).
ORACLES["line_dedup"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
idxd AS (
  SELECT doc_id, t,
         unnest(range(CAST(ceil(len(t) / 3.0) AS BIGINT))) AS seg_idx
  FROM toks
),
seg2 AS (
  SELECT doc_id, seg_idx,
         array_to_string(list_slice(t, seg_idx * 3 + 1, seg_idx * 3 + 3), ' ') AS seg
  FROM idxd
),
boiler AS (
  SELECT seg
  FROM (SELECT DISTINCT doc_id, seg FROM seg2)
  GROUP BY seg
  HAVING COUNT(*) > 2
),
kept AS (
  SELECT doc_id, seg_idx, seg
  FROM seg2
  WHERE seg NOT IN (SELECT seg FROM boiler)
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_seg FROM seg2 GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(tot.n_seg, 0) AS BIGINT) AS n_seg,
       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(agg.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN tot USING (doc_id)
LEFT JOIN agg USING (doc_id)
"""

# CCNet-style unigram-LM bucketing: identical model fit (top-16 vocab by
# (count desc, token asc) + one OOV class, add-one smoothing over
# n + v_kept + 1) and the identical per-token fixed-point quantization
# floor(-ln((c+1)/denom) * 1e8 + 0.5) — the per-doc SUM is then pure
# int64, so summation order cannot perturb the value hash.
ORACLES["lm_bucket"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
st AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM cnt),
kept AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 16),
kst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vk,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS ck
  FROM kept
),
par AS (
  SELECT st.n, kst.vk,
         (st.n - kst.ck) // GREATEST(st.v - kst.vk, 1) AS oov_c,
         st.n + kst.vk + 1 AS denom
  FROM st, kst
),
q AS (
  SELECT w,
         CAST(floor(-ln(CAST(c + 1 AS DOUBLE) / CAST(par.denom AS DOUBLE))
                    * 1e8 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nq
  FROM kept, par
),
oq AS (
  SELECT CAST(floor(-ln(CAST(par.oov_c + 1 AS DOUBLE) / CAST(par.denom AS DOUBLE))
                    * 1e8 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nq
  FROM par
),
scored AS (
  SELECT tok.doc_id,
         CAST(SUM(COALESCE(q.nq, (SELECT nq FROM oq))) AS BIGINT) AS nll,
         CAST(COUNT(*) AS BIGINT) AS dl
  FROM tok LEFT JOIN q ON tok.w = q.w
  GROUP BY tok.doc_id
),
m AS (
  SELECT d.doc_id,
         CAST(COALESCE(s.dl, 0) AS BIGINT) AS dl,
         CAST(COALESCE(s.nll, 0) AS BIGINT) AS nll_fixed,
         CAST(CASE WHEN COALESCE(s.dl, 0) = 0 THEN 0
                   ELSE s.nll // s.dl END AS BIGINT) AS mean_nll_fixed
  FROM documents d LEFT JOIN scored s USING (doc_id)
)
SELECT doc_id, dl, nll_fixed, mean_nll_fixed,
       CASE WHEN mean_nll_fixed < 342800000 THEN 'head'
            WHEN mean_nll_fixed < 343500000 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM m
"""

# The flagship four-stage composition, recomputed stage-for-stage:
# quality ≥ 0.5 → 3-token-window boilerplate removal (df > 2 over the
# SURVIVOR corpus, boilerplate-only docs dropped) → exact dedup on the
# cleaned text (min doc_id per distinct clean_text) → unigram-LM bucket
# fit on the DEDUPED cleaned corpus, tail dropped. Same float/integer
# discipline as quality_filter / line_dedup / lm_bucket.
ORACLES["webtext_pipeline"] = rf"""
WITH qc AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
         CAST(length(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digit,
         CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS DOUBLE) AS n_stop
  FROM documents
),
surv AS (
  SELECT doc_id, text FROM qc
  WHERE (LEAST(GREATEST(n_tok / CAST(100.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
     + LEAST(GREATEST(CAST(1.0 AS DOUBLE) - CAST(5.0 AS DOUBLE) * (n_punct + n_digit) / GREATEST(n_chars, CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
     + LEAST(GREATEST(CAST(5.0 AS DOUBLE) * n_stop / GREATEST(n_tok, CAST(1.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
    ) / CAST(3.0 AS DOUBLE) >= CAST(0.5 AS DOUBLE)
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM surv
),
idxd AS (
  SELECT doc_id, t,
         unnest(range(CAST(ceil(len(t) / 3.0) AS BIGINT))) AS seg_idx
  FROM toks
),
seg2 AS (
  SELECT doc_id, seg_idx,
         array_to_string(list_slice(t, seg_idx * 3 + 1, seg_idx * 3 + 3), ' ') AS seg
  FROM idxd
),
boiler AS (
  SELECT seg FROM (SELECT DISTINCT doc_id, seg FROM seg2)
  GROUP BY seg HAVING COUNT(*) > 2
),
cleaned AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
  FROM seg2 WHERE seg NOT IN (SELECT seg FROM boiler)
  GROUP BY doc_id
),
dedup AS (
  SELECT clean_text, CAST(MIN(doc_id) AS BIGINT) AS doc_id
  FROM cleaned GROUP BY clean_text
),
tok2 AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(clean_text, '\s+'), x -> x <> '')) AS w
  FROM dedup
),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok2 GROUP BY w),
st AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM cnt),
kept AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 16),
kst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vk,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS ck
  FROM kept
),
par AS (
  SELECT st.n, kst.vk,
         (st.n - kst.ck) // GREATEST(st.v - kst.vk, 1) AS oov_c,
         st.n + kst.vk + 1 AS denom
  FROM st, kst
),
q AS (
  SELECT w,
         CAST(floor(-ln(CAST(c + 1 AS DOUBLE) / CAST(par.denom AS DOUBLE))
                    * 1e8 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nq
  FROM kept, par
),
oq AS (
  SELECT CAST(floor(-ln(CAST(par.oov_c + 1 AS DOUBLE) / CAST(par.denom AS DOUBLE))
                    * 1e8 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nq
  FROM par
),
scored AS (
  SELECT tok2.doc_id,
         CAST(SUM(COALESCE(q.nq, (SELECT nq FROM oq))) AS BIGINT) AS nll_fixed,
         CAST(COUNT(*) AS BIGINT) AS dl
  FROM tok2 LEFT JOIN q ON tok2.w = q.w
  GROUP BY tok2.doc_id
),
m AS (
  SELECT doc_id, dl, nll_fixed,
         CAST(nll_fixed // dl AS BIGINT) AS mean_nll_fixed
  FROM scored
)
SELECT m.doc_id, m.dl, m.nll_fixed, m.mean_nll_fixed,
       CASE WHEN m.mean_nll_fixed < 342900000 THEN 'head'
            WHEN m.mean_nll_fixed < 343500000 THEN 'middle'
            ELSE 'tail' END AS bucket,
       d.clean_text
FROM m JOIN dedup d ON d.doc_id = m.doc_id
WHERE m.mean_nll_fixed < 343500000
"""


def _kmeans_cte_chain(k: int, iters: int, emb_src: str = "embeddings",
                      prefix: str = "") -> str:
    """Unrolled fixed-point k-means as a CTE chain mirroring
    stages/cluster.py kmeans_fp operand-for-operand: quantize
    floor(v*2^20+0.5) in DOUBLE, integer squared distances, ties to the
    lowest cluster, centroid update floor(SUM::DOUBLE / COUNT) (exact
    while |sum| < 2^53 — DuckDB's // truncates toward zero, so it is NOT
    used), empty clusters carry the previous centroid. AS MATERIALIZED on
    every multi-consumer CTE or DuckDB 1.0 inlines the chain
    exponentially (same gotcha as the logreg oracle)."""
    parts = [
        f"""{prefix}efp AS MATERIALIZED (
  SELECT vec_id,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e
  FROM {emb_src}
),
{prefix}c0 AS MATERIALIZED (SELECT vec_id AS cluster, dim, e AS c FROM {prefix}efp WHERE vec_id < {k})"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""{prefix}d{i} AS (
  SELECT f.vec_id, c.cluster, SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM {prefix}efp f JOIN {prefix}c{i - 1} c USING (dim) GROUP BY f.vec_id, c.cluster
),
{prefix}a{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
    FROM {prefix}d{i}) WHERE rn = 1
),
{prefix}c{i} AS MATERIALIZED (
  SELECT prev.cluster, prev.dim, COALESCE(upd.c, prev.c) AS c
  FROM {prefix}c{i - 1} prev LEFT JOIN (
    SELECT a.cluster, f.dim,
           CAST(floor(CAST(SUM(f.e) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
    FROM {prefix}a{i} a JOIN {prefix}efp f USING (vec_id) GROUP BY a.cluster, f.dim
  ) upd ON prev.cluster = upd.cluster AND prev.dim = upd.dim
)"""
        )
    parts.append(
        f"""{prefix}dfin AS (
  SELECT f.vec_id, c.cluster, SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM {prefix}efp f JOIN {prefix}c{iters} c USING (dim) GROUP BY f.vec_id, c.cluster
),
{prefix}afinal AS MATERIALIZED (
  SELECT vec_id, cluster, d FROM (
    SELECT vec_id, cluster, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
    FROM {prefix}dfin) WHERE rn = 1
)"""
    )
    return ",\n".join(parts)


# PQ-ANN: two prefixed k-means chains (one per 32-dim subspace slice),
# then ADC = per-(query, neighbor) sum of integer squared distances
# query-subvector ↔ the centroid of the neighbor's code, per subspace.
ORACLES["ann_topk_pq"] = f"""
WITH s0 AS MATERIALIZED (
  SELECT vec_id, embedding[1:32] AS embedding FROM embeddings
),
s1 AS MATERIALIZED (
  SELECT vec_id, embedding[33:64] AS embedding FROM embeddings
),
{_kmeans_cte_chain(8, 2, emb_src="s0", prefix="p0_")},
{_kmeans_cte_chain(8, 2, emb_src="s1", prefix="p1_")},
q AS (SELECT vec_id FROM embeddings WHERE vec_id < 5),
dd0 AS MATERIALIZED (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM q
  JOIN p0_afinal a ON a.vec_id <> q.vec_id
  JOIN p0_efp f ON f.vec_id = q.vec_id
  JOIN p0_c2 c ON c.cluster = a.cluster AND c.dim = f.dim
  GROUP BY 1, 2
),
dd1 AS MATERIALIZED (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM q
  JOIN p1_afinal a ON a.vec_id <> q.vec_id
  JOIN p1_efp f ON f.vec_id = q.vec_id
  JOIN p1_c2 c ON c.cluster = a.cluster AND c.dim = f.dim
  GROUP BY 1, 2
),
tot AS (
  SELECT query_id, neighbor_id, dd0.d + dd1.d AS d
  FROM dd0 JOIN dd1 USING (query_id, neighbor_id)
),
ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rn
  FROM tot
)
SELECT query_id, neighbor_id, CAST(d AS BIGINT) AS dist_fp,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 10
"""

# IVF-PQ: the PQ oracle's two subspace chains PLUS a coarse chain over the
# full vectors; per query the cells are ranked by the same integer L2
# (ties -> lower cell), and the ADC ranking only sees neighbors whose
# coarse cell is among the query's nprobe=2 probes. The body is shared
# with the recall oracle below.
_IVFPQ_CTE_BODY = f"""s0 AS MATERIALIZED (
  SELECT vec_id, embedding[1:32] AS embedding FROM embeddings
),
s1 AS MATERIALIZED (
  SELECT vec_id, embedding[33:64] AS embedding FROM embeddings
),
{_kmeans_cte_chain(4, 2, emb_src="embeddings", prefix="cc_")},
{_kmeans_cte_chain(8, 2, emb_src="s0", prefix="p0_")},
{_kmeans_cte_chain(8, 2, emb_src="s1", prefix="p1_")},
q AS (SELECT vec_id FROM embeddings WHERE vec_id < 5),
qcell AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cluster AS cell,
         SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM q
  JOIN cc_efp f ON f.vec_id = q.vec_id
  JOIN cc_c2 c ON c.dim = f.dim
  GROUP BY 1, 2
),
probes AS MATERIALIZED (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
    FROM qcell) WHERE rn <= 2
),
dd0 AS MATERIALIZED (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM q
  JOIN p0_afinal a ON a.vec_id <> q.vec_id
  JOIN p0_efp f ON f.vec_id = q.vec_id
  JOIN p0_c2 c ON c.cluster = a.cluster AND c.dim = f.dim
  GROUP BY 1, 2
),
dd1 AS MATERIALIZED (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         SUM((f.e - c.c) * (f.e - c.c)) AS d
  FROM q
  JOIN p1_afinal a ON a.vec_id <> q.vec_id
  JOIN p1_efp f ON f.vec_id = q.vec_id
  JOIN p1_c2 c ON c.cluster = a.cluster AND c.dim = f.dim
  GROUP BY 1, 2
),
tot AS (
  SELECT dd0.query_id, dd0.neighbor_id, dd0.d + dd1.d AS d
  FROM dd0
  JOIN dd1 USING (query_id, neighbor_id)
  JOIN cc_afinal ca ON ca.vec_id = dd0.neighbor_id
  JOIN probes p ON p.query_id = dd0.query_id AND p.cell = ca.cluster
),
ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rn
  FROM tot
)"""

ORACLES["ann_topk_ivfpq"] = f"""
WITH {_IVFPQ_CTE_BODY}
SELECT query_id, neighbor_id, CAST(d AS BIGINT) AS dist_fp,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 10
"""

# recall@10 of the IVF-PQ ranking against the EXACT integer-L2 ranking
# over the same fixed-point vectors (cc_efp doubles as the ground-truth
# vector table — same quantization, same tie discipline).
ORACLES["ann_recall_ivfpq"] = f"""
WITH {_IVFPQ_CTE_BODY},
exact_d AS MATERIALIZED (
  SELECT q.vec_id AS query_id, f2.vec_id AS neighbor_id,
         SUM((f.e - f2.e) * (f.e - f2.e)) AS d
  FROM q
  JOIN cc_efp f ON f.vec_id = q.vec_id
  JOIN cc_efp f2 ON f2.dim = f.dim AND f2.vec_id <> q.vec_id
  GROUP BY 1, 2
),
exact_ranked AS MATERIALIZED (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rn
  FROM exact_d
),
hits AS (
  SELECT r.query_id, COUNT(*) AS n_hits
  FROM ranked r
  JOIN exact_ranked x
    ON x.query_id = r.query_id AND x.neighbor_id = r.neighbor_id
   AND x.rn <= 10
  WHERE r.rn <= 10
  GROUP BY r.query_id
)
SELECT q.vec_id AS query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10 AS recall
FROM q LEFT JOIN hits h ON h.query_id = q.vec_id
"""

ORACLES["mmr_rerank"] = _mmr_sql(20, 5)

ORACLES["embedding_norm_outliers"] = """
WITH efp AS MATERIALIZED (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e
  FROM embeddings
),
nrm AS MATERIALIZED (
  SELECT vec_id, CAST(SUM(e * e) AS BIGINT) AS v FROM efp GROUP BY vec_id
),
mm AS (SELECT MIN(v) AS m FROM nrm),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v - mm.m) AS BIGINT) AS s1,
         CAST(SUM((v - mm.m) * (v - mm.m)) AS BIGINT) AS s2
  FROM nrm, mm
),
z AS (
  SELECT nrm.vec_id, nrm.v AS norm2_fp,
         CASE WHEN mo.n * mo.s2 - mo.s1 * mo.s1 > 0
              THEN CAST((nrm.v - mm.m) * mo.n - mo.s1 AS DOUBLE)
                   / sqrt(CAST(mo.n * mo.s2 - mo.s1 * mo.s1 AS DOUBLE))
              ELSE CAST(0 AS DOUBLE) END AS zscore
  FROM nrm, mm, mo
)
SELECT vec_id, norm2_fp, zscore,
       abs(zscore) > CAST(2 AS DOUBLE) AS is_outlier
FROM z
"""

ORACLES["kmeans_embeddings"] = f"""
WITH {_kmeans_cte_chain(8, 4)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, CAST(d AS BIGINT) AS dist_fp
FROM afinal
"""

# semdedup: the same k-means chain over the doubled (planted-copy) table,
# then within-cluster lower-id-dominates cosine drops, integer-exact:
# cos(u,v) > 0.9  ⟺  dot > 0 AND dot^2*100 > 81*|u|^2*|v|^2 (HUGEINT).
ORACLES["semdedup"] = f"""
WITH emb2 AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT COUNT(*) FROM embeddings), embedding FROM embeddings
),
{_kmeans_cte_chain(8, 4, emb_src="emb2")},
norms AS MATERIALIZED (
  SELECT vec_id, SUM(CAST(e AS HUGEINT) * e) AS nn FROM efp GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM afinal a JOIN afinal b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
dots AS (
  SELECT p.u, p.v, SUM(CAST(fu.e AS HUGEINT) * fv.e) AS dot
  FROM pairs p
  JOIN efp fu ON fu.vec_id = p.u
  JOIN efp fv ON fv.vec_id = p.v AND fv.dim = fu.dim
  GROUP BY p.u, p.v
),
dropped AS (
  SELECT DISTINCT d.v
  FROM dots d
  JOIN norms nu ON nu.vec_id = d.u
  JOIN norms nv ON nv.vec_id = d.v
  WHERE d.dot > 0 AND d.dot * d.dot * 100 > 81 * nu.nn * nv.nn
)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       a.vec_id NOT IN (SELECT v FROM dropped) AS keep
FROM afinal a
"""


# neardup_keep: the ngram_jaccard_pairs oracle supplies the edge list;
# components close via a recursive CTE (UNION dedups the label frontier,
# so the recursion enumerates (node, reachable-label) pairs — bounded on
# near-dup clusters, which are tiny); canonical winner = min label.
ORACLES["neardup_keep"] = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({ORACLES["ngram_jaccard_pairs"]}),
und AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
cc(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.comp FROM cc c JOIN und e ON e.src = c.node
)
SELECT node AS doc_id, CAST(MIN(comp) AS BIGINT) AS component,
       (node = MIN(comp)) AS keep
FROM cc GROUP BY node
"""

# hybrid_rrf: BM25 lexical top-20 + exact-cosine semantic top-20
# (query = embedding 0), fused with integer reciprocal-rank contributions
# 10^9 // (60 + rank). DuckDB // truncates toward zero == floor here
# (operands positive).
ORACLES["hybrid_rrf"] = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, len(t) AS dl,
         len(list_filter(t, x -> x = 'table')) AS tf0,
         len(list_filter(t, x -> x = 'scan'))  AS tf1,
         len(list_filter(t, x -> x = 'merge')) AS tf2
  FROM toks
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl,
         CAST(COUNT(*) FILTER (tf0 > 0) AS BIGINT) AS df0,
         CAST(COUNT(*) FILTER (tf1 > 0) AS BIGINT) AS df1,
         CAST(COUNT(*) FILTER (tf2 > 0) AS BIGINT) AS df2
  FROM tf
),
scored AS (
  SELECT tf.doc_id,
    ROUND(
      ln((st.n_docs - st.df0 + CAST(0.5 AS DOUBLE)) / (st.df0 + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (tf.tf0 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        / (tf.tf0 + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
    + ln((st.n_docs - st.df1 + CAST(0.5 AS DOUBLE)) / (st.df1 + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (tf.tf1 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        / (tf.tf1 + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
    + ln((st.n_docs - st.df2 + CAST(0.5 AS DOUBLE)) / (st.df2 + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (tf.tf2 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        / (tf.tf2 + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
    , 8) AS score
  FROM tf, st
),
lex AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scored
  ) WHERE r <= 20
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT doc_id, r FROM (
    SELECT e.vec_id AS doc_id,
           ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                      e.vec_id
           ) AS r
    FROM q CROSS JOIN embeddings e WHERE e.vec_id <> 0
  ) WHERE r <= 20
),
contribs AS (
  SELECT doc_id, 1000000000 // (60 + r) AS c FROM lex
  UNION ALL
  SELECT doc_id, 1000000000 // (60 + r) AS c FROM sem
),
fused AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_fp
  FROM contribs GROUP BY doc_id
)
SELECT doc_id, rrf_fp,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_fp DESC, doc_id) AS BIGINT) AS rank
FROM fused
ORDER BY rank LIMIT 10
"""

# --- sitemap_urls -----------------------------------------------------------
# The Ray side builds per-host sitemap XML (index -> parity-split urlsets,
# lastmod/priority from the multiplicative sampling hash), walks it from the
# root indexes and parses it back with ElementTree. The oracle derives the
# same (host, url, lastmod, priority) rows DIRECTLY from the pages universe:
# a lossy or lossless-but-wrong XML round-trip on the Ray side (missed strip,
# dropped entry, field swap, glob drift) breaks rows or the value hash.
ORACLES["sitemap_urls"] = f"""
WITH {SQL_PAGES},
h AS (
  SELECT host, url, (doc_id * 2654435761 + 12345) % 1000000007 AS hsh
  FROM purl
  WHERE url LIKE 'https://site1%.example.com/%'
)
SELECT host, url,
       CAST(CAST(DATE '2024-01-01' + (hsh % 365) * INTERVAL 1 DAY AS DATE) AS VARCHAR) AS lastmod,
       CAST(hsh % 9 + 1 AS DOUBLE) / 10.0 AS priority
FROM h
"""

# --- url_traps ---------------------------------------------------------------
# Every trap rule recomputed generically from the URL string (no branching on
# the variant index k): path/query split by regex, segment list via
# str_split+list_filter, the consecutive-repeat rule over indexed segments
# (RE2 has no backreferences), TRY_CAST-guarded year range.
ORACLES["url_traps"] = r"""
WITH v AS (
  SELECT doc_id,
         'https://site' || (doc_id % 50) || '.example.com/page/' || doc_id AS base,
         doc_id % 8 AS k
  FROM documents
),
u AS (
  SELECT doc_id,
    CASE k
      WHEN 0 THEN base
      WHEN 1 THEN base || '/x/x/x'
      WHEN 2 THEN base || '/a1/a2/a3/a4/a5/a6/a7'
      WHEN 3 THEN base || '?phpsessid=deadbeef'
      WHEN 4 THEN base || '?a=1&b=2&c=3&d=4&e=5'
      WHEN 5 THEN base || '/' || repeat('x', 200)
      WHEN 6 THEN base || '/2050/01/05/report'
      ELSE base || '/y/z/y/z'
    END AS url
  FROM v
),
parts AS (
  SELECT doc_id, url,
         regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM u
),
segged AS (
  SELECT doc_id, url, path, query,
         list_filter(str_split(path, '/'), s -> s <> '') AS segs
  FROM parts
),
flags AS (
  SELECT doc_id, url,
    len(segs) >= 3 AND len(list_filter(range(1, len(segs) - 1),
        i -> list_extract(segs, i) = list_extract(segs, i + 1)
         AND list_extract(segs, i) = list_extract(segs, i + 2))) > 0
      AS repeated_segment,
    len(segs) > 8 AS too_deep,
    regexp_matches('&' || lower(query), '&(sessionid|phpsessid|jsessionid|sid|sess)=')
      AS session_id,
    len(list_filter(str_split(query, '&'), p -> p <> '')) >= 5 AS many_params,
    length(url) > 200 AS too_long,
    len(list_filter(segs, s -> regexp_matches(s, '^[0-9]{4}$')
         AND (TRY_CAST(s AS INTEGER) < 1990 OR TRY_CAST(s AS INTEGER) > 2025))) > 0
      AS bad_year
  FROM segged
)
SELECT doc_id, url, repeated_segment, too_deep, session_id, many_params,
       too_long, bad_year,
       (repeated_segment OR too_deep OR session_id OR many_params
        OR too_long OR bad_year) AS is_trap
FROM flags
"""

# --- temperature_mix ---------------------------------------------------------
# α=1/2 temperature sampling: weight = floor(sqrt(count)) — FLOOR(SQRT())
# agrees with math.isqrt exactly for counts < 2^52 (IEEE sqrt of an integer
# is correctly rounded and the fractional gap to the next integer is far
# above one ulp at this magnitude). All later arithmetic is BIGINT.
ORACLES["temperature_mix"] = r"""
WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
w AS (SELECT lang, c, CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) AS wt FROM cnt),
tot AS (SELECT SUM(wt) AS sw FROM w),
cuts AS (
  SELECT lang,
         LEAST(10000, (((wt * 10000) // tot.sw) * 250) // c) AS cut
  FROM w, tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN cuts USING (lang)
WHERE ((d.doc_id * 2654435761 + 12345) % 1000000007) % 10000 < cuts.cut
"""


# the indexed BM25 path is defined to equal the scan path — same oracle
ORACLES["bm25_topk_indexed"] = ORACLES["bm25_topk"]

# compacted-index BM25 ≡ scan over the surviving docs (tombstones applied)
ORACLES["bm25_topk_merged"] = ORACLES["bm25_topk"].replace(
    "  FROM documents\n)",
    "  FROM documents WHERE doc_id % 31 <> 0\n)",
    1,
)
assert "doc_id % 31" in ORACLES["bm25_topk_merged"]

# snippets compose on top of the bm25 ranking: the full bm25 oracle nests
# as a CTE (DuckDB allows WITH inside a CTE body), then per top doc the
# 10-token window with the most query-term tokens, ties -> leftmost
ORACLES["search_snippets"] = f"""
WITH topd AS ({ORACLES["bm25_topk"]}),
tt AS (
  SELECT d.doc_id,
         list_filter(regexp_split_to_array(lower(doc.text), '\\s+'),
                     x -> x <> '') AS t
  FROM topd d JOIN documents doc ON doc.doc_id = d.doc_id
),
wins AS (
  SELECT doc_id, i,
         len(list_filter(t[i : i + 9],
                         x -> x IN ('table', 'scan', 'merge'))) AS hits,
         array_to_string(t[i : i + 9], ' ') AS snip
  FROM tt, UNNEST(range(1, greatest(len(t) - 10, 0) + 2)) AS u(i)
)
SELECT doc_id, CAST(hits AS BIGINT) AS n_hits, snip AS snippet FROM (
  SELECT doc_id, hits, snip,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, i) AS rn
  FROM wins) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# eighth-wave operators live in queries_wave8.py; registered here so the
# driver contract (__ray_entry__) keeps reading ONE registry pair.
# ---------------------------------------------------------------------------
import importlib  # noqa: E402
import os as _os  # noqa: E402
import re as _re  # noqa: E402

# wave modules are discovered, not hand-listed (r3 ADVICE: the unrolled
# 68-block import tail); each must expose
# register(queries, oracles, sql_pages). Sorted numerically so later
# waves may override earlier registrations deliberately.
_WAVE_RE = _re.compile(r"queries_wave(\d+)\.py$")
for _name in sorted(
    (m.group(1) for f in _os.listdir(_os.path.dirname(__file__))
     if (m := _WAVE_RE.fullmatch(f))),
    key=int,
):
    importlib.import_module(f".queries_wave{_name}", __package__).register(
        QUERIES, ORACLES, SQL_PAGES
    )

"""URL seeder — the offline analogue of the reference's AsyncUrlSeeder
(async_url_seeder.py): discover candidate urls for a domain, optionally
peek each url's <head>, BM25-score them against a query, and filter.

The reference's discovery sources are live network (sitemap / Common Crawl
index); offline, the corpus IS the url universe, so discovery = a streaming
scan of the pages table. Everything else mirrors the reference surface:

    seed_urls(sf_dir_or_pages,
              pattern="*",            # glob over the url (SeedingConfig.pattern)
              domain=None,            # restrict to one host
              extract_head=False,     # parse head prefix → title/description
              query=None,             # BM25 relevance over head fields
              score_threshold=None,   # keep urls with score ≥ threshold
              max_urls=-1,            # cap (reference max_urls)
              filter_nonsense_urls=True)  # drop robots/sitemap/utility urls
                                          # (SeedingConfig default, :1676)

Returns a Dataset of (url[, title, description][, relevance_score]).
Head peeking slices the html at </head> (HeadPeekr parity, utils.py:
2806-2861); scoring reuses ContentRelevanceFilter's BM25 (the reference
seeder's bm25 scoring method over head text).
"""

from __future__ import annotations

import fnmatch
import re

import pyarrow as pa

import ray

_HEAD_END = b"</head>"


def seed_urls(
    pages: "ray.data.Dataset | str",
    pattern: str = "*",
    domain: str | None = None,
    extract_head: bool = False,
    query: str | None = None,
    score_threshold: float | None = None,
    max_urls: int = -1,
    filter_nonsense_urls: bool = True,
) -> "ray.data.Dataset":
    from ..functions.filters import ContentRelevanceFilter, head_fields
    from ..functions.urls import is_nonsense_url

    if isinstance(pages, str):
        from .pages import read_pages

        pages = read_pages(
            pages, columns=["url", "html"] if (extract_head or query) else ["url"]
        )
    pat_re = re.compile(fnmatch.translate(pattern))
    scorer = ContentRelevanceFilter(query, threshold=0.0) if query else None

    def process(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        keep = [
            i
            for i, u in enumerate(urls)
            if pat_re.match(u)
            and (domain is None or u.split("://", 1)[-1].split("/", 1)[0] == domain)
            and not (filter_nonsense_urls and is_nonsense_url(u))
        ]
        out: dict[str, list] = {"url": [urls[i] for i in keep]}
        if extract_head or query:
            heads = []
            htmls = batch.column("html").to_pylist()
            for i in keep:
                h = htmls[i]
                if isinstance(h, bytes):
                    cut = h.find(_HEAD_END)
                    h = (h[: cut + 7] if cut != -1 else h[:65536]).decode(
                        "utf-8", errors="replace"
                    )
                heads.append(head_fields(h))
            if extract_head:
                out["title"] = [f["title"] for f in heads]
                out["description"] = [
                    f["meta"].get("description", "") for f in heads
                ]
            if scorer is not None:
                scores = [
                    scorer.score(f.get("title", ""), f.get("meta", {}))
                    for f in heads
                ]
                if score_threshold is not None:
                    sel = [j for j, s in enumerate(scores) if s >= score_threshold]
                    out = {k: [v[j] for j in sel] for k, v in out.items()}
                    scores = [scores[j] for j in sel]
                out["relevance_score"] = scores
        # explicit types: a batch where nothing matches must NOT emit
        # null-typed columns (schema mismatch across blocks — round-2 ADVICE)
        types = {
            "url": pa.string(),
            "title": pa.string(),
            "description": pa.string(),
            "relevance_score": pa.float64(),
        }
        return pa.table({k: pa.array(v, types[k]) for k, v in out.items()})

    ds = pages.map_batches(process, batch_format="pyarrow")
    if max_urls and max_urls > 0:
        ds = ds.sort("url").limit(max_urls)
    return ds

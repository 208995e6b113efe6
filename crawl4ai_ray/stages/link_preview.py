"""Link preview: attach target-page head metadata to extracted links.

The reference's LinkPreview fetches each link's <head> over HTTP
(link_preview.py:71-275) and scores links (utils.py:3123-3235,
calculate_total_score :3238). Offline, the "HEAD fetch" is a join against
the corpus: a cheap head-only parse stage over pages (bytes sliced at
</head> — the reference's HeadPeekr streams the same prefix,
utils.py:2806-2837), then ``Dataset.join`` on the normalized link target.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.urls import normalize_url_for_deep_crawl
from ..html.dom import decode_html, parse_html
from ..html.scrape import extract_metadata

_HEAD_END = b"</head>"


def head_meta_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → (url, title, description) parsing only the head
    prefix."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    titles, descs = [], []
    for h in htmls:
        if isinstance(h, bytes):
            cut = h.find(_HEAD_END)
            h = h[: cut + len(_HEAD_END)] if cut != -1 else h[:65536]
        meta = extract_metadata(parse_html(decode_html(h)))
        titles.append(meta.get("title", ""))
        descs.append(meta.get("description", ""))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "description": pa.array(descs, pa.string()),
        }
    )


def explode_internal_links(
    docs: "ray.data.Dataset",
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
) -> "ray.data.Dataset":
    """docs → (src, dst) edges with seen-key-normalized targets.
    include/exclude are glob patterns on the normalized target
    (LinkPreviewConfig.include_patterns/exclude_patterns,
    async_configs.py:650-651,676-677) — applied HERE, before the edge
    shuffle, so excluded targets never leave the map stage."""
    import fnmatch
    import re

    inc = (
        [re.compile(fnmatch.translate(p)) for p in include_patterns]
        if include_patterns
        else None
    )
    exc = (
        [re.compile(fnmatch.translate(p)) for p in exclude_patterns]
        if exclude_patterns
        else None
    )

    def explode(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for src, links in zip(
            batch.column("url").to_pylist(),
            batch.column("links_internal").to_pylist(),
        ):
            for link in links:
                key = normalize_url_for_deep_crawl(link["href"], src)
                if not key:
                    continue
                if inc is not None and not any(p.match(key) for p in inc):
                    continue
                if exc is not None and any(p.match(key) for p in exc):
                    continue
                srcs.append(src)
                dsts.append(key)
        return pa.table(
            {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
        )

    return docs.map_batches(explode, batch_format="pyarrow")


def link_preview(
    docs: "ray.data.Dataset",
    pages: "ray.data.Dataset",
    num_partitions: int = 8,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    max_links: int | None = None,
) -> "ray.data.Dataset":
    """(src, dst, dst_title): inner-join link targets against corpus heads.
    Head extraction is a cheap prefix parse; the join shuffles only
    (url, title, description) triples — never the page bodies.

    LinkPreviewConfig parity (async_configs.py:643-721): include/exclude
    glob patterns prune targets map-side; ``max_links`` caps the DISTINCT
    targets previewed per source page (deterministic: first max_links by
    target asc), via the shared grouped_topk two-level cap — never one
    scheduling unit per source."""
    edges = explode_internal_links(
        docs, include_patterns=include_patterns, exclude_patterns=exclude_patterns
    ).groupby(["src", "dst"]).count().select_columns(["src", "dst"])
    if max_links is not None:
        from .agg import grouped_topk

        def zero(batch: pa.Table) -> pa.Table:
            import numpy as np

            return batch.append_column(
                "z", pa.array(np.zeros(batch.num_rows, dtype=np.int64))
            )

        capped = grouped_topk(
            edges.map_batches(zero, batch_format="pyarrow"),
            key="src",
            value="z",
            k=max_links,
            extra_cols=("dst",),
            tie_col="dst",
        )
        edges = capped.select_columns(["src", "dst"])
    heads = pages.map_batches(head_meta_batch, batch_format="pyarrow")
    joined = edges.join(
        heads,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("url",),
    )
    return joined.select_columns(["src", "dst", "title"]).rename_columns(
        {"title": "dst_title"}
    )

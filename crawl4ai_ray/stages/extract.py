"""The extraction stage: pages batches → docs batches (Arrow in/out).

This is the Ray-Data-native form of the reference's ``aprocess_html``
(async_webcrawler.py:433-651): scrape → fit_html → markdown → citations,
flattened into columns (SURVEY.md §1.2 ``docs`` schema). One parse per page;
the cleaned DOM is shared between cleaning and markdown generation.

Used as a callable class in ``map_batches(ExtractPages, batch_format="pyarrow",
batch_size=..., concurrency=...)`` — config is bound once per worker in
``__init__``, per-batch work is ``__call__``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..config import ScrapeConfig
from ..html.markdown import generate_markdown
from ..html.scrape import scrape_page

LINK_STRUCT = pa.struct(
    [
        ("href", pa.string()),
        ("text", pa.string()),
        ("title", pa.string()),
        ("base_domain", pa.string()),
        ("intrinsic_score", pa.float64()),  # null unless cfg.score_links
    ]
)
IMAGE_STRUCT = pa.struct(
    [
        ("src", pa.string()),
        ("alt", pa.string()),
        ("desc", pa.string()),
        ("score", pa.int32()),
        ("group_id", pa.int32()),
        ("format", pa.string()),
        ("width", pa.string()),
    ]
)
MEDIA_SRC_STRUCT = pa.struct([("src", pa.string()), ("type", pa.string())])

DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("success", pa.bool_()),
        ("status_code", pa.int32()),
        ("title", pa.string()),
        ("metadata", pa.string()),  # JSON map (free-form, parity w/ reference)
        ("cleaned_html", pa.string()),
        ("fit_html", pa.string()),
        ("markdown", pa.string()),
        ("markdown_citations", pa.string()),
        ("references_markdown", pa.string()),
        ("text", pa.string()),
        ("links_internal", pa.list_(LINK_STRUCT)),
        ("links_external", pa.list_(LINK_STRUCT)),
        ("images", pa.list_(IMAGE_STRUCT)),
        ("videos", pa.list_(MEDIA_SRC_STRUCT)),
        ("audios", pa.list_(MEDIA_SRC_STRUCT)),
        ("tables", pa.string()),  # JSON [{headers, rows, caption, summary}]
        ("n_links", pa.int32()),
        ("n_images", pa.int32()),
    ]
)


def _link_rows(links: list[dict]) -> list[dict]:
    return [
        {
            "href": l["href"],
            "text": l["text"],
            "title": l["title"],
            "base_domain": l["base_domain"],
            "intrinsic_score": l.get("intrinsic_score"),
        }
        for l in links
    ]


def _image_rows(images: list[dict]) -> list[dict]:
    return [
        {
            "src": im["src"],
            "alt": im["alt"],
            "desc": im["desc"],
            "score": im["score"],
            "group_id": im["group_id"],
            "format": im["format"],
            "width": im["width"],
        }
        for im in images
    ]


class ExtractPages:
    """pages(url, html[, ...]) → docs batch. Stateless per-row transform,
    vectorized at the batch level; safe as either task or actor UDF."""

    def __init__(self, cfg: ScrapeConfig | None = None):
        self.cfg = cfg or ScrapeConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        n = len(urls)
        cols: dict[str, list] = {name: [] for name in DOCS_SCHEMA.names}
        for url, html in zip(urls, htmls):
            r = scrape_page(url, html, self.cfg)
            if r["success"]:
                # content_source dispatch (r5 — reference
                # markdown_generation_strategy.py + tests/general/
                # test_content_source_parameter.py): raw_html |
                # cleaned_html | fit_html, anything else falls back to
                # cleaned_html
                src = {
                    "raw_html": lambda: html,
                    "cleaned_html": lambda: r["cleaned_root"],
                    "fit_html": lambda: r["fit_html"],
                }.get(self.cfg.content_source, lambda: r["cleaned_root"])()
                md = generate_markdown(
                    src, base_url=url, citations=self.cfg.citations
                )
            else:
                md = {
                    "raw_markdown": "",
                    "markdown_with_citations": "",
                    "references_markdown": "",
                }
            meta = r["metadata"]
            cols["url"].append(url)
            cols["success"].append(r["success"])
            cols["status_code"].append(200 if r["success"] else 0)
            cols["title"].append(meta.get("title", ""))
            cols["metadata"].append(json.dumps(meta, sort_keys=True, ensure_ascii=False))
            cols["cleaned_html"].append(r["cleaned_html"])
            cols["fit_html"].append(r["fit_html"])
            cols["markdown"].append(md["raw_markdown"])
            cols["markdown_citations"].append(md["markdown_with_citations"])
            cols["references_markdown"].append(md["references_markdown"])
            cols["text"].append(r["text"])
            cols["links_internal"].append(_link_rows(r["links_internal"]))
            cols["links_external"].append(_link_rows(r["links_external"]))
            cols["images"].append(_image_rows(r["images"]))
            cols["videos"].append(r["videos"])
            cols["audios"].append(r["audios"])
            cols["tables"].append(json.dumps(r["tables"], ensure_ascii=False))
            cols["n_links"].append(len(r["links_internal"]) + len(r["links_external"]))
            cols["n_images"].append(len(r["images"]))
        arrays = [
            pa.array(cols[f.name], type=f.type) for f in DOCS_SCHEMA
        ]
        assert all(len(a) == n for a in arrays)
        out = pa.Table.from_arrays(arrays, schema=DOCS_SCHEMA)
        # pass through frontier bookkeeping columns when present (depth,
        # parent_url, score ride along from the fetch stage)
        for name in ("depth", "parent_url", "score"):
            if name in batch.column_names:
                out = out.append_column(name, batch.column(name))
        return out

"""Deterministic Common-Crawl-style ``pages`` corpus.

BASELINE.json's input_hint mandates a Parquet table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``;
the driver's testdata has no such table, so we synthesise one — fully
deterministically — from ``documents.parquet`` of a given sf_dir. The same
construction is reproducible in ANSI SQL (see ``pipelines/queries.py``), which
is what makes the DuckDB oracle able to check the Ray crawl pipeline
end-to-end (link extraction, normalization, BFS waves).

Construction (all arithmetic on doc_id, N = row count of documents):

- host_id  = 0 if doc_id % 7 == 0 else doc_id % 50          (host 0 is the
  deliberate heavy-hitter ≈16% of the corpus — exercises skew handling)
- host     = f"site{host_id}.example.com"
- url      = f"https://{host}/page/{doc_id}"
- outlinks = (2*doc_id+1) % N, (2*doc_id+2) % N, (7*doc_id+3) % N, written
  into the HTML as three different anchor styles (clean absolute / absolute
  with tracking params + fragment / scheme-relative) that all canonicalize
  back to the target's clean url — plus a root-relative "/" home link, one
  external link and one mailto (non-crawlable).
- html     = utf-8 page with head metadata, headings, the document's text as
  paragraphs, deterministic extras (list every 5th page, code block every
  7th, data table every 10th, blockquote every 11th, em/strong every 3rd),
  one scored image, and boilerplate footer.
- warc_ts  = 2024-01-01T00:00:00 + doc_id seconds
- text / lang straight from documents.

``replicate`` > 1 tiles the corpus for benchmarking: replica r of doc d gets
doc_id' = d + r*N over a graph of N*replicate nodes (same formulas).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.compute as pc

import ray

PAGES_VERSION = "v2"
N_HOSTS = 50
HEAVY_EVERY = 7  # doc_id % 7 == 0 → host 0
EPOCH = datetime(2024, 1, 1)


def host_id_of(doc_id: int) -> int:
    return 0 if doc_id % HEAVY_EVERY == 0 else doc_id % N_HOSTS


def url_of(doc_id: int) -> str:
    return f"https://site{host_id_of(doc_id)}.example.com/page/{doc_id}"


def children_of(doc_id: int, n: int) -> list[int]:
    return [(2 * doc_id + 1) % n, (2 * doc_id + 2) % n, (7 * doc_id + 3) % n]


def _paragraphs(text: str, width: int = 220, max_paras: int = 6) -> list[str]:
    words = text.split()
    paras, cur, cur_len = [], [], 0
    for w in words:
        cur.append(w)
        cur_len += len(w) + 1
        if cur_len >= width:
            paras.append(" ".join(cur))
            cur, cur_len = [], 0
            if len(paras) >= max_paras:
                return paras
    if cur:
        paras.append(" ".join(cur))
    return paras


def build_html(doc_id: int, n: int, text: str, lang: str) -> str:
    """One synthetic page. Feature coverage follows FIXTURES.md §1's matrix
    (every extraction branch hit on a deterministic doc_id stride); the
    SQL-reconstructable invariants are: exactly one <h1>, the four internal
    link rules (home + c1/c2/c3) plus the %37 query-link, the %7 code
    sample and the %10 data table."""
    host = f"site{host_id_of(doc_id)}.example.com"
    c1, c2, c3 = children_of(doc_id, n)
    h3 = host_id_of(c3)
    paras = _paragraphs(text)
    body = [f"<h1>Page {doc_id}</h1>"]
    for j, p in enumerate(paras):
        if doc_id % 3 == 0 and j == 0:
            body.append(f"<p>{p} This page covers <strong>synthetic</strong> content in <em>{lang}</em>.</p>")
        else:
            body.append(f"<p>{p}</p>")
    if doc_id % 5 == 0:
        nested = (
            "<ul><li>nested one</li><li>nested two</li></ul>"
            if doc_id % 15 == 0
            else ""
        )
        body.append(
            "<ul>"
            + "".join(f"<li>list item {doc_id}-{k}</li>" for k in range(2))
            + f"<li>list item {doc_id}-2{nested}</li></ul>"
        )
    if doc_id % 7 == 0:
        body.append(
            f"<pre><code>def sample_{doc_id}():\n    return {doc_id}\n</code></pre>"
        )
    if doc_id % 10 == 0:
        rows = "".join(
            f"<tr><td>r{doc_id}-{r}</td><td>{(doc_id + r) % 97}</td><td>v{r}</td></tr>"
            for r in range(3)
        )
        body.append(
            f"<table><caption>Stats for page {doc_id}</caption>"
            "<thead><tr><th>name</th><th>count</th><th>val</th></tr></thead>"
            f"<tbody>{rows}</tbody></table>"
        )
    if doc_id % 11 == 0:
        body.append(f"<blockquote>Quoted wisdom number {doc_id}.</blockquote>")
    if doc_id % 17 == 0:
        # layout table: must be rejected by is_data_table (role=presentation)
        body.append(
            '<table role="presentation"><tr><td>layout</td><td>only</td></tr></table>'
        )
    if doc_id % 19 == 0:
        body.append(
            "<ol>" + "".join(f"<li>step {k}</li>" for k in range(1, 4)) + "</ol>"
        )
    if doc_id % 21 == 0:
        body.append(f"<p>Entities &amp; dashes &#8212; for page {doc_id}.</p>")
    if doc_id % 23 == 0:
        body.append(f"<p>line one<br>line two of {doc_id}</p><hr>")
    if doc_id % 43 == 0:
        body.append(
            f"<h3>Sub {doc_id}</h3><p>h3 text</p><h4>Deep</h4><p>h4 text</p>"
            "<h5>Deeper</h5><h6>Deepest</h6>"
        )
    if doc_id % 31 == 0:
        body.append("<p>中文内容测试 — النص العربي here.</p>")
    if doc_id % 29 == 0:
        body.append(
            '<!-- synthetic comment --><form class="promo" action="/sub">'
            '<input name="q" type="text"></form>'
        )
    body.append(f'<h2>Related pages for {doc_id}</h2>')
    body.append(f'<p><a href="{url_of(c1)}">first link {c1}</a></p>')
    body.append(
        f'<p><a href="{url_of(c2)}?utm_source=feed&ref=rss#section-2">second link {c2}</a></p>'
    )
    body.append(f'<p><a href="//site{h3}.example.com/page/{c3}">third link {c3}</a></p>')
    if doc_id % 37 == 0:
        body.append('<p><a href="?page=2">pagination link</a></p>')
    body.append(
        f'<p><a href="https://www.external-site.org/ref/{doc_id}" title="ext">external resource</a>'
        f' and <a href="mailto:info@example.com">contact</a>'
        f' and <a href="javascript:void(0)">noop</a></p>'
    )
    body.append(
        f'<img src="https://img.example.com/img{doc_id}.png" alt="figure {doc_id}" width="320" height="240">'
    )
    if doc_id % 9 == 0:
        body.append(
            f'<img src="https://img.example.com/s{doc_id}.jpg" '
            f'srcset="https://img.example.com/s{doc_id}-640.jpg 640w, '
            f'https://img.example.com/s{doc_id}-1024.jpg 1024w" '
            f'alt="responsive {doc_id}" width="200" height="200">'
        )
    if doc_id % 13 == 0:
        # icon inside a skip-class parent: must be dropped by process_image
        body.append(
            f'<span class="icon"><img src="https://img.example.com/tiny{doc_id}.png"></span>'
        )
    if doc_id % 25 == 0:
        body.append('<img src="data:image/png;base64,AAAA" alt="inline">')
    if doc_id % 27 == 0:
        body.append(
            f'<video width="640"><source src="https://media.example.com/v{doc_id}.mp4" '
            'type="video/mp4"></video>'
            f'<audio><source src="https://media.example.com/a{doc_id}.ogg" '
            'type="audio/ogg"></audio>'
        )
    body.append(f'<p class="footer">Footer boilerplate for {host}.</p>')
    extra_meta = (
        '<meta name="twitter:card" content="summary">'
        f'<meta property="article:author" content="gen-{doc_id}">'
        if doc_id % 3 == 0
        else ""
    )
    return (
        "<html><head>"
        f"<title>Page {doc_id} — {host}</title>"
        f'<meta name="description" content="Synthetic page {doc_id} in lang {lang}">'
        f'<meta name="keywords" content="synthetic,crawl,page{doc_id}">'
        '<meta name="author" content="corpus-generator">'
        f'<meta property="og:title" content="OG Page {doc_id}">'
        + extra_meta
        + "<script>var x = 1;</script><style>body { margin: 0 }</style>"
        "</head><body>"
        '<nav class="menu"><a href="/">home</a></nav>'
        + "".join(body)
        + "</body></html>"
    )


class _MakePages:
    """map_batches UDF: documents batch → pages batch (Arrow in/out)."""

    def __init__(self, n_docs: int, replicate: int):
        self.n_docs = n_docs
        self.replicate = replicate
        self.n_total = n_docs * replicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
        for r in range(self.replicate):
            off = r * self.n_docs
            for d, t, lg in zip(doc_ids, texts, langs):
                pid = d + off
                urls.append(url_of(pid))
                tss.append(EPOCH + timedelta(seconds=pid))
                htmls.append(build_html(pid, self.n_total, t, lg).encode("utf-8"))
                out_texts.append(t)
                out_langs.append(lg)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(out_texts, pa.string()),
                "lang": pa.array(out_langs, pa.string()),
            }
        )


def synthesize_pages(sf_dir: str, replicate: int = 1) -> str:
    """Materialise (once) the pages corpus for sf_dir; returns the cache dir.

    Output is partitioned Parquet under /tmp so repeat runs (tests, bench,
    driver checks) skip the synth; the cache key covers sf_dir, generator
    version and replication factor.
    """
    key = hashlib.md5(
        f"{os.path.realpath(sf_dir)}|{PAGES_VERSION}|{replicate}".encode()
    ).hexdigest()[:16]
    out_dir = f"/tmp/crawl4ai_ray_cache/pages_{key}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    n_docs = docs.count()
    pages = docs.map_batches(
        _MakePages(n_docs, replicate), batch_format="pyarrow", batch_size=256
    )
    os.makedirs(out_dir, exist_ok=True)
    pages.write_parquet(out_dir)
    with open(done, "w") as f:
        f.write(PAGES_VERSION)
    return out_dir


def read_pages(sf_dir: str, replicate: int = 1, columns=None) -> "ray.data.Dataset":
    """The engine's canonical input: a Dataset over the pages corpus.

    ``columns`` prunes at the read (e.g. frontier stages never load html).
    """
    out_dir = synthesize_pages(sf_dir, replicate)
    return ray.data.read_parquet(out_dir, columns=columns)


def n_pages(sf_dir: str, replicate: int = 1) -> int:
    import pyarrow.parquet as pq

    meta = pq.read_metadata(os.path.join(sf_dir, "documents.parquet"))
    return meta.num_rows * replicate

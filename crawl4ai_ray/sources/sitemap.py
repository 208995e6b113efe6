"""Sitemap synthesis + distributed sitemap parsing.

Reference parity: ``AsyncUrlSeeder._iter_sitemap``
(/root/reference/crawl4ai/async_url_seeder.py:830-960) — a sitemap body
is either a sitemap INDEX (``<sitemap><loc>`` entries → recurse into each
sub-sitemap) or a leaf urlset (``<url><loc>`` → yield the stripped text),
parsed with a namespace-stripped ``xml.etree.ElementTree`` (the
reference's non-lxml fallback path, :885-910), then glob-filtered
(``_match(u, pattern)``, :803). The reference walks ONE domain's sitemaps
over the network; here the sitemap corpus is a table
``(sitemap_url, host, body)`` and the parse fans out over every host at
once — each recursion level is one ``map_batches`` pass over only the
bodies referenced so far (a broadcast semi-join on sitemap_url, so leaf
bodies never parse before something links to them, exactly like the
reference's traversal).

Scale notes: sitemap tables are tiny next to the page corpus (≤ a few
rows per host), but the parse is still streaming — bodies stay in Arrow
blocks, each level moves only (kind, loc, lastmod, priority) rows, and
the driver holds only the frontier of *sitemap urls* (bounded by
#hosts × sub-sitemaps per level, like the crawl frontier's admitted
slice). Recursion depth in the wild is ≤3 (index → sub-index → leaf).

Synthesis (offline stand-in for the network fetch): each host of the
pages universe gets a root index ``https://{host}/sitemap_index.xml``
listing two sub-sitemaps ``sitemap-0.xml`` / ``sitemap-1.xml`` (split by
doc_id parity); each sub-sitemap is a urlset carrying
``<loc>/<lastmod>/<priority>`` per page url, with lastmod/priority
derived from the same multiplicative hash as stages/sampling.py —
int64-exact, so a SQL oracle reproduces every field bit-for-bit.
"""

from __future__ import annotations

import fnmatch
import re
import xml.etree.ElementTree as ET
from datetime import date, timedelta

import pyarrow as pa

import ray

_MULT = 2654435761
_ADD = 12345
_MOD = 1000000007
_EPOCH = date(2024, 1, 1)
_XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _doc_hash(doc_id: int) -> int:
    return (doc_id * _MULT + _ADD) % _MOD


def lastmod_of(doc_id: int) -> str:
    return (_EPOCH + timedelta(days=_doc_hash(doc_id) % 365)).isoformat()


def priority_of(doc_id: int) -> float:
    return (_doc_hash(doc_id) % 9 + 1) / 10.0


def build_sitemap_table(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Derive the per-host sitemap corpus from the pages universe.

    Two tiny shuffles over (host, sub, url) triples — the page BODIES never
    enter this pipeline (callers pass a ``columns=["url"]``-pruned read):

    1. groupby(host, sub) → one leaf urlset body per group (urls sorted so
       the body bytes are deterministic under any block layout);
    2. groupby(host) over the leaf rows' (host, sitemap_url) → one root
       index body per host listing its sub-sitemaps.

    Returns a Dataset (sitemap_url, host, body).
    """

    def tag(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts, subs = [], []
        for u in urls:
            host = u.split("://", 1)[-1].split("/", 1)[0]
            doc_id = int(u.rsplit("/", 1)[-1])
            hosts.append(host)
            subs.append(doc_id % 2)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "sub": pa.array(subs, pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )

    def leaf_body(group: pa.Table) -> pa.Table:
        host = group.column("host")[0].as_py()
        sub = group.column("sub")[0].as_py()
        parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{_XMLNS}">']
        for u in sorted(group.column("url").to_pylist()):
            doc_id = int(u.rsplit("/", 1)[-1])
            parts.append(
                "  <url>"
                f"<loc> {u} </loc>"  # stray spaces: the parser must strip()
                f"<lastmod>{lastmod_of(doc_id)}</lastmod>"
                f"<priority>{priority_of(doc_id):.1f}</priority>"
                "</url>"
            )
        parts.append("</urlset>")
        return pa.table(
            {
                "sitemap_url": pa.array(
                    [f"https://{host}/sitemap-{sub}.xml"], pa.string()
                ),
                "host": pa.array([host], pa.string()),
                "body": pa.array(["\n".join(parts)], pa.string()),
            }
        )

    leaves = (
        pages.map_batches(tag, batch_format="pyarrow")
        .groupby(["host", "sub"])
        .map_groups(leaf_body, batch_format="pyarrow")
    )

    def index_body(group: pa.Table) -> pa.Table:
        host = group.column("host")[0].as_py()
        locs = sorted(group.column("sitemap_url").to_pylist())
        parts = [
            f'<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex xmlns="{_XMLNS}">'
        ]
        for loc in locs:
            parts.append(f"  <sitemap><loc>{loc}</loc></sitemap>")
        parts.append("</sitemapindex>")
        return pa.table(
            {
                "sitemap_url": pa.array(
                    [f"https://{host}/sitemap_index.xml"], pa.string()
                ),
                "host": pa.array([host], pa.string()),
                "body": pa.array(["\n".join(parts)], pa.string()),
            }
        )

    indexes = (
        leaves.select_columns(["sitemap_url", "host"])
        .groupby("host")
        .map_groups(index_body, batch_format="pyarrow")
    )
    return leaves.union(indexes)


def _strip_ns(root: ET.Element) -> None:
    # reference fallback path (async_url_seeder.py:888-892): drop the
    # sitemap namespace from every tag before findall
    for elem in root.iter():
        if "}" in elem.tag:
            elem.tag = elem.tag.split("}", 1)[1]


def parse_sitemap_body(body: str) -> tuple[list[str], list[dict]]:
    """Parse ONE sitemap body → (sub_sitemap_locs, url_entries).

    Mirrors _iter_sitemap's classification (:895-910): the presence of any
    ``<sitemap>`` element makes the document an index (its ``<loc>`` texts
    are sub-sitemaps, regular ``<url>`` entries are then IGNORED — the
    reference only collects regular urls when ``not is_sitemap_index``);
    otherwise every ``<url><loc>`` yields a page url. Unparseable bodies
    yield nothing (the reference logs and returns, :911-915).
    """
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return [], []
    _strip_ns(root)
    subs = []
    for sm in root.findall(".//sitemap"):
        loc = sm.find("loc")
        if loc is not None and loc.text:
            subs.append(loc.text.strip())
    if subs:
        return subs, []
    entries = []
    for u in root.findall(".//url"):
        loc = u.find("loc")
        if loc is None or not loc.text:
            continue
        lastmod = u.find("lastmod")
        prio = u.find("priority")
        entries.append(
            {
                "url": loc.text.strip(),
                "lastmod": lastmod.text.strip() if lastmod is not None and lastmod.text else "",
                "priority": float(prio.text.strip()) if prio is not None and prio.text else 0.5,
            }
        )
    return [], entries


def parse_sitemaps(
    sitemaps: "ray.data.Dataset",
    pattern: str = "*",
    roots: list[str] | None = None,
    max_depth: int = 4,
) -> "ray.data.Dataset":
    """Walk the sitemap corpus from the root indexes, yielding page urls.

    Each level: broadcast the frontier of sitemap urls (bounded —
    #hosts × subs), ONE map_batches over the corpus that parses only
    frontier bodies, collect the (tiny) sub-sitemap refs driver-side for
    the next level, keep the url entries as a Dataset. Page-url rows never
    transit the driver. ``roots=None`` starts from every
    ``.../sitemap_index.xml`` / ``.../sitemap.xml`` body present
    (the reference's default probe locations, :790-800).
    """
    pat_re = re.compile(fnmatch.translate(pattern))

    def level_fn(frontier: set[str]):
        fr = ray.put(frontier)

        def parse(batch: pa.Table) -> pa.Table:
            front = ray.get(fr)
            out = {
                "host": [],
                "kind": [],
                "url": [],
                "lastmod": [],
                "priority": [],
            }
            for sm_url, host, body in zip(
                batch.column("sitemap_url").to_pylist(),
                batch.column("host").to_pylist(),
                batch.column("body").to_pylist(),
            ):
                if sm_url not in front:
                    continue
                subs, entries = parse_sitemap_body(body)
                for s in subs:
                    out["host"].append(host)
                    out["kind"].append("sitemap")
                    out["url"].append(s)
                    out["lastmod"].append("")
                    out["priority"].append(0.0)
                for e in entries:
                    if not pat_re.match(e["url"]):
                        continue
                    out["host"].append(host)
                    out["kind"].append("url")
                    out["url"].append(e["url"])
                    out["lastmod"].append(e["lastmod"])
                    out["priority"].append(e["priority"])
            return pa.table(
                {
                    "host": pa.array(out["host"], pa.string()),
                    "kind": pa.array(out["kind"], pa.string()),
                    "url": pa.array(out["url"], pa.string()),
                    "lastmod": pa.array(out["lastmod"], pa.string()),
                    "priority": pa.array(out["priority"], pa.float64()),
                }
            )

        return sitemaps.map_batches(parse, batch_format="pyarrow")

    if roots is None:
        def root_mask(batch: pa.Table) -> pa.Table:
            keep = [
                u.endswith(("/sitemap_index.xml", "/sitemap.xml"))
                for u in batch.column("sitemap_url").to_pylist()
            ]
            return batch.filter(pa.array(keep)).select(["sitemap_url"])

        roots = [
            r["sitemap_url"]
            for r in sitemaps.map_batches(root_mask, batch_format="pyarrow").take_all()
        ]

    import pyarrow.compute as pc

    def kind_mask(kind: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("kind"), kind))

        return fn

    visited: set[str] = set()
    frontier = set(roots)
    url_levels: list["ray.data.Dataset"] = []
    for _ in range(max_depth):
        if not frontier:
            break
        visited |= frontier
        # materialize the level once (rows are url entries + tiny refs —
        # bodies are NOT in the output schema) so the refs collection and
        # the url slice don't each re-run the parse
        parsed = level_fn(frontier).materialize()
        url_levels.append(
            parsed.map_batches(kind_mask("url"), batch_format="pyarrow").drop_columns(
                ["kind"]
            )
        )
        refs = parsed.map_batches(kind_mask("sitemap"), batch_format="pyarrow")
        frontier = {
            r["url"] for r in refs.select_columns(["url"]).take_all()
        } - visited
    out = url_levels[0]
    for lv in url_levels[1:]:
        out = out.union(lv)
    return out

"""crawl4ai_ray — a Ray-Data-native web-corpus crawl/extract engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference crawler (buizmanager/crawl4ai) on top of ``ray.data.Dataset``:

- columnar Arrow batches end-to-end (``map_batches(batch_format="pyarrow")``)
- stateful stages (URL-seen Bloom shards, politeness/robots) as actor pools
- the crawl frontier as iterative Dataset pipelines (normalize → seen
  anti-join → politeness admission → sort(score)+limit)
- extraction (HTML → cleaned_html/markdown/links/media/tables/metadata) as
  stateless vectorized batch transforms

Nothing here is a code port: semantics were derived from reading the
reference (file:line cites in docstrings); the execution model is Ray Data.
"""

__version__ = "0.1.0"

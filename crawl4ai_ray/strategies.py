"""Strategy-class surface — name-level parity with the reference's ABCs
(SURVEY.md §2.10) so reference user code ports with minimal edits. Each
class delegates to the engine's functional core; any strategy instance is
usable directly as per-row logic inside a ``map_batches`` stage.

Reference ABCs mirrored here:
    ContentScrapingStrategy  (content_scraping_strategy.py:91-98)
    WebScrapingStrategy      (the BS4/LXML implementations' contract)
    MarkdownGenerationStrategy / DefaultMarkdownGenerator
                             (markdown_generation_strategy.py:26-52,55+)
Re-exported from their home modules:
    ExtractionStrategy, JsonCssExtractionStrategy, RegexExtractionStrategy,
    ChunkingStrategy + implementations   (functions/extraction.py)
    RelevantContentFilter, PruningContentFilter, BM25ContentFilter
                                         (functions/content_filter.py)
    LLMExtractionStrategy, LLMContentFilter (functions/llm.py — stubs)
    URLFilter family + URLScorer family  (functions/filters.py)
"""

from __future__ import annotations

from .config import ScrapeConfig
from .functions.content_filter import (  # noqa: F401
    BM25ContentFilter,
    PruningContentFilter,
    RelevantContentFilter,
)
from .functions.extraction import (  # noqa: F401
    ChunkingStrategy,
    CosineStrategy,
    ExtractionStrategy,
    FixedLengthWordChunking,
    IdentityChunking,
    JsonCssExtractionStrategy,
    JsonXPathExtractionStrategy,
    NlpSentenceChunking,
    NoExtractionStrategy,
    OverlappingWindowChunking,
    RegexChunking,
    RegexExtractionStrategy,
    SlidingWindowChunking,
    TopicSegmentationChunking,
)
from .functions.filters import (  # noqa: F401
    CompositeScorer,
    ContentTypeFilter,
    ContentTypeScorer,
    DomainAuthorityScorer,
    DomainFilter,
    FilterChain,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
    URLFilter,
    URLPatternFilter,
    URLScorer,
)
from .functions.llm import LLMContentFilter, LLMExtractionStrategy  # noqa: F401
from .html.markdown import generate_markdown
from .html.scrape import scrape_page


class ContentScrapingStrategy:
    """ABC: scrap(url, html, **kw) -> dict (ScrapingResult fields)."""

    def scrap(self, url: str, html: str, **kwargs) -> dict:  # pragma: no cover
        raise NotImplementedError


class WebScrapingStrategy(ContentScrapingStrategy):
    """The engine's scraper behind the reference's strategy name."""

    def __init__(self, cfg: ScrapeConfig | None = None):
        self.cfg = cfg or ScrapeConfig()

    def scrap(self, url: str, html: str, **kwargs) -> dict:
        r = scrape_page(url, html, self.cfg)
        return {
            "cleaned_html": r["cleaned_html"],
            "success": r["success"],
            "media": {
                "images": r["images"],
                "videos": r["videos"],
                "audios": r["audios"],
                "tables": r["tables"],
            },
            "links": {
                "internal": r["links_internal"],
                "external": r["links_external"],
            },
            "metadata": r["metadata"],
        }


# alias: the reference's fast-path strategy name (LXMLWebScrapingStrategy)
LXMLWebScrapingStrategy = WebScrapingStrategy


class MarkdownGenerationStrategy:
    """ABC: generate_markdown(input_html, base_url, ...) -> result dict."""

    def __init__(self, content_filter: RelevantContentFilter | None = None,
                 content_source: str = "cleaned_html"):
        self.content_filter = content_filter
        self.content_source = content_source

    def generate_markdown(self, input_html: str, base_url: str = "", **kw) -> dict:
        raise NotImplementedError  # pragma: no cover

    def resolve_input_html(
        self, raw_html: str, cleaned_html: str, fit_html: str
    ) -> str:
        """The reference's content_source dispatch (r5 port of
        markdown_generation_strategy.py / tests/general/
        test_content_source_parameter.py): pick which HTML feeds
        markdown generation; unknown values fall back to
        cleaned_html."""
        return {
            "raw_html": lambda: raw_html,
            "cleaned_html": lambda: cleaned_html,
            "fit_html": lambda: fit_html,
        }.get(self.content_source, lambda: cleaned_html)()


class DefaultMarkdownGenerator(MarkdownGenerationStrategy):
    def generate_markdown(
        self, input_html: str, base_url: str = "", citations: bool = True, **kw
    ) -> dict:
        out = generate_markdown(input_html, base_url=base_url, citations=citations)
        fit_md, fit_html = "", ""
        if self.content_filter is not None:
            from .functions.content_filter import fit_markdown as _fit

            fit_md, fit_html = _fit(input_html, self.content_filter)
        out["fit_markdown"] = fit_md
        out["fit_html"] = fit_html
        return out


class BaseDispatcher:
    """Dispatcher ABC (reference async_dispatcher.py:87-117): the unit that
    turns a url list into crawl results. The reference's implementations
    wrap an asyncio session pool; here the engine's Dataset pipeline IS the
    dispatcher, so implementations return Datasets."""

    def __init__(self, rate_limiter=None, monitor=None):
        self.crawler = None
        self.rate_limiter = rate_limiter
        self.monitor = monitor

    def crawl_url(self, url: str, config=None, task_id: str | None = None):
        raise NotImplementedError

    def run_urls(self, urls: list[str], crawler=None, config=None):
        raise NotImplementedError


class RayDatasetDispatcher(BaseDispatcher):
    """Dispatcher over the engine: ``run_urls`` is the fetch⋉extract
    Dataset pipeline for a url subset (the batch analogue of the
    reference's MemoryAdaptiveDispatcher.run_urls); memory adaptivity is
    delegated to Ray Data's streaming backpressure + object-store spill."""

    def __init__(self, pages: "object | str", scrape: ScrapeConfig | None = None,
                 rate_limiter=None, monitor=None):
        super().__init__(rate_limiter, monitor)
        from .api import RayWebCrawler

        self._crawler = RayWebCrawler(pages, scrape)

    def crawl_url(self, url: str, config=None, task_id: str | None = None):
        return self._crawler.run(url)

    def run_urls(self, urls: list[str], crawler=None, config=None):
        return self._crawler.run_many(urls)

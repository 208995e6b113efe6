"""CrawlerHub analogue — domain-pattern → strategy registry (reference
hub.py:1-68 + crawlers/: named custom crawlers like amazon_product /
google_search resolve by URL). Here a registered entry binds a URL glob to
a ScrapeConfig and/or an ExtractionStrategy; ``resolve`` picks the first
matching registration (registration order), falling back to defaults.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass

from .config import ScrapeConfig


@dataclass
class HubEntry:
    name: str
    pattern: re.Pattern
    scrape: ScrapeConfig | None = None
    extraction_strategy: object | None = None
    meta: dict | None = None


class CrawlerHub:
    def __init__(self):
        self._entries: list[HubEntry] = []

    def register(
        self,
        name: str,
        url_pattern: str,
        scrape: ScrapeConfig | None = None,
        extraction_strategy=None,
        **meta,
    ) -> "CrawlerHub":
        self._entries.append(
            HubEntry(
                name=name,
                pattern=re.compile(fnmatch.translate(url_pattern)),
                scrape=scrape,
                extraction_strategy=extraction_strategy,
                meta=meta or None,
            )
        )
        return self

    def resolve(self, url: str) -> HubEntry | None:
        for e in self._entries:
            if e.pattern.match(url):
                return e
        return None

    def get(self, name: str) -> HubEntry | None:
        for e in self._entries:
            if e.name == name:
                return e
        return None

    def names(self) -> list[str]:
        return [e.name for e in self._entries]


# module-level default hub (the reference exposes CrawlerHub.get(name))
default_hub = CrawlerHub()

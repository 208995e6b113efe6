"""LLM-calling strategy stubs — interface parity, no network.

The reference's LLMExtractionStrategy (extraction_strategy.py:479-803) and
LLMContentFilter (content_filter_strategy.py:780-1060) call external model
APIs; this sandbox has no network, so these are explicit stubs that keep
the config surface (provider/instruction/schema/chunking) and the
data-plane plumbing (chunk → prompt → parse) importable and testable. The
``prompt_builder`` path is real; the completion call raises unless a
``completion_fn`` is injected (tests inject a fake).
"""

from __future__ import annotations

import json

from .extraction import ChunkingStrategy, ExtractionStrategy, RegexChunking


class LLMConfig:
    """Provider/config container (async_configs.py LLMConfig surface)."""

    def __init__(self, provider: str = "stub/none", api_token: str | None = None,
                 base_url: str | None = None, **kwargs):
        self.provider = provider
        self.api_token = api_token
        self.base_url = base_url
        self.extra = kwargs


class LLMExtractionStrategy(ExtractionStrategy):
    """Schema/instruction-driven LLM extraction (STUB: completion requires
    an injected ``completion_fn(prompt) -> str``; none is provided in this
    offline build)."""

    input_format = "markdown"

    def __init__(
        self,
        llm_config: LLMConfig | None = None,
        instruction: str | None = None,
        schema: dict | None = None,
        extraction_type: str = "block",
        chunking: ChunkingStrategy | None = None,
        completion_fn=None,
    ):
        self.llm_config = llm_config or LLMConfig()
        self.instruction = instruction
        self.schema = schema
        self.extraction_type = extraction_type
        self.chunking = chunking or RegexChunking()
        self.completion_fn = completion_fn

    def build_prompt(self, url: str, chunk: str) -> str:
        parts = [f"URL: {url}"]
        if self.instruction:
            parts.append(f"Instruction: {self.instruction}")
        if self.schema:
            parts.append(f"Schema: {json.dumps(self.schema, sort_keys=True)}")
        parts.append("Content:\n" + chunk)
        return "\n\n".join(parts)

    def extract(self, url: str, content: str) -> list[dict]:
        if self.completion_fn is None:
            raise NotImplementedError(
                "LLMExtractionStrategy requires a completion_fn (no network/LLM "
                "in this environment); inject one or use JsonCss/Regex strategies"
            )
        out: list[dict] = []
        for chunk in self.chunking.chunk(content):
            resp = self.completion_fn(self.build_prompt(url, chunk))
            try:
                parsed = json.loads(resp)
                out.extend(parsed if isinstance(parsed, list) else [parsed])
            except json.JSONDecodeError:
                out.append({"url": url, "raw": resp})
        return out


class LLMContentFilter:
    """STUB of the LLM fit-markdown filter (content_filter_strategy.py:
    780-1060): keeps the md5-keyed response-cache interface; raises without
    an injected completion_fn."""

    def __init__(self, llm_config: LLMConfig | None = None,
                 instruction: str | None = None, completion_fn=None):
        self.llm_config = llm_config or LLMConfig()
        self.instruction = instruction
        self.completion_fn = completion_fn
        self._cache: dict[str, list[str]] = {}

    def filter_content(self, html: str) -> list[str]:
        import hashlib

        key = hashlib.md5((self.instruction or "").encode() + html.encode()).hexdigest()
        if key in self._cache:
            return self._cache[key]
        if self.completion_fn is None:
            raise NotImplementedError(
                "LLMContentFilter requires a completion_fn (no LLM in this "
                "environment); use PruningContentFilter / BM25ContentFilter"
            )
        resp = self.completion_fn((self.instruction or "") + "\n\n" + html)
        result = [resp]
        self._cache[key] = result
        return result

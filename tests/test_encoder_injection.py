"""Encoder-injection tests: prove the embedding plumbing is encoder-agnostic
and that a model is constructed once per ACTOR, not once per batch.

The reference loads a sentence-transformers model once per strategy instance
(extraction_strategy.py:188-199); our analogue is once per map_batches actor.
These tests swap the default stub for an injected encoder with a DIFFERENT
dimensionality (8 vs EMBED_DIM=64) and count constructions across a
many-batch run — the same swap a production user makes with
make_sentence_transformer_factory.

The injected encoder is built as a CLOSURE (not a module-level class):
tests/ is not an importable package, so a by-reference pickle would fail to
resolve inside Ray workers; cloudpickle serializes closures by value, which
is also how a user's ad-hoc encoder travels.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray

from crawl4ai_ray.stages.embed import (
    EMBED_DIM,
    cosine_sections,
    make_sentence_transformer_factory,
)

COUNTING_DIM = 8


def make_counting_factory(log_path: str):
    """Zero-arg encoder factory: 8-dim deterministic bag-of-words encoder
    that appends one line to ``log_path`` per CONSTRUCTION, so tests can
    count model loads across actors."""

    def factory():
        import numpy as _np

        class _CountingEncoder:
            def __init__(self):
                with open(log_path, "a") as f:
                    f.write(f"{os.getpid()}\n")

            def encode(self, texts):
                out = _np.zeros((len(texts), COUNTING_DIM), dtype=_np.float64)
                for i, t in enumerate(texts):
                    for w in (t or "").lower().split():
                        out[i][sum(map(ord, w)) % COUNTING_DIM] += 1.0
                    n = _np.linalg.norm(out[i])
                    if n > 0:
                        out[i] /= n
                return out

        return _CountingEncoder()

    return factory


def test_injected_encoder_once_per_actor(ray_session, tmp_path):
    log_path = str(tmp_path / "constructions.log")
    factory = make_counting_factory(log_path)

    n_docs, batch_size = 96, 8  # 12 batches through at most 2 actors
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": [f"https://e.com/{i}" for i in range(n_docs)],
                "text": [
                    f"alpha beta gamma doc {i} " + ("filler words " * 30)
                    for i in range(n_docs)
                ],
            }
        )
    ).repartition(12)
    out = cosine_sections(
        ds, concurrency=2, batch_size=batch_size, encoder_factory=factory
    ).to_pandas()

    assert len(out) > 0
    assert set(out["url"]) == {f"https://e.com/{i}" for i in range(n_docs)}
    with open(log_path) as f:
        constructions = len(f.readlines())
    # fixed concurrency=2 actor pool: exactly as many model loads as actors,
    # regardless of how many batches flowed through
    assert 1 <= constructions <= 2, constructions


def test_injected_encoder_changes_output(ray_session, tmp_path):
    """The injected encoder is actually USED: clustering/filtering runs in
    the injected 8-dim space without touching the 64-dim stub path."""
    log_path = str(tmp_path / "used.log")
    factory = make_counting_factory(log_path)
    tbl = pa.table(
        {
            "url": ["https://e.com/a", "https://e.com/b"],
            "text": [
                "machine learning training data pipelines " * 20,
                "completely unrelated gardening tips and soil advice " * 20,
            ],
        }
    )
    ds = ray.data.from_arrow(tbl)
    injected = cosine_sections(
        ds,
        semantic_filter="machine learning",
        concurrency=1,
        encoder_factory=factory,
    ).to_pandas()
    assert COUNTING_DIM != EMBED_DIM
    assert len(injected) >= 1
    assert os.path.getsize(log_path) > 0  # the injected model was loaded


def test_adaptive_embedding_with_injected_encoder(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.adaptive import adaptive_crawl
    from crawl4ai_ray.sources.pages import url_of

    log_path = str(tmp_path / "enc.log")
    factory = make_counting_factory(log_path)
    kwargs = dict(
        seeds=[url_of(0)],
        query="data pipeline",
        strategy="embedding",
        max_waves=2,
        wave_size=5,
        max_pages=10,
        encoder_factory=factory,
    )
    r1 = adaptive_crawl("/root/testdata/sf0.001", **kwargs)
    r2 = adaptive_crawl("/root/testdata/sf0.001", **kwargs)
    assert [w["confidence"] for w in r1.waves] == [
        w["confidence"] for w in r2.waves
    ]
    assert os.path.getsize(log_path) > 0  # the injected encoder ran


def test_sentence_transformer_factory_gated():
    """Production swap path: absent dependency fails at configuration time
    with an actionable message (env has no sentence-transformers)."""
    with pytest.raises(ImportError, match="sentence-transformers"):
        make_sentence_transformer_factory()

"""Adaptive crawling: statistical stopping over best-first waves.

Re-expression of the reference's AdaptiveCrawler / StatisticalStrategy
(adaptive_crawler.py:287-389 confidence = f(coverage, consistency,
saturation); :1266-1468 digest loop): crawl in scored waves, maintain
term statistics over the crawled corpus, stop when confidence crosses the
threshold. Term stats come from distributed per-batch term counting —
coverage only needs the (small) query-term doc frequencies; saturation
tracks the rate of never-before-seen terms per wave via the sharded seen
machinery's exact sets (terms hash like urls do).

State export/import (the reference's KB export, adaptive_crawler.py:
1719-1833) is a parquet dump of crawled docs + term stats + pending
frontier.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa

import ray

from ..config import CrawlConfig
from ..functions.filters import KeywordRelevanceScorer
from .crawl import crawl

_TOKEN_RE = re.compile(r"[a-z0-9]{2,}")


def _doc_term_stats(batch: pa.Table, query_terms: list[str]) -> pa.Table:
    """Per-doc: which query terms occur + the doc's distinct-term hashes
    (as a list column) for saturation tracking."""
    from ..functions.hashing import hash64

    texts = batch.column("text").to_pylist()
    q_hits = np.zeros((len(texts), len(query_terms)), dtype=bool)
    term_lists = []
    for i, t in enumerate(texts):
        toks = set(_TOKEN_RE.findall(t.lower()))
        term_lists.append(
            hash64(sorted(toks)).tolist() if toks else []
        )
        for j, q in enumerate(query_terms):
            q_hits[i, j] = q in toks
    cols = {
        "url": batch.column("url"),
        "terms": pa.array(term_lists, pa.list_(pa.uint64())),
    }
    for j, q in enumerate(query_terms):
        cols[f"has_{j}"] = pa.array(q_hits[:, j].tolist(), pa.bool_())
    return pa.table(cols)


class AdaptiveCrawlResult:
    def __init__(self):
        self.waves: list[dict] = []
        self.confidence = 0.0
        self.stopped_reason = ""
        self.pages_crawled = 0
        self.query_coverage = 0.0
        self.metrics: dict = {}


def _expand_query(query: str, n_variations: int = 10) -> list[str]:
    """Deterministic stand-in for the reference's LLM query expansion
    (adaptive_crawler.py:666-738 map_query_semantic_space: LLM generates
    ~n·1.3 phrasings; no LLM in this sandbox): variations are the query
    with one term dropped and one term emphasized, cycled over terms —
    nearby points in the stub-embedding space, exactly what the coverage
    model needs. Returns [query] + up to n_variations variants."""
    terms = _TOKEN_RE.findall(query.lower())
    out, seen = [query], {query}
    i = 0
    while len(out) < n_variations + 1 and terms and i < 4 * n_variations:
        k = i % len(terms)
        for cand in (
            " ".join(terms[:k] + terms[k + 1 :]),
            " ".join(terms + [terms[k]]),
        ):
            if cand and cand not in seen and len(out) < n_variations + 1:
                seen.add(cand)
                out.append(cand)
        i += 1
    return out


def _split_train_val(variations: list[str], seed: int = 42):
    """80/20 train/validation split with the original query pinned to the
    train side (adaptive_crawler.py:721-731; deterministic RNG here)."""
    import random

    others = variations[1:]
    rng = random.Random(seed)
    rng.shuffle(others)
    n_val = max(2, int(len(others) * 0.2)) if len(others) > 2 else 0
    val = others[len(others) - n_val :]
    train = [variations[0]] + others[: len(others) - n_val]
    return train, val


class EmbeddingGapScorer:
    """URL scorer steering the best-first frontier toward semantic coverage
    gaps — the frontier-side analogue of the reference's
    select_links_for_expansion (adaptive_crawler.py:804-925: score links by
    how much they reduce query-space gaps). Links here are scored by the
    best cosine between the stub-embedded URL tokens and the current GAP
    query points (uncovered variations); covered directions contribute
    nothing, so the crawl spends its budget where coverage is missing."""

    def __init__(self, gap_vecs: np.ndarray, weight: float = 1.0, encoder_factory=None):
        from ..stages.embed import TinyHashEmbedder

        self._gaps = np.asarray(gap_vecs, dtype=np.float64)
        self._model = (encoder_factory or TinyHashEmbedder)()
        self.weight = weight

    def _url_text(self, url: str) -> str:
        tail = url.split("://", 1)[-1]
        return " ".join(_TOKEN_RE.findall(tail.lower()))

    def score_batch(self, urls) -> np.ndarray:
        if not len(self._gaps):
            return np.zeros(len(urls), dtype=np.float64)
        texts = [self._url_text(u) for u in urls]
        emb = self._model.encode(texts)  # rows normalized (or zero)
        g = self._gaps / np.maximum(
            np.linalg.norm(self._gaps, axis=1, keepdims=True), 1e-12
        )
        sims = emb @ g.T  # (n, n_gaps)
        return self.weight * np.maximum(sims.max(axis=1), 0.0)

    def score(self, url: str) -> float:
        return float(self.score_batch([url])[0])


def _wave_best_sims(docs, qmat: np.ndarray, encoder_factory=None) -> np.ndarray:
    """Distributed per-wave coverage update: per batch, max cosine of each
    query variation vs the batch's doc embeddings; the driver folds batch
    maxima into the running best. The KB's embeddings are never collected —
    only a (n_queries,) vector per batch moves (the scale-correct form of
    the reference's kb_embeddings distance matrix, adaptive_crawler.py:
    622-660, 925-950)."""
    qref = ray.put(np.asarray(qmat, dtype=np.float64))

    def per_batch(batch: pa.Table) -> pa.Table:
        from ..stages.embed import TinyHashEmbedder

        q = ray.get(qref)
        texts = [t or "" for t in batch.column("text").to_pylist()]
        if not texts:
            return pa.table({"best": pa.array([], pa.list_(pa.float64()))})
        # rows normalized (or zero); per-batch encoder build is fine here —
        # this closure is a stateless task, not an actor stage
        d = (encoder_factory or TinyHashEmbedder)().encode(texts)
        sims = q @ d.T
        return pa.table(
            {"best": pa.array([sims.max(axis=1).tolist()], pa.list_(pa.float64()))}
        )

    out = docs.map_batches(per_batch, batch_format="pyarrow")
    best = np.full(len(qmat), -1.0)
    for row in out.take_all():
        best = np.maximum(best, np.asarray(row["best"], dtype=np.float64))
    return best


def adaptive_crawl(
    pages_sf_dir: str,
    seeds: list[str],
    query: str,
    confidence_threshold: float = 0.75,
    max_waves: int = 8,
    wave_size: int = 10,
    max_pages: int = 100,
    out_dir: str | None = None,
    strategy: str = "statistical",
    n_query_variations: int = 10,
    coverage_threshold: float = 0.85,
    coverage_radius: float = 0.2,
    min_confidence: float = 0.05,
    encoder_factory=None,
) -> AdaptiveCrawlResult:
    """Best-first crawl steered by ``query`` with adaptive stopping.

    strategy='statistical' (default): stops on confidence = 0.4·coverage +
    0.4·(1 − saturation) + 0.2·consistency (the reference's three-signal
    blend, adaptive_crawler.py:287-389).

    strategy='embedding' (adaptive_crawler.py:593-960): the query is
    expanded into a deterministic point cloud of variations (LLM expansion
    stand-in), split train/validation; each wave updates, DISTRIBUTED, the
    best cosine between every variation and the crawled corpus; confidence
    is the mean best similarity over train variations
    (calculate_confidence, ibid:925-950); uncovered variations (cosine
    distance > coverage_radius) are the gaps that steer the next burst's
    frontier scoring (EmbeddingGapScorer); stops when confidence ≥
    coverage_threshold, or immediately as 'irrelevant' when the corpus
    can't reach min_confidence (embedding_min_confidence_threshold,
    ibid:185-187).
    """
    query_terms = sorted(set(_TOKEN_RE.findall(query.lower())))
    res = AdaptiveCrawlResult()
    seen_terms: set[int] = set()
    covered = np.zeros(len(query_terms), dtype=bool)
    prev_new_rates: list[float] = []

    # --- embedding-strategy state
    train_q = val_q = None
    qmat = None
    running_best = None
    n_train = 0
    if strategy == "embedding":
        from ..stages.embed import TinyHashEmbedder

        variations = _expand_query(query, n_query_variations)
        train_q, val_q = _split_train_val(variations)
        n_train = len(train_q)
        qmat = (encoder_factory or TinyHashEmbedder)().encode(train_q + val_q)
        running_best = np.full(len(qmat), -1.0)

    from ..sources.pages import read_pages

    pages = read_pages(pages_sf_dir, columns=["url", "html"])

    pending_state = None
    seen_payloads = None
    start_wave = 0
    crawled = 0

    while len(res.waves) < max_waves and crawled < max_pages:
        if strategy == "embedding":
            gap_mask = (1.0 - running_best[:n_train]) > coverage_radius
            gap_vecs = qmat[:n_train][gap_mask]
            scorer = EmbeddingGapScorer(
                gap_vecs if len(gap_vecs) else qmat[:n_train],
                weight=1.0,
                encoder_factory=encoder_factory,
            )
        else:
            scorer = KeywordRelevanceScorer(query_terms or ["page"], weight=1.0)
        cfg = CrawlConfig(
            strategy="best_first",
            max_depth=10,
            max_pages=crawled + wave_size,
            seen_shards=4,
            url_scorer=scorer,
        )
        run = crawl(
            pages,
            seeds=seeds if pending_state is None else [],
            cfg=cfg,
            pending0=pending_state,
            seen_payloads=seen_payloads,
            start_wave=start_wave,
            pages_crawled0=crawled,
        )
        if not run.waves:
            res.stopped_reason = "frontier_exhausted"
            break
        docs = run.docs_dataset()
        wave_stats = {"wave": len(res.waves), "pages": run.pages_crawled - crawled}
        crawled = run.pages_crawled

        if strategy == "embedding":
            if docs is not None and wave_stats["pages"] > 0:
                wave_best = _wave_best_sims(docs, qmat, encoder_factory)
                running_best = np.maximum(running_best, wave_best)
            train_best = running_best[:n_train]
            confidence = float(np.maximum(train_best, 0.0).mean())
            n_gaps = int(((1.0 - train_best) > coverage_radius).sum())
            coverage_score = 1.0 - n_gaps / max(1, n_train)
            wave_stats.update(
                coverage=coverage_score,
                confidence=confidence,
                avg_best_similarity=float(train_best.mean()),
                gaps=n_gaps,
            )
            res.waves.append(wave_stats)
            res.confidence = confidence
            res.query_coverage = coverage_score
            res.pages_crawled = crawled
            res.metrics = {
                "avg_best_similarity": float(train_best.mean()),
                "val_confidence": float(
                    np.maximum(running_best[n_train:], 0.0).mean()
                )
                if len(running_best) > n_train
                else confidence,
            }
            if confidence >= coverage_threshold:
                res.stopped_reason = "confidence"
                break
            if confidence < min_confidence:
                # query and corpus are unrelated — stop rather than burn
                # budget (embedding_min_confidence_threshold semantics,
                # adaptive_crawler.py:185-187)
                res.stopped_reason = "irrelevant"
                break
            pending_state = run.final_pending
            seen_payloads = run.seen_payloads
            start_wave = run.waves[-1]["wave"] + 1
            if pending_state.num_rows == 0:
                res.stopped_reason = res.stopped_reason or "frontier_exhausted"
                break
            continue

        if docs is not None and wave_stats["pages"] > 0:
            stats = docs.map_batches(
                lambda b: _doc_term_stats(b, query_terms), batch_format="pyarrow"
            )
            parts = [p for p in (ray.get(r) for r in stats.to_arrow_refs()) if p.num_rows]
            tbl = pa.concat_tables(parts) if parts else None
            if tbl is not None and tbl.num_rows:
                for j in range(len(query_terms)):
                    if pa.compute.any(tbl.column(f"has_{j}")).as_py():
                        covered[j] = True
                wave_terms: set[int] = set()
                for lst in tbl.column("terms").to_pylist():
                    wave_terms.update(lst)
                new_terms = wave_terms - seen_terms
                new_rate = len(new_terms) / max(1, len(wave_terms))
                seen_terms |= wave_terms
                prev_new_rates.append(new_rate)
        coverage = float(covered.mean()) if len(query_terms) else 1.0
        saturation = prev_new_rates[-1] if prev_new_rates else 1.0
        if len(prev_new_rates) >= 2:
            consistency = 1.0 - abs(prev_new_rates[-1] - prev_new_rates[-2])
        else:
            consistency = 0.5
        confidence = 0.4 * coverage + 0.4 * (1.0 - saturation) + 0.2 * consistency
        wave_stats.update(
            coverage=coverage,
            saturation=saturation,
            consistency=consistency,
            confidence=confidence,
        )
        res.waves.append(wave_stats)
        res.confidence = confidence
        res.query_coverage = coverage
        res.pages_crawled = crawled

        if confidence >= confidence_threshold:
            res.stopped_reason = "confidence"
            break

        # carry frontier + seen state into the next burst
        pending_state = run.final_pending
        seen_payloads = run.seen_payloads
        start_wave = run.waves[-1]["wave"] + 1
        if pending_state.num_rows == 0:
            res.stopped_reason = res.stopped_reason or "frontier_exhausted"
            break

    if not res.stopped_reason:
        res.stopped_reason = "budget"
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "adaptive_state.json"), "w") as f:
            json.dump(
                {
                    "query_terms": query_terms,
                    "waves": res.waves,
                    "confidence": res.confidence,
                    "stopped_reason": res.stopped_reason,
                    "pages_crawled": res.pages_crawled,
                },
                f,
            )
    return res

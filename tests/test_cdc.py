"""Content-defined chunking (stages/cdc.py): concatenation invariant,
pinned hash spec, and the shift-resilience property that motivates CDC
over fixed-size chunking."""

import hashlib

import numpy as np
import pyarrow as pa

import ray

from crawl4ai_ray.stages import cdc


def _text(n=4000, seed=7):
    # deterministic pseudo-text with word structure
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "web", "crawl", "página", "数据"]
    return " ".join(words[i] for i in rng.integers(0, len(words), n))


def test_chunks_concatenate_to_text():
    for t in ["", "short", _text(), "x" * 7, "y" * 8]:
        assert "".join(cdc.chunk_text(t)) == t


def test_cut_spec_pinned():
    # hand-computed: the rolling hash of the first window of 'abcdefgh...'
    t = "abcdefghij"
    cp = [ord(c) for c in t]
    M, B, W = cdc.CDC_MOD, cdc.CDC_BASE, cdc.CDC_WINDOW
    h0 = sum(cp[j] * pow(B, W - 1 - j, M) for j in range(W)) % M
    cuts = cdc.chunk_cuts(np.array(cp, dtype=np.int64))
    if h0 % cdc.CDC_DIVISOR == 0:
        assert 8 in cuts.tolist()
    else:
        assert 8 not in cuts.tolist() or len(t) == 8
    assert cuts[-1] == len(t)


def test_shift_resilience_beats_fixed_size():
    t = _text()
    shifted = "PREFIX-SHIFT " + t

    def keys(chunks):
        return {hashlib.md5(c.encode()).hexdigest() for c in chunks}

    a, b = keys(cdc.chunk_text(t)), keys(cdc.chunk_text(shifted))
    cdc_shared = len(a & b) / len(a)

    def fixed(s, size=64):
        return [s[i : i + size] for i in range(0, len(s), size)]

    fa, fb = keys(fixed(t)), keys(fixed(shifted))
    fixed_shared = len(fa & fb) / len(fa)

    # CDC re-synchronises after the insertion; fixed-size never does
    assert cdc_shared > 0.9
    assert fixed_shared < 0.1
    assert cdc_shared > fixed_shared


def test_chunk_store_counts():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([_text(), _text(), "unique tiny"], pa.string()),
            }
        )
    )
    store = cdc.chunk_store(docs).to_pandas()
    # doc 1 == doc 2 → every one of their chunks has n_docs == 2
    assert (store["n_docs"] == 2).sum() > 0
    two = store[store["n_docs"] == 2]
    assert (two["n_occurrences"] >= 2).all()
    # total occurrence mass == total chunks emitted
    n_chunks = (
        len(cdc.chunk_text(_text())) * 2 + len(cdc.chunk_text("unique tiny"))
    )
    assert store["n_occurrences"].sum() == n_chunks
    # the unique doc's single chunk appears once
    k = hashlib.md5("unique tiny".encode()).hexdigest()
    row = store[store["chunk_hash"] == k]
    assert len(row) == 1 and row.iloc[0]["n_docs"] == 1

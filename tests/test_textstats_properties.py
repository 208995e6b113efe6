"""Property tests pinning the vectorized text-analysis kernels against
brute-force pure-python references — the polars explode/groupby plans in
stages/textstats.py must agree with naive Counters on arbitrary token
streams (whitespace runs, unicode, repeats, single-token docs)."""

from __future__ import annotations

import collections
import math

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_ray.stages import textstats

_token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
    min_size=1,
    max_size=6,
)
_doc = st.lists(_token, min_size=0, max_size=40).map(" ".join)


def _brute_repetition(text: str):
    toks = text.split()
    if not toks:
        return None
    tc = collections.Counter(toks)
    bc = collections.Counter(zip(toks, toks[1:]))
    return {
        "n_tokens": len(toks),
        "n_distinct": len(tc),
        "max_token_count": max(tc.values()),
        "max_bigram_count": max(bc.values()) if bc else 0,
    }


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_repetition_stats_matches_brute_force(docs):
    batch = pa.table(
        {"doc_id": list(range(len(docs))), "text": docs}
    )
    out = {r["doc_id"]: r for r in textstats.repetition_stats_batch(batch).to_pylist()}
    for i, d in enumerate(docs):
        ref = _brute_repetition(d)
        if ref is None:
            assert i not in out  # empty docs drop, matching the SQL oracle
            continue
        got = out[i]
        for k, v in ref.items():
            assert got[k] == v, (i, k, got, ref)


@settings(max_examples=30, deadline=None)
@given(st.lists(_doc.filter(lambda s: s.strip()), min_size=2, max_size=6))
def test_term_frequency_matches_counter(docs):
    batch = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    tf = textstats.term_frequency_batch(batch).to_pylist()
    got: dict = collections.defaultdict(dict)
    for r in tf:
        got[r["doc_id"]][r["tok"]] = r["tf"]
    for i, d in enumerate(docs):
        assert got[i] == dict(collections.Counter(d.split())), i


def test_tfidf_brute_force_small(ray_session):
    import ray

    docs = ["a b b", "b c", "a a a d"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "text": docs})
    )
    out = textstats.tfidf_top_terms(ds, k=10).to_pandas()
    n = len(docs)
    df = collections.Counter()
    for d in docs:
        df.update(set(d.split()))
    for _, row in out.iterrows():
        tf = collections.Counter(docs[int(row.doc_id)].split())[row.term]
        expect = round(tf * math.log(n / df[row.term]), 8)
        assert abs(row.score - expect) < 1e-9, (row.term, row.score, expect)
    # ranks are contiguous from 1 and ordered by score desc, term asc
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        pairs = list(zip(-grp["score"], grp["term"]))
        assert pairs == sorted(pairs)

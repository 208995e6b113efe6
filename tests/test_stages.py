"""Stage-level tests: extraction batch UDF, dedup families, ANN,
text stats, multimodal plumbing, filters/scorers batch parity."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from crawl4ai_ray.functions.filters import (
    ContentTypeFilter,
    DomainFilter,
    FilterChain,
    KeywordRelevanceScorer,
    PathDepthScorer,
    URLPatternFilter,
)
from crawl4ai_ray.sources.pages import build_html, url_of
from crawl4ai_ray.stages import ann, dedup, textstats
from crawl4ai_ray.stages.extract import ExtractPages


def _page_batch(n=8):
    urls = [url_of(i) for i in range(n)]
    htmls = [build_html(i, 100, "alpha beta gamma " * 40, "en").encode() for i in range(n)]
    return pa.table({"url": urls, "html": htmls})


def test_extract_batch_schema_and_content():
    out = ExtractPages()(_page_batch())
    assert out.num_rows == 8
    assert out.column("success").to_pylist() == [True] * 8
    assert all("# Page" in m for m in out.column("markdown").to_pylist())
    assert all(n >= 4 for n in out.column("n_links").to_pylist())


def test_filters_batch_scalar_parity():
    urls = [
        "https://a.example.com/page/1.html",
        "https://b.other.org/x/y.pdf",
        "https://c.example.com/page/22",
    ]
    for f in (
        URLPatternFilter(["*.example.com/page/*"]),
        DomainFilter(allowed_domains=["example.com"]),
        ContentTypeFilter(["text/html"]),
    ):
        batch = f.apply_batch(urls)
        assert [f.apply(u) for u in urls] == list(batch)
    chain = FilterChain(
        [URLPatternFilter(["*example.com*"]), ContentTypeFilter(["text/html"])]
    )
    mask = chain.apply_batch(urls)
    assert list(mask) == [True, False, True]
    assert chain.stats.total == 3 and chain.stats.passed == 2


def test_scorer_batch_scalar_parity():
    urls = ["https://a.com/x", "https://a.com/x/y/z", "https://a.com/k/x/page/9"]
    for s in (KeywordRelevanceScorer(["page", "x"]), PathDepthScorer(3)):
        assert list(s.score_batch(urls)) == [s.score(u) for u in urls]


def test_exact_dedup(ray_session):
    tbl = pa.table(
        {"doc_id": [0, 1, 2, 3], "text": ["aa", "bb", "aa", "cc"]}
    )
    ds = ray.data.from_arrow(tbl)
    keep = dedup.exact_dedup_keepers(ds).to_pandas()
    kept = set(keep["keep_id"])
    assert kept == {0, 1, 3}


def test_minhash_finds_near_dups(ray_session):
    base = "the quick brown fox jumps over the lazy dog " * 10
    texts = [base, base + "extra", "совершенно другой текст " * 20, "unrelated words entirely " * 20]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": texts}))
    pairs = dedup.minhash_lsh_pairs(ds, num_perm=64, bands=16).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    assert (0, 1) in got
    assert (2, 3) not in got


def test_verify_pairs_sketch_union(ray_session):
    """Sketch-carrying union+groupby verify (no Dataset.join): keeps exactly
    the candidates that pass the exact metric; both modes; matches the
    retained join-based fallback."""
    near_a = "alpha beta gamma delta epsilon zeta eta theta " * 8
    near_b = near_a + "iota"
    texts = [near_a, near_b, "totally different words " * 12, near_a]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2, 3], "text": texts})
    )
    # candidates include one true near-dup, one false candidate, one exact dup
    cands = ray.data.from_arrow(
        pa.table({"a": pa.array([0, 0, 0], pa.int64()),
                  "b": pa.array([1, 2, 3], pa.int64())})
    )
    got = dedup.verify_pairs(cands, docs, mode="jaccard", tau=0.8).to_pandas()
    assert set(map(tuple, got[["a", "b"]].itertuples(index=False))) == {(0, 1), (0, 3)}
    got_eq = dedup.verify_pairs(cands, docs, mode="equal").to_pandas()
    assert set(map(tuple, got_eq[["a", "b"]].itertuples(index=False))) == {(0, 3)}
    # parity with the join fallback
    old = dedup.verify_pairs_join(cands, docs, mode="jaccard", tau=0.8).to_pandas()
    assert set(map(tuple, old[["a", "b"]].itertuples(index=False))) == {(0, 1), (0, 3)}
    # empty candidate set → empty result, not an error
    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    assert dedup.verify_pairs(empty, docs, mode="jaccard").count() == 0


def test_ngram_jaccard():
    a = "one two three four five six seven"
    assert dedup.ngram_jaccard(a, a) == 1.0
    assert dedup.ngram_jaccard(a, "totally different words here now ok") == 0.0


def test_ngram_jaccard_pairs_exact(ray_session):
    """Postings-based exact all-pairs Jaccard: matches the pairwise kernel
    brute force on every pair, including the a<b ordering and tau edge."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [
        base,
        base + "lambda",          # near-dup of 0
        base,                     # exact dup of 0
        "totally different words entirely here now " * 6,
        "",                       # empty → no grams, never paired
    ]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    tau = 0.8
    got = dedup.ngram_jaccard_pairs(ds, tau=tau).to_pandas()
    got_set = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
    want = {
        (i, j)
        for i in ids
        for j in ids
        if i < j and texts[i] and texts[j]
        and dedup.ngram_jaccard(texts[i], texts[j]) >= tau
    }
    assert got_set == want
    assert (0, 2) in got_set and (0, 1) in got_set

    # hot-gram cap path: with every shared gram above the cap the index is
    # empty → no pairs (the documented recall trade), and no errors
    capped = dedup.ngram_jaccard_pairs(ds, tau=tau, max_postings=2)
    assert capped.count() == 0


def test_grouped_topk(ray_session):
    """Map-side-pruned grouped top-k == pandas window over any batch
    layout, including ties (broken by the tie col) and groups < k."""
    import numpy as np
    import pandas as pd

    from crawl4ai_ray.stages.agg import grouped_topk

    rng = np.random.RandomState(3)
    n = 2000
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 50, n),
            "id": np.arange(n),
            "v": rng.randint(0, 20, n).astype(float),  # many ties
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)  # force multi-batch groups
    got = (
        grouped_topk(ds, key="g", value="v", k=3, extra_cols=("id",))
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
    want = want.assign(rank=want.groupby("g").cumcount() + 1)
    want = want[want["rank"] <= 3][["g", "id", "v", "rank"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "id", "v", "rank"]], want, check_dtype=False
    )


def test_redactor_pii_catalog(ray_session):
    from crawl4ai_ray.stages.redact import Redactor, redact

    tbl = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "contact bob@example.com or visit https://x.io/a now",
                "ip 10.0.0.1 and card 4111 1111 1111 1111 ok",
                "nothing to scrub here",
            ],
        }
    )
    r = Redactor(labels=["email", "url", "ipv4", "credit_card"])
    out = r(tbl)
    texts = out.column("text_redacted").to_pylist()
    assert "[EMAIL]" in texts[0] and "[URL]" in texts[0]
    assert "bob@example.com" not in texts[0]
    assert "[IPV4]" in texts[1] and "[CREDIT_CARD]" in texts[1]
    assert texts[2] == "nothing to scrub here"
    assert out.column("n_redacted").to_pylist() == [2, 2, 0]
    # dataset wrapper: actor-pool stage, same results
    ds = ray.data.from_arrow(tbl)
    got = redact(ds, labels=["email", "url", "ipv4", "credit_card"]).to_pandas()
    assert sorted(got["n_redacted"]) == [0, 2, 2]


def test_stratified_sample_and_split(ray_session):
    from crawl4ai_ray.stages import sampling

    tbl = pa.table(
        {
            "doc_id": list(range(1000)),
            "lang": ["en" if i % 2 == 0 else "xx" for i in range(1000)],
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept = sampling.stratified_sample(
        ds, rates={"en": 1.0}, default_rate=0.0
    ).to_pandas()
    # rate 1.0 keeps every en row, default 0.0 drops every other stratum
    assert set(kept["lang"]) == {"en"} and len(kept) == 500
    half = sampling.stratified_sample(ds, rates={"en": 0.5, "xx": 0.5}).to_pandas()
    assert 400 < len(half) < 600  # ~50% of 1000, hash-spread
    # determinism: same ids keep/drop identically across runs
    half2 = sampling.stratified_sample(ds, rates={"en": 0.5, "xx": 0.5}).to_pandas()
    assert sorted(half["doc_id"]) == sorted(half2["doc_id"])

    tagged = sampling.deterministic_split(ds, val_frac=0.2, test_frac=0.1).to_pandas()
    counts = tagged["split"].value_counts()
    assert 150 < counts["val"] < 250 and 50 < counts["test"] < 150
    assert counts.sum() == 1000
    # splits are disjoint by construction and stable under re-run
    tagged2 = sampling.deterministic_split(ds, val_frac=0.2, test_frac=0.1).to_pandas()
    assert tagged.sort_values("doc_id")["split"].tolist() == \
        tagged2.sort_values("doc_id")["split"].tolist()


def test_simhash_near_dups(ray_session):
    # many distinct tokens → stable simhash votes; one-token edit = near-dup
    base = " ".join(f"word{i}" for i in range(120))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [base, base + " extra", " ".join(f"other{i}" for i in range(120))],
            }
        )
    )
    pairs = dedup.simhash_pairs(ds, max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    assert (0, 1) in got and (0, 2) not in got


def test_brute_force_topk_matches_numpy(ray_session):
    rng = np.random.RandomState(0)
    mat = rng.randn(100, 16)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([row.tolist() for row in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    q = np.asarray(tbl.column("embedding").to_pylist()[:2], dtype=np.float64)
    out = ann.brute_force_topk(ds, q, [0, 1], k=5).to_pandas()
    # numpy golden
    m = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn[:2] @ mn.T
    for qid in (0, 1):
        s = sims[qid].copy()
        s[qid] = -np.inf
        golden = set(np.argsort(-s)[:5])
        got = set(out[out.query_id == qid]["neighbor_id"])
        assert got == golden


def test_ivf_recall(ray_session):
    rng = np.random.RandomState(1)
    mat = rng.randn(200, 8)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    q = mat[:3].astype(np.float64)
    exact = ann.brute_force_topk(ds, q, [0, 1, 2], k=5).to_pandas()
    approx = ann.ivf_topk(ds, q, [0, 1, 2], k=5, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # nprobe=4/8 buckets


def test_token_and_quality_stats():
    batch = pa.table({"doc_id": [0, 1], "text": ["Hello, World 42!", "the the a"]})
    t = textstats.token_stats_batch(batch)
    assert t.column("n_tokens").to_pylist() == [3, 3]
    q = textstats.quality_counts_batch(batch)
    assert q.column("n_upper").to_pylist() == [2, 0]
    assert q.column("n_digit").to_pylist() == [2, 0]
    assert q.column("n_stop").to_pylist() == [0, 3]


def test_langid():
    batch = pa.table(
        {
            "doc_id": [0, 1],
            "text": [
                "the cat and the dog walked to the park with it",
                "le chat et la maison est une grande pour les gens",
            ],
        }
    )
    out = textstats.LangId()(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "fr"]


def test_repetition_stats():
    batch = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b a b a", "x y z", "solo"],
        }
    )
    out = textstats.repetition_stats_batch(batch)
    rows = {
        r["doc_id"]: r for r in out.to_pylist()
    }
    # "a b a b a": 5 tokens, 2 distinct, 'a'×3, bigrams: "a b"×2,"b a"×2
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["n_distinct"] == 2
    assert rows[0]["max_token_count"] == 3
    assert rows[0]["max_bigram_count"] == 2
    assert rows[1]["max_token_count"] == 1 and rows[1]["max_bigram_count"] == 1
    # single token: no bigram → 0
    assert rows[2]["n_tokens"] == 1 and rows[2]["max_bigram_count"] == 0


def test_decontaminate(ray_session):
    from crawl4ai_ray.stages.decontaminate import decontaminate

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the quick brown fox jumps",   # shares trigram with bench
                    "totally different words here",
                    "tiny",                         # < n tokens → no n-grams
                ],
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table({"doc_id": [100], "text": ["quick brown fox runs fast"]})
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=3).take_all()}
    assert out[0]["contaminated"] == 1 and out[0]["n_contaminated"] == 1
    assert out[1]["contaminated"] == 0
    assert out[2]["contaminated"] == 0 and out[2]["n_contaminated"] == 0


def test_decontaminate_fuzzy(ray_session):
    """Cross-side near-dup flagging: a corpus doc near-duplicating a bench
    doc is flagged; corpus-internal duplicates are NOT (pairs are strictly
    cross-side); unrelated docs stay clean."""
    from crawl4ai_ray.stages.decontaminate import decontaminate_fuzzy

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    base,                      # near-dup of bench 100
                    base,                      # exact dup of doc 0 — but only
                                               # cross-side pairs count
                    "totally different words here by construction now",
                    "tiny",
                ],
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [100, 101],
                # first token dropped → J = 7/8 ≥ 0.8 vs base
                "text": [" ".join(base.split()[1:]), "unrelated bench content"],
            }
        )
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(corpus, bench, tau=0.8, shingle=3).take_all()
    }
    assert len(out) == 4
    assert out[0]["fuzzy_contaminated"] == 1 and out[0]["n_fuzzy_matches"] == 1
    assert out[1]["fuzzy_contaminated"] == 1  # same text, same cross match
    assert out[2]["fuzzy_contaminated"] == 0
    assert out[3]["fuzzy_contaminated"] == 0 and out[3]["n_fuzzy_matches"] == 0


def test_decontaminate_fuzzy_below_threshold(ray_session):
    """A bench doc sharing SOME grams but below tau must not flag."""
    from crawl4ai_ray.stages.decontaminate import decontaminate_fuzzy

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0],
                "text": ["alpha beta gamma delta epsilon zeta eta theta"],
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [7],
                # shares only the leading grams — J well under 0.8
                "text": ["alpha beta gamma completely other tail words now"],
            }
        )
    )
    out = decontaminate_fuzzy(corpus, bench, tau=0.8, shingle=3).take_all()
    assert out[0]["fuzzy_contaminated"] == 0


def test_fingerprint_deterministic():
    batch = pa.table({"doc_id": [0], "text": ["word " * 50]})
    a = textstats.fingerprint_batch(batch).column("fingerprint").to_pylist()
    b = textstats.fingerprint_batch(batch).column("fingerprint").to_pylist()
    assert a == b and len(a[0]) == 8


def test_hll_distinct(ray_session):
    from crawl4ai_ray.stages.agg import (
        _hll_estimate,
        _hll_registers,
        hll_distinct_per_key,
    )
    from crawl4ai_ray.functions.hashing import hash64

    # accuracy: p=10 → ~3.2% stderr; demand <10% on 5k distinct
    vals = [f"user-{i}" for i in range(5000)]
    est = _hll_estimate(_hll_registers(hash64(vals)))
    assert abs(est - 5000) / 5000 < 0.10, est
    # mergeability: registers from split halves max-merge to the whole
    import numpy as np

    h = hash64(vals)
    merged = np.maximum(_hll_registers(h[:2500]), _hll_registers(h[2500:]))
    assert (merged == _hll_registers(h)).all()
    # dataset path: duplicates don't inflate the estimate
    tbl = pa.table(
        {
            "k": ["a"] * 6000 + ["b"] * 100,
            "v": [i % 2000 for i in range(6000)] + list(range(100)),
        }
    )
    out = {
        r["k"]: r["n_distinct_est"]
        for r in hll_distinct_per_key(
            ray.data.from_arrow(tbl), "k", "v"
        ).take_all()
    }
    assert abs(out["a"] - 2000) / 2000 < 0.10, out
    assert abs(out["b"] - 100) / 100 < 0.10, out


def test_heavy_hitters_exact_vs_brute(ray_session):
    """Two-phase MG sketch-then-verify must equal brute-force
    GROUP BY + HAVING on a skewed stream, across phis and block splits
    (many small blocks = many independent sketches to merge)."""
    import collections
    import random

    from crawl4ai_ray.stages.agg import heavy_hitters

    rng = random.Random(7)
    # zipf-ish: key i appears ~ n/(i+1) times
    vals = []
    for i in range(40):
        vals += [f"k{i:02d}"] * (2000 // (i + 1))
    rng.shuffle(vals)
    truth = collections.Counter(vals)
    n = len(vals)

    # many tiny blocks so the mergeable-summary path is truly exercised
    ds = ray.data.from_arrow(
        pa.table({"host": pa.array(vals, pa.string())})
    ).repartition(20)
    for phi in (0.02, 0.05, 0.15):
        got = {
            r["host"]: r["n"]
            for r in heavy_hitters(ds, "host", phi=phi).take_all()
        }
        want = {k: c for k, c in truth.items() if c > phi * n}
        assert got == want, (phi, got, want)


def test_heavy_hitters_degenerate(ray_session):
    """All-equal batches (MG summary cancels to zero inside a block) must
    not lose the block's row count from the n total."""
    from crawl4ai_ray.stages.agg import heavy_hitters

    # k=ceil(2/0.4)=5; a block of 6+ distinct equal-count keys cancels
    vals = [f"x{i}" for i in range(8)] * 3 + ["hot"] * 30
    ds = ray.data.from_arrow(
        pa.table({"host": pa.array(vals, pa.string())})
    ).repartition(6)
    got = {
        r["host"]: r["n"]
        for r in heavy_hitters(ds, "host", phi=0.4).take_all()
    }
    assert got == {"hot": 30}, got


def test_distinct_count_null_semantics(ray_session):
    from crawl4ai_ray.stages.agg import distinct_count_per_key

    tbl = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "v": pa.array([1, 1, None, None, 2], pa.int64()),
        }
    )
    out = {
        r["k"]: r["n_distinct"]
        for r in distinct_count_per_key(ray.data.from_arrow(tbl), "k", "v").take_all()
    }
    # SQL COUNT(DISTINCT v): NULLs don't count
    assert out == {"a": 1, "b": 1}


def test_exact_percentiles_empty(ray_session):
    from crawl4ai_ray.stages.agg import exact_percentiles

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    out = exact_percentiles(ds, "v", (0.5,))
    assert out.num_rows == 0


def test_exact_percentiles(ray_session):
    from crawl4ai_ray.stages.agg import exact_percentiles

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(list(range(1, 11)), pa.int64())})
    )
    out = exact_percentiles(ds, "v", (0.5, 0.99)).to_pylist()
    got = {r["pct"]: r["value"] for r in out}
    # percentile_disc: rank ceil(p*N) of the sorted column (1-indexed)
    assert got[0.5] == 5    # ceil(0.5*10) = 5 → 5th value
    assert got[0.99] == 10  # ceil(9.9) = 10 → last value


def test_tfidf_top_terms(ray_session):
    import math

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "apple apple banana",   # apple: tf2, rare-ish
                    "banana cherry",
                    "banana banana banana",
                ],
            }
        )
    )
    out = textstats.tfidf_top_terms(docs, k=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    # apple appears in 1/3 docs with tf=2 → 2*ln(3); banana in 3/3 → idf 0
    assert list(d0["term"]) == ["apple", "banana"]
    assert abs(d0["score"].iloc[0] - 2 * math.log(3)) < 1e-8
    assert d0["score"].iloc[1] == 0.0
    # every doc emits at most k rows, ranks are 1..k
    assert out.groupby("doc_id")["rank"].max().le(2).all()


def test_pagerank_matches_numpy(ray_session):
    from crawl4ai_ray.stages.graph import pagerank

    # 4-node graph: 0→1, 0→2, 1→2, 2→0, 3→2 (node 3 has no in-links)
    e = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    outdeg = {0: 2, 1: 1, 2: 1, 3: 1}
    nodes = ray.data.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3], pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in e], pa.int64()),
                "dst": pa.array([d for _, d in e], pa.int64()),
                "w": pa.array([1.0 / outdeg[s] for s, _ in e], pa.float64()),
            }
        )
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, n_iters=5, num_partitions=2).take_all()
    }
    # numpy reference, same formula
    r = np.full(4, 0.25)
    for _ in range(5):
        nxt = np.full(4, 0.15 / 4)
        for s, d in e:
            nxt[d] += 0.85 * r[s] / outdeg[s]
        r = nxt
    for i in range(4):
        assert abs(got[i] - r[i]) < 1e-7, (i, got[i], r[i])
    # node 3 keeps exactly the teleport mass
    assert abs(got[3] - 0.15 / 4) < 1e-9


def test_warc_roundtrip_bytes(ray_session, tmp_path):
    """Byte-lossless sink→source round trip, including payloads with
    non-UTF8 bytes and embedded CRLFCRLF (the record separator)."""
    from datetime import datetime

    from crawl4ai_ray.sources.warc import read_warc, write_warc

    payloads = {
        "https://a.example.com/x": b"<html>\xff\xfe raw \r\n\r\n tail</html>",
        "https://b.example.com/y": "unicode <p>é中</p>".encode(),
        "https://c.example.com/empty": b"",
    }
    ts = datetime(2024, 1, 2, 3, 4, 5)
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(list(payloads), pa.string()),
                "warc_ts": pa.array([ts] * 3, pa.timestamp("us")),
                "html": pa.array(list(payloads.values()), pa.binary()),
            }
        )
    )
    man = write_warc(pages, str(tmp_path)).take_all()
    assert sum(r["n_records"] for r in man) == 3
    back = {r["url"]: r for r in read_warc(str(tmp_path)).take_all()}
    assert back.keys() == payloads.keys()
    for u, p in payloads.items():
        assert back[u]["html"] == p, u
        assert back[u]["digest_ok"] is True or back[u]["digest_ok"] == True  # noqa: E712
        assert back[u]["warc_ts"] == ts


def test_warc_digest_detects_corruption():
    import hashlib
    from datetime import datetime

    from crawl4ai_ray.sources.warc import (
        _http_payload,
        _parse_warc_stream,
        _record_bytes,
    )

    rec = _record_bytes("https://a/x", datetime(2024, 1, 1), b"payload bytes")
    bad = rec.replace(b"payload bytes", b"tampered byte")  # same length
    ((h, block),) = list(_parse_warc_stream(bad))
    got = "md5:" + hashlib.md5(_http_payload(block)).hexdigest()
    assert h["WARC-Payload-Digest"] != got


def test_warc_write_deterministic(ray_session, tmp_path):
    """Same rows → byte-identical shard under the same name (idempotent,
    resumable sink)."""
    from datetime import datetime

    from crawl4ai_ray.sources.warc import write_warc

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://a/1", "https://a/2"], pa.string()),
                "warc_ts": pa.array(
                    [datetime(2024, 1, 1)] * 2, pa.timestamp("us")
                ),
                "html": pa.array([b"one", b"two"], pa.binary()),
            }
        )
    )
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    p1 = write_warc(pages, d1).take_all()
    p2 = write_warc(pages, d2).take_all()
    assert [r["n_records"] for r in p1] == [r["n_records"] for r in p2]
    import os as _os

    f1 = sorted(_os.listdir(d1))
    f2 = sorted(_os.listdir(d2))
    assert f1 == f2
    for f in f1:
        with open(_os.path.join(d1, f), "rb") as a, open(
            _os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read()


def test_rollup_stats(ray_session):
    from crawl4ai_ray.stages.agg import rollup_stats

    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": ["en", "en", "de", "de", "de"],
                "source": ["web", "wiki", "web", "web", "wiki"],
                "n": pa.array([1, 2, 4, 8, 16], pa.int64()),
            }
        )
    )
    rows = {
        (r["lang"], r["source"]): r
        for r in rollup_stats(ds, ["lang", "source"], "n").take_all()
    }
    assert rows[("en", "web")]["n_rows"] == 1 and rows[("en", "web")]["sum_n"] == 1
    assert rows[("de", "web")]["n_rows"] == 2 and rows[("de", "web")]["sum_n"] == 12
    assert rows[("en", "ALL")]["sum_n"] == 3
    assert rows[("de", "ALL")]["sum_n"] == 28
    assert rows[("ALL", "ALL")]["n_rows"] == 5 and rows[("ALL", "ALL")]["sum_n"] == 31
    assert len(rows) == 4 + 2 + 1


def test_minhash_index_build_probe(ray_session, tmp_path):
    """Persisted LSH index: a near-dup probe doc finds its indexed twin,
    an unrelated probe finds nothing; bytes-scanned telemetry reports the
    pruned read; a tampered spec refuses to probe."""
    import json
    import os

    base = " ".join(f"tok{i}" for i in range(40))
    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": [base, "completely different indexed text body here"],
            }
        )
    )
    idx = str(tmp_path / "mhidx")
    dedup.build_minhash_index(old, idx, num_perm=64, bands=16)
    assert os.path.exists(os.path.join(idx, "_SPEC.json"))

    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": [
                    " ".join(base.split()[1:]),  # near-dup of doc 0
                    "zzz qqq totally unrelated fresh words",
                ],
            }
        )
    )
    cands, tele = dedup.probe_minhash_index(new, idx)
    got = {(r["a"], r["b"]) for r in cands.take_all()}
    assert (0, 100) in got
    assert all(b != 101 for _, b in got)
    assert 0 < tele["bytes_scanned"] <= tele["bytes_total"]
    assert tele["probed_buckets"] <= tele["total_buckets"]

    spec_path = os.path.join(idx, "_SPEC.json")
    spec = json.load(open(spec_path))
    spec["hash_spec"] = "other-spec"
    json.dump(spec, open(spec_path, "w"))
    with pytest.raises(ValueError, match="hash spec"):
        dedup.probe_minhash_index(new, idx)


def test_pq_topk_separated_clusters(ray_session):
    """Two well-separated clusters, even ids in A / odd ids in B (so the
    lowest-id codebook init starts one centroid in each): a query from A
    must rank every other A member before any B member, distances
    non-decreasing by rank, deterministic across runs."""
    from crawl4ai_ray.stages.ann import pq_topk

    vecs = []
    for i in range(8):
        if i % 2 == 0:  # cluster A
            vecs.append([1.0, 1.0 + 0.01 * i, 0.0, 0.01 * i])
        else:  # cluster B
            vecs.append([9.0, 9.0, 8.0, 8.0 + 0.01 * i])
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(8), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
    )
    out = pq_topk(
        emb, query_ids=[0], k=7, m_subspaces=2, codebook_k=2, iters=2
    ).take_all()
    rows = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, 8))
    assert 0 not in [r["neighbor_id"] for r in rows]  # self excluded
    # all of A (2, 4, 6) before any of B (1, 3, 5, 7)
    assert {r["neighbor_id"] for r in rows[:3]} == {2, 4, 6}
    dists = [r["dist_fp"] for r in rows]
    assert dists == sorted(dists)
    out2 = pq_topk(
        emb, query_ids=[0], k=7, m_subspaces=2, codebook_k=2, iters=2
    ).take_all()
    assert sorted(map(tuple, (r.items() for r in out))) == sorted(
        map(tuple, (r.items() for r in out2))
    )


def test_contract_and_normalize_host_graph(ray_session):
    from crawl4ai_ray.stages.graph import (
        contract_to_host_graph,
        normalize_out_weights,
    )

    page_edges = ray.data.from_arrow(
        pa.table(
            {
                # host 0 → host 1 twice, 0 → 2 once, 1 → 1 (self, dropped),
                # 2 → 0 once
                "src_host": pa.array([0, 0, 0, 1, 2], pa.int64()),
                "dst_host": pa.array([1, 1, 2, 1, 0], pa.int64()),
            }
        )
    )
    he = {
        (r["src"], r["dst"]): r["cnt"]
        for r in contract_to_host_graph(page_edges).take_all()
    }
    assert he == {(0, 1): 2, (0, 2): 1, (2, 0): 1}
    w = {
        (r["src"], r["dst"]): r["w"]
        for r in normalize_out_weights(
            contract_to_host_graph(page_edges), num_partitions=2
        ).take_all()
    }
    assert w[(0, 1)] == 2.0 / 3.0 and w[(0, 2)] == 1.0 / 3.0 and w[(2, 0)] == 1.0


def test_hits_star_graph(ray_session):
    """Star 1,2,3 → 0 (+ isolated node 4): the L1-normalized fixpoint is
    analytic — auth(0)=1, hub(1..3)=1/3, node 4 gets nothing — and is
    reached after the first sweep, so 4 iterations must sit exactly on it."""
    from crawl4ai_ray.stages.graph import hits

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 1, 2, 3, 4], pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3], pa.int64()),
                "dst": pa.array([0, 0, 0], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r for r in hits(nodes, edges, n_iters=4, num_partitions=2).take_all()
    }
    assert len(got) == 5
    assert abs(got[0]["auth"] - 1.0) < 1e-8 and got[0]["hub"] == 0.0
    for i in (1, 2, 3):
        assert abs(got[i]["hub"] - 1.0 / 3.0) < 1e-7 and got[i]["auth"] == 0.0
    assert got[4]["hub"] == 0.0 and got[4]["auth"] == 0.0


def test_hits_matches_numpy(ray_session):
    """General graph vs a scalar reference of the same L1-normalized sweep."""
    from crawl4ai_ray.stages.graph import hits

    e = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1)]
    N, iters = 4, 4
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(N), pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in e], pa.int64()),
                "dst": pa.array([d for _, d in e], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r for r in hits(nodes, edges, n_iters=iters, num_partitions=2).take_all()
    }
    h = np.full(N, 1.0 / N)
    for _ in range(iters):
        a = np.zeros(N)
        for s, d in e:
            a[d] += h[s]
        a = a / a.sum()
        h = np.zeros(N)
        for s, d in e:
            h[s] += a[d]
        h = h / h.sum()
    for i in range(N):
        assert abs(got[i]["hub"] - h[i]) < 1e-7, (i, got[i], h[i])
        assert abs(got[i]["auth"] - a[i]) < 1e-7, (i, got[i], a[i])


def test_personalized_pagerank_matches_numpy(ray_session):
    """Seeded teleport vs a scalar reference; non-seed sinks get 0 base."""
    from crawl4ai_ray.stages.graph import pagerank

    e = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    outdeg = {0: 2, 1: 1, 2: 1, 3: 1}
    nodes = ray.data.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3], pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in e], pa.int64()),
                "dst": pa.array([d for _, d in e], pa.int64()),
                "w": pa.array([1.0 / outdeg[s] for s, _ in e], pa.float64()),
            }
        )
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            nodes, edges, n_iters=5, num_partitions=2, seeds=[0]
        ).take_all()
    }
    r = np.array([1.0, 0.0, 0.0, 0.0])
    for _ in range(5):
        nxt = np.array([0.15, 0.0, 0.0, 0.0])
        for s, d in e:
            nxt[d] += 0.85 * r[s] / outdeg[s]
        r = nxt
    for i in range(4):
        assert abs(got[i] - r[i]) < 1e-7, (i, got[i], r[i])
    # node 3 has no in-links and is not a seed → exactly 0
    assert got[3] == 0.0


def test_connected_components(ray_session):
    from crawl4ai_ray.stages.graph import connected_components

    # two components: chain 0-1-2-3 (forces 3 propagation sweeps before
    # the fixpoint, exercising convergence detection) and pair 10-11;
    # node 20 isolated
    e = [(1, 0), (2, 1), (3, 2), (11, 10)]
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 1, 2, 3, 10, 11, 20], pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in e], pa.int64()),
                "dst": pa.array([d for _, d in e], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(nodes, edges, num_partitions=4).take_all()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20}
    # dangling edge endpoints (absent from nodes) must not poison labels
    e2 = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([99, 1], pa.int64()),
                "dst": pa.array([1, 0], pa.int64()),
            }
        )
    )
    n2 = ray.data.from_arrow(pa.table({"node": pa.array([0, 1], pa.int64())}))
    got2 = {
        r["node"]: r["component"]
        for r in connected_components(n2, e2, num_partitions=2).take_all()
    }
    assert got2[0] == 0 and got2[1] == 0
    # the dangling endpoint joins the output and converges to its
    # component's TRUE min label (never a NaN-cast garbage label, and
    # never a stale join-time neighbor label — the r3 (sum, count)
    # quiescence fix: a join plus a decrease in one sweep used to
    # cancel in the sum and stop the loop one sweep early)
    assert got2[99] == 0 and len(got2) == 3
    # non-convergence raises instead of returning wrong labels
    chain = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3], pa.int64()),
                "dst": pa.array([0, 1, 2], pa.int64()),
            }
        )
    )
    n4 = ray.data.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3], pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(n4, chain, num_partitions=2, max_iters=1)


def test_multimodal_pipeline(ray_session):
    from crawl4ai_ray.stages.multimodal import media_pipeline, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(32))
    out = media_pipeline(ds).to_pandas()
    assert len(out) == 32
    assert (out["width"] <= 256).all() and (out["height"] <= 256).all()
    assert all(len(f) == 16 for f in out["features"])


def test_frame_sample_fanout(ray_session):
    from crawl4ai_ray.stages.multimodal import frame_pipeline, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(8))
    out = frame_pipeline(ds, n_frames=4).to_pandas()
    assert len(out) == 32  # 8 videos × 4 frames
    per = out.groupby("media_id")
    assert all(sorted(v) == [0, 1, 2, 3] for v in per["frame_idx"].apply(list))
    # timestamps strictly increasing within a video, deterministic reruns
    assert (per["ts_ms"].apply(lambda s: s.is_monotonic_increasing)).all()
    out2 = frame_pipeline(ds, n_frames=4).to_pandas()
    assert out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True).equals(
        out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    )
    # strict mode surfaces the env gap loudly
    import pytest as _pytest

    from crawl4ai_ray.stages.multimodal import FrameSample

    with _pytest.raises(NotImplementedError):
        FrameSample(strict=True)(synth_media_table(1))


def test_multimodal_strict_raises(ray_session):
    from crawl4ai_ray.stages.multimodal import DecodeMedia, synth_media_table

    with pytest.raises(NotImplementedError):
        DecodeMedia(strict=True)(synth_media_table(2))


def test_mulmod_p_exact_carter_wegman():
    """Limb-split (a·x+b) mod 2^61-1 equals python big-int arithmetic."""
    import numpy as np

    from crawl4ai_ray.stages.dedup import _MERSENNE, _mod_p, _mulmod_p

    rng = np.random.RandomState(0)
    p = int(_MERSENNE)
    a = rng.randint(0, p, size=500).astype(np.uint64)
    x = rng.randint(0, p, size=500).astype(np.uint64)
    got = _mulmod_p(a, x)
    want = [(int(ai) * int(xi)) % p for ai, xi in zip(a, x)]
    assert got.tolist() == want
    b = rng.randint(0, p, size=500).astype(np.uint64)
    got2 = _mod_p(_mulmod_p(a, x) + b)
    want2 = [(int(ai) * int(xi) + int(bi)) % p for ai, xi, bi in zip(a, x, b)]
    assert got2.tolist() == want2


def test_simhash_wider_radius_complete(ray_session):
    """Block bucketing with r=6 → 7 blocks: a pair at hamming 5 is found."""
    import ray as _ray

    from crawl4ai_ray.stages import dedup

    base = " ".join(f"tok{i}" for i in range(300))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("tok5", "zz5").replace("tok7", "zz7")},
        {"doc_id": 3, "text": " ".join(f"other{i}" for i in range(300))},
    ]
    ds = _ray.data.from_items(rows)
    pairs = dedup.simhash_pairs(ds, max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_ivf_bucketed_prunes_storage(ray_session, tmp_path):
    """IVF layout: low nprobe reads a fraction of the bytes; nprobe=all is
    exact vs brute force."""
    import numpy as np
    import ray as _ray

    from crawl4ai_ray.stages.ann import (
        brute_force_topk,
        ivf_topk_bucketed,
        partition_embeddings,
    )

    emb = _ray.data.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    partition_embeddings(emb, idx, n_centroids=8)
    qrows = sorted(emb.filter(expr="vec_id < 3").take_all(), key=lambda r: r["vec_id"])
    q = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]

    exact, t_all = ivf_topk_bucketed(idx, q, qids, k=5, nprobe=8)
    bf = brute_force_topk(emb, q, qids, k=5)
    assert t_all["bytes_scanned"] == t_all["bytes_total"]
    a = exact.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = bf.select_columns(["query_id", "neighbor_id", "rank"]).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "neighbor_id"]].equals(b[["query_id", "neighbor_id"]])

    pruned, t2 = ivf_topk_bucketed(idx, q, qids, k=5, nprobe=2)
    assert t2["bytes_scanned"] < t2["bytes_total"]  # storage really pruned
    assert t2["probed_centroids"] <= 6
    assert pruned.count() > 0


def test_duplicate_ngram_spans(ray_session):
    """Planted cross-doc duplicate 5-gram spans: overlapping windows merge
    into one island, adjacent (pos2 == pos1 + w) spans fuse, within-doc-only
    repeats do NOT count (min_docs=2 means distinct docs), short docs are
    skipped."""
    shared = "alpha bravo charlie delta echo foxtrot golf"  # 7 toks → 3 windows
    docs = [
        # doc 0 and 1 share a 7-token run at different offsets
        (0, "zero one " + shared + " tail0 tail1"),
        (1, shared + " other words here"),
        # doc 2: repeats a 5-gram only within itself — not a cross-doc dup
        (2, "p q r s t u p q r s t u"),
        # doc 3: too short for a window
        (3, "tiny doc"),
    ]
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in docs])
    out = dedup.duplicate_ngram_spans(ds, window=5).to_pandas()
    spans = {
        (r.doc_id, r.start_tok, r.end_tok) for r in out.itertuples(index=False)
    }
    # doc 0: tokens 3..9 hold the shared run → windows at pos 3,4,5 →
    # merged island [3, 10); doc 1: windows at 1,2,3 → [1, 8)
    assert (0, 3, 10) in spans
    assert (1, 1, 8) in spans
    assert not any(d == 2 for d, _, _ in spans)  # within-doc repeat excluded
    assert not any(d == 3 for d, _, _ in spans)
    assert len(spans) == 2

    # doc 4/5 plant two dup runs separated by exactly w tokens of unique
    # text (gap > w ⇒ two islands) and doc 6/7 plant adjacency (pos+w) fuse
    more = docs + [
        (4, shared + " u0 u1 u2 u3 u4 u5 " + shared.replace("alpha", "alpha")),
        (5, shared),
    ]
    ds2 = ray.data.from_items([{"doc_id": i, "text": t} for i, t in more])
    out2 = dedup.duplicate_ngram_spans(ds2, window=5).to_pandas()
    d4 = sorted(
        (r.start_tok, r.end_tok)
        for r in out2.itertuples(index=False)
        if r.doc_id == 4
    )
    # doc 4 = shared(7) + 6 unique + shared(7): islands [1,8) and [14,21)
    assert d4 == [(1, 8), (14, 21)]


def test_pack_sequences_semantics(ray_session):
    """Concat-and-chunk packing: offsets are a prefix sum in doc_id order,
    straddling docs span multiple sequences, empty docs vanish, and the
    manifest's fill accounts for every token exactly once."""
    from crawl4ai_ray.stages import packing

    docs = [
        (0, "a b c"),            # 3 toks  → [0,3)
        (1, ""),                 # dropped
        (2, "d e f g h i"),      # 6 toks  → [3,9)  straddles the L=4 cut at 4,8
        (3, "j"),                # 1 tok   → [9,10)
        (4, "k l m n o p q r"),  # 8 toks  → [10,18)
    ]
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in docs])
    packed = packing.pack_sequences(ds, seq_len=4, range_width=2)
    df = packed.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == [0, 2, 3, 4]
    assert df["tok_start"].tolist() == [0, 3, 9, 10]
    assert df["seq_start"].tolist() == [0, 0, 2, 2]
    assert df["seq_end"].tolist() == [0, 2, 2, 4]   # doc 2 touches seqs 0,1,2
    assert df["seq_offset"].tolist() == [0, 3, 1, 2]

    # mismatched seq_len must fail loudly, not emit negative fills
    with pytest.raises(Exception, match="must match"):
        packing.sequence_manifest(packed, seq_len=8).to_pandas()

    man = packing.sequence_manifest(packed, seq_len=4).to_pandas()
    man = man.sort_values("seq_id").reset_index(drop=True)
    # 18 tokens → seqs 0..4; every slot of 0..3 full, seq 4 holds 2
    assert man["seq_id"].tolist() == [0, 1, 2, 3, 4]
    assert man["n_filled"].tolist() == [4, 4, 4, 4, 2]
    assert int(man["n_filled"].sum()) == 18
    assert man["n_docs"].tolist() == [2, 1, 3, 1, 1]


def test_rebalance_mix(ray_session):
    """Mix rebalancing: integer cuts hit the target shares in expectation,
    zh (absent from targets) is dropped entirely, and an under-represented
    stratum is kept whole (cut capped at 10000, never up-sampled)."""
    from crawl4ai_ray.stages import sampling

    rows = (
        [{"doc_id": i, "lang": "en"} for i in range(1000)]
        + [{"doc_id": 1000 + i, "lang": "de"} for i in range(100)]
        + [{"doc_id": 1100 + i, "lang": "zh"} for i in range(50)]
        + [{"doc_id": 1150 + i, "lang": "fr"} for i in range(5)]
    )
    ds = ray.data.from_items(rows)
    out = sampling.rebalance_mix(
        ds,
        target_bp={"en": 5000, "de": 2000, "fr": 3000},
        total_keep=100,
        strata_col="lang",
    ).to_pandas()
    by = out.groupby("lang").size().to_dict()
    assert "zh" not in by
    # en: cut = 5000*100//1000 = 500 → expect ~5% of 1000 = 50 kept
    assert 30 <= by.get("en", 0) <= 70
    # de: cut = 2000*100//100 = 2000 → ~20% of 100 = 20
    assert 10 <= by.get("de", 0) <= 32
    # fr: cut = 3000*100//5 = 60000 → capped 10000 → ALL 5 kept
    assert by.get("fr", 0) == 5
    # determinism: second run identical
    out2 = sampling.rebalance_mix(
        ds, target_bp={"en": 5000, "de": 2000, "fr": 3000},
        total_keep=100, strata_col="lang",
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_dqsketch_exact_when_small():
    from crawl4ai_ray.stages.sketch import DQSketch

    sk = DQSketch(k=128)
    sk.add_values(np.arange(100, dtype=np.float64))
    # below capacity nothing compacts: lower-quantile answers are exact
    assert sk.quantiles([0.5]) == [49.0]
    assert sk.quantiles([0.01]) == [0.0]
    assert sk.quantiles([1.0]) == [99.0]


def test_dqsketch_deterministic_and_roundtrip():
    from crawl4ai_ray.stages.sketch import DQSketch

    vals = (np.arange(50_000, dtype=np.float64) * 7919) % 10_000
    a, b = DQSketch(k=64), DQSketch(k=64)
    a.add_values(vals)
    b.add_values(vals)
    assert a.to_bytes() == b.to_bytes()
    c = DQSketch.from_bytes(a.to_bytes())
    assert c.quantiles([0.1, 0.5, 0.9]) == a.quantiles([0.1, 0.5, 0.9])


def test_dqsketch_error_bound():
    from crawl4ai_ray.stages.sketch import DQSketch

    n = 200_000
    vals = (np.arange(n, dtype=np.float64) * 104_729) % n  # permutation
    sk = DQSketch(k=128)
    sk.add_values(vals)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantiles([q])[0]
        rank_err = abs(est / n - q)
        assert rank_err < 0.03, (q, est, rank_err)
    # memory stays O(k log n): total stored items way below n
    stored = sum(len(b) for b in sk.levels)
    assert stored < 40 * 128


def test_dqsketch_merge_fold_deterministic():
    from crawl4ai_ray.stages.sketch import DQSketch

    vals = (np.arange(30_000, dtype=np.float64) * 31) % 1000
    parts = [vals[i::3] for i in range(3)]

    def fold():
        acc = None
        for p in parts:
            sk = DQSketch(k=64)
            sk.add_values(p)
            acc = sk if acc is None else acc.merge(sk)
        return acc

    assert fold().to_bytes() == fold().to_bytes()
    est = fold().quantiles([0.5])[0]
    assert abs(est - 500) < 60  # ~centered


def test_quantiles_per_key(ray_session):
    """Distributed per-key sketch quantiles: deterministic across runs and
    within rank tolerance of the exact quantiles."""
    from crawl4ai_ray.stages.sketch import quantiles_per_key

    rows = []
    for i in range(5000):
        rows.append({"doc_id": i, "grp": "a" if i % 2 == 0 else "b",
                     "x": float((i * 7919) % 1000)})
    ds = ray.data.from_items(rows)
    out1 = quantiles_per_key(ds, key="grp", value="x", qs=[0.25, 0.5, 0.75],
                             k=64).to_pandas().sort_values(["grp", "q"]).reset_index(drop=True)
    out2 = quantiles_per_key(ds, key="grp", value="x", qs=[0.25, 0.5, 0.75],
                             k=64).to_pandas().sort_values(["grp", "q"]).reset_index(drop=True)
    assert out1.equals(out2)
    for grp in ("a", "b"):
        xs = np.array([r["x"] for r in rows if r["grp"] == grp])
        for _, row in out1[out1["grp"] == grp].iterrows():
            exact_rank = (xs <= row["value"]).mean()
            assert abs(exact_rank - row["q"]) < 0.06, (grp, row["q"], row["value"])


def test_decontaminate_bloom_matches_exact(ray_session):
    """The bloom-semijoin + bucketed-verify path must produce EXACTLY the
    broadcast-exact decontaminate output (the verify pass kills bloom
    false positives), including zero rows for clean docs."""
    from crawl4ai_ray.stages.decontaminate import decontaminate, decontaminate_bloom

    corpus = [
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon"},
        {"doc_id": 1, "text": "zeta eta theta iota kappa"},
        {"doc_id": 2, "text": "alpha beta gamma nu xi"},      # shares a 3-gram w/ 0
        {"doc_id": 3, "text": "one two"},                      # too short for grams
    ]
    bench = [{"doc_id": 100, "text": "alpha beta gamma delta"}]
    cds = ray.data.from_items(corpus)
    bds = ray.data.from_items(bench)
    a = decontaminate(cds, bds, n=3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decontaminate_bloom(cds, bds, n=3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b), (a, b)
    assert a["contaminated"].tolist() == [1, 0, 1, 0]
    assert a["n_contaminated"].tolist() == [2, 0, 1, 0]


def test_triangle_enumerate(ray_session):
    """Known topologies: K5 has C(5,3)=10 triangles; a star hub has none
    (the degree-orientation hot-node case); duplicate/reversed/self edges
    are cleaned; triangles come out sorted a<b<c exactly once."""
    from crawl4ai_ray.stages.graph import triangle_enumerate

    k5 = [(i, j) for i in range(5) for j in range(5) if i != j]  # both dirs
    star = [(100, 100 + i) for i in range(1, 30)]                # no closes
    extra = [(0, 0), (1, 0), (2, 100), (100 + 1, 100 + 2)]       # self/dup/bridge
    edges = k5 + star + extra + [(100 + 2, 100 + 3)]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    out = triangle_enumerate(ds).to_pandas()
    tris = sorted(map(tuple, out[["a", "b", "c"]].to_numpy()))
    assert len(tris) == len(set(tris))  # each triangle exactly once
    from itertools import combinations

    expect = sorted(combinations(range(5), 3))  # the K5 triangles only
    assert [t for t in tris if t[2] < 100] == expect
    # bridge edges close exactly two triangles through the star hub:
    # 101-102 closes (100,101,102); 102-103 closes (100,102,103)
    assert [t for t in tris if t[2] >= 100] == [(100, 101, 102), (100, 102, 103)]


def test_decontaminate_bloom_negative_doc_ids(ray_session):
    """Regression (review finding): corpus docs with negative ids must not
    be misread as benchmark rows — side identity is an explicit flag, not
    an in-band doc_id sentinel."""
    from crawl4ai_ray.stages.decontaminate import decontaminate, decontaminate_bloom

    corpus = [
        {"doc_id": -1, "text": "alpha beta gamma delta epsilon"},  # contaminated
        {"doc_id": -2, "text": "zeta eta theta iota kappa"},       # clean
        {"doc_id": 5, "text": "alpha beta gamma nu xi"},           # contaminated
    ]
    bench = [{"doc_id": 100, "text": "alpha beta gamma delta"}]
    cds = ray.data.from_items(corpus)
    bds = ray.data.from_items(bench)
    a = decontaminate(cds, bds, n=3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decontaminate_bloom(cds, bds, n=3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b), (a, b)
    assert dict(zip(a["doc_id"], a["contaminated"])) == {-2: 0, -1: 1, 5: 1}


def test_term_index_pruned_lookup(ray_session, tmp_path):
    """Term-partitioned postings: a lookup reads exactly ONE of P
    partitions (bytes-scanned telemetry), returns the exact per-doc tf,
    and misses return empty without scanning everything."""
    from crawl4ai_ray.stages.index import build_term_index, term_lookup

    docs = [
        {"doc_id": 0, "text": "merge sort Merge MERGE beats bubble"},
        {"doc_id": 1, "text": "no relevant words here"},
        {"doc_id": 2, "text": "merge once"},
    ]
    d = str(tmp_path / "tidx")
    build_term_index(ray.data.from_items(docs), d, num_partitions=8)
    ds, tel = term_lookup(d, "MERGE")  # lookup lowercases
    got = dict(zip(*[ds.to_pandas()[c] for c in ("doc_id", "tf")]))
    assert got == {0: 3, 2: 1}
    assert tel["partitions_read"] == 1 and tel["partitions_total"] == 8
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"]
    miss, tel2 = term_lookup(d, "zzz_not_present")
    assert miss.count() == 0
    assert tel2["bytes_scanned"] < tel2["bytes_total"]


def test_line_dedup_newline_mode(ray_session):
    """Production segment model: newline lines; a line present in >2 docs
    is boilerplate and removed from every doc; residual text reassembled
    in order; a doc whose every line is boilerplate survives with ''."""
    from crawl4ai_ray.stages.linededup import line_dedup

    footer = "subscribe to our newsletter"
    docs = [
        {"doc_id": 0, "text": f"alpha body\n{footer}"},
        {"doc_id": 1, "text": f"{footer}\nbeta body"},
        {"doc_id": 2, "text": f"gamma one\ngamma two\n{footer}"},
        {"doc_id": 3, "text": footer},
        {"doc_id": 4, "text": ""},
    ]
    out = (
        line_dedup(ray.data.from_items(docs), width=None, max_docs=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "alpha body"
    assert out.loc[1, "clean_text"] == "beta body"
    assert out.loc[2, "clean_text"] == "gamma one\ngamma two"
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_seg"] == 1
    # empty text → zero segments (not one empty line)
    assert out.loc[4, "n_seg"] == 0 and out.loc[4, "clean_text"] == ""
    assert list(out["n_kept"]) == [1, 1, 2, 0, 0]


def test_line_dedup_token_window_mode(ray_session):
    """Stand-in segment model for line-less corpora: non-overlapping
    width-token windows, partial tail kept; within-doc duplicates count
    the doc ONCE toward the frequency threshold."""
    from crawl4ai_ray.stages.linededup import line_dedup

    # "x y" appears in 3 docs (twice in doc 0 — still one doc), "a b" in 2
    docs = [
        {"doc_id": 0, "text": "x y x y tail"},
        {"doc_id": 1, "text": "x y a b"},
        {"doc_id": 2, "text": "x y"},
        {"doc_id": 3, "text": "a b"},
    ]
    out = (
        line_dedup(ray.data.from_items(docs), width=2, max_docs=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "tail"
    assert out.loc[0, "n_seg"] == 3 and out.loc[0, "n_kept"] == 1
    assert out.loc[1, "clean_text"] == "a b"
    assert out.loc[2, "clean_text"] == ""
    assert out.loc[3, "clean_text"] == "a b"


def test_unigram_lm_score_oov_and_buckets(ray_session):
    """Capped vocab folds rare tokens into ONE OOV class; the per-doc nll
    is the exact integer sum of fixed-point per-token nlls (recomputed
    here scalar-side), and bucket thresholds split on mean_nll_fixed."""
    import math
    from collections import Counter

    from crawl4ai_ray.stages.lmscore import unigram_lm_score

    docs = [
        {"doc_id": 0, "text": "a a a a b"},
        {"doc_id": 1, "text": "a b rare1 rare2"},
        {"doc_id": 2, "text": "rare3 rare4 rare5"},
        {"doc_id": 3, "text": ""},
    ]
    # vocab_k=2 → vocab {a:5, b:2}; OOV pool = 5 rare tokens
    out = (
        unigram_lm_score(
            ray.data.from_items(docs), vocab_k=2, head_t=10**8, tail_t=2 * 10**8
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    n, vk = 12, 2
    denom = n + vk + 1

    def q(c):
        return int(math.floor(-math.log((c + 1) / denom) * 1e8 + 0.5))

    model = {"a": q(5), "b": q(2)}
    # 5 OOV occurrences over 5 distinct OOV types → per-type rate 1
    oov = q(1)
    for d in docs:
        toks = d["text"].split()
        nll = sum(c * model.get(w, oov) for w, c in Counter(toks).items())
        row = out.loc[d["doc_id"]]
        assert row["dl"] == len(toks)
        assert row["nll_fixed"] == nll
        expect_mean = nll // len(toks) if toks else 0
        assert row["mean_nll_fixed"] == expect_mean
        expect_bucket = (
            "head" if expect_mean < 10**8 else
            "middle" if expect_mean < 2 * 10**8 else "tail"
        )
        assert row["bucket"] == expect_bucket
    # the doc of pure rare tokens must score strictly worse than doc 0
    assert out.loc[2, "mean_nll_fixed"] > out.loc[0, "mean_nll_fixed"]


def test_unigram_vocab_selection_driver_bounded(ray_session):
    """The round-3 scale-killer (full distinct-vocab to_pandas on the
    driver) must stay dead: fit_unigram's vocab selection goes through a
    per-block prune + distributed sort+limit, so (a) Dataset.to_pandas is
    NEVER called during the fit — monkeypatch-asserted — and (b) with a
    distinct vocabulary much larger than vocab_k, the driver-held kept
    list is exactly vocab_k rows and matches the exact top-k by
    (count desc, token asc)."""
    from collections import Counter

    import ray.data as rd

    from crawl4ai_ray.stages.lmscore import _select_vocab, fit_unigram, token_counts

    # 300 distinct tokens, counts 1..300 via repetition; vocab_k=16
    docs = [
        {"doc_id": i, "text": " ".join(f"w{j:03d}" for j in range(i % 30 + 1))}
        for i in range(120)
    ]
    ds = ray.data.from_items(docs).repartition(8)
    vocab_k = 7

    orig = rd.Dataset.to_pandas
    calls = []
    rd.Dataset.to_pandas = lambda self, *a, **k: calls.append(1) or orig(self, *a, **k)
    try:
        model_ref, n_total, v_kept = fit_unigram(ds, vocab_k=vocab_k)
    finally:
        rd.Dataset.to_pandas = orig
    assert not calls, "fit_unigram must not collect any Dataset via to_pandas"
    assert v_kept == vocab_k

    # exact-top-k parity vs a scalar recompute
    truth = Counter()
    for d in docs:
        truth.update(d["text"].split())
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    kept, n, v = _select_vocab(token_counts(ds), vocab_k)
    assert kept == expect
    assert n == sum(truth.values()) and v == len(truth)
    assert len(kept) <= vocab_k  # the driver-held row bound
    model = ray.get(model_ref)
    assert len(model) == vocab_k + 1  # vocab + one OOV class broadcast


def test_line_dedup_and_lm_degenerate_inputs(ray_session):
    """Single-doc and all-empty corpora must flow through both new stages
    without schema loss: no boilerplate exists at n=1, the LM scores an
    empty doc 0/head, and outputs keep their declared int64/string types."""
    from crawl4ai_ray.stages.linededup import line_dedup
    from crawl4ai_ray.stages.lmscore import unigram_lm_score

    one = ray.data.from_items([{"doc_id": 7, "text": "x y z"}])
    out = line_dedup(one, width=2, max_docs=2).to_pandas()
    assert out.iloc[0]["clean_text"] == "x y z" and out.iloc[0]["n_kept"] == 2

    empties = ray.data.from_items(
        [{"doc_id": i, "text": ""} for i in range(3)]
    )
    led = line_dedup(empties, width=3, max_docs=2).to_pandas()
    assert list(led["n_seg"]) == [0, 0, 0]
    assert list(led["clean_text"]) == ["", "", ""]
    lm = unigram_lm_score(empties, vocab_k=4, head_t=1, tail_t=2).to_pandas()
    assert list(lm["dl"]) == [0, 0, 0]
    assert list(lm["nll_fixed"]) == [0, 0, 0]
    assert set(lm["bucket"]) == {"head"}


def test_webtext_pipeline_all_filtered(ray_session):
    """A corpus the quality filter kills entirely must yield an EMPTY
    result (not crash on empty downstream shuffles)."""
    from crawl4ai_ray.pipelines.webtext import webtext_pipeline

    junk = ray.data.from_items(
        [{"doc_id": i, "text": "9 " * 40} for i in range(5)]
    )
    out = webtext_pipeline(junk)
    assert out.count() == 0


def test_shuffle_export_shards(ray_session, tmp_path):
    """export_shards writes shard-partitioned parquet whose per-shard pos
    column is a dense 0..n-1 permutation order, identical across layouts."""
    import glob

    import pyarrow.parquet as pq

    from crawl4ai_ray.stages.shuffle import export_shards, shuffle_assignments

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i} body"} for i in range(200)]
    )
    out = str(tmp_path / "shards")
    man = export_shards(docs, out, n_shards=4, seed=11, columns=["text"])
    assert sum(man["rows_per_shard"].values()) == 200
    assert set(man["rows_per_shard"]) == {0, 1, 2, 3}
    seen_ids = []
    for s in range(4):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert files
        t = pa.concat_tables([pq.read_table(f) for f in files])
        pos = sorted(t.column("pos").to_pylist())
        assert pos == list(range(man["rows_per_shard"][s]))
        assert set(t.column_names) >= {"doc_id", "text", "pos"}
        seen_ids += t.column("doc_id").to_pylist()
    assert sorted(seen_ids) == list(range(200))

    # placement is block-layout independent (the determinism contract)
    a1 = (
        shuffle_assignments(docs, n_shards=4, seed=11)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    a2 = (
        shuffle_assignments(docs.repartition(7), n_shards=4, seed=11)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a1.equals(a2)
    # a different seed must produce a different permutation
    a3 = shuffle_assignments(docs, n_shards=4, seed=12).to_pandas()
    merged = a1.merge(a3, on="doc_id", suffixes=("_a", "_b"))
    assert (
        (merged["shard_a"] != merged["shard_b"])
        | (merged["pos_a"] != merged["pos_b"])
    ).any()


def test_snapshot_delta_classes_and_guard(ray_session):
    from crawl4ai_ray.stages.delta import snapshot_delta

    prev = ray.data.from_items(
        [
            {"doc_id": 1, "content_hash": "a"},
            {"doc_id": 2, "content_hash": "b"},
            {"doc_id": 3, "content_hash": "c"},
        ]
    )
    curr = ray.data.from_items(
        [
            {"doc_id": 2, "content_hash": "b"},     # unchanged
            {"doc_id": 3, "content_hash": "c2"},    # changed
            {"doc_id": 4, "content_hash": "d"},     # new
        ]
    )
    out = snapshot_delta(prev, curr).to_pandas().set_index("doc_id")["status"]
    assert out.to_dict() == {1: "gone", 2: "unchanged", 3: "changed", 4: "new"}

    dup = ray.data.from_items(
        [
            {"doc_id": 1, "content_hash": "a"},
            {"doc_id": 1, "content_hash": "a2"},
        ]
    )
    import pytest

    with pytest.raises(Exception, match="duplicate ids|RayTaskError|not a snapshot"):
        snapshot_delta(dup, curr).to_pandas()


def test_pmi_pairs_window_semantics(ray_session):
    """Forward-window pairs and the exact PMI expression on a corpus small
    enough to hand-count: 'a b c a b' with window=2 emits pairs
    (a,b)x2 (a,c) (b,c) (b,a) (c,a) (c,b)."""
    import math

    from crawl4ai_ray.stages.textstats import pmi_pairs

    docs = ray.data.from_items([{"doc_id": 0, "text": "a b c a b"}])
    out = (
        pmi_pairs(docs, window=2, min_count=1)
        .to_pandas()
        .set_index(["x", "y"])
        .sort_index()
    )
    assert out.loc[("a", "b"), "n_xy"] == 2
    assert out["n_xy"].sum() == 7  # total forward-window pairs
    # pmi(a,b) = ln(2*7 / (L_a * R_b)); L_a = pairs with left a = 3,
    # R_b = pairs with right b = 3
    assert out.loc[("a", "b"), "pmi"] == round(math.log((2.0 * 7.0) / (3.0 * 3.0)), 8)
    # min_count prunes pairs but not marginals
    pruned = pmi_pairs(docs, window=2, min_count=2).to_pandas()
    assert len(pruned) == 1
    assert pruned.iloc[0]["pmi"] == round(math.log((2.0 * 7.0) / (3.0 * 3.0)), 8)


def test_gopher_rules_each_rule_fires(ray_session):
    """One doc per rule violation; integer cross-multiplication semantics."""
    from crawl4ai_ray.stages.textstats import gopher_rules_batch

    good = "the quick brown fox jumps over that lazy dog and runs with vigor " * 5
    docs = [
        {"doc_id": 0, "text": good},                                # all pass
        {"doc_id": 1, "text": "the and short"},                     # word count
        {"doc_id": 2, "text": ("a " * 60) + "the and"},             # mean len < 3
        {"doc_id": 3, "text": ("the word " + "# " * 20) * 3},       # symbols
        {"doc_id": 4, "text": ("123 456 " * 30) + "the and"},       # alpha
        {"doc_id": 5, "text": "zebra quark lemon " * 20},           # stops
    ]
    out = (
        ray.data.from_items(docs)
        .map_batches(gopher_rules_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "keep"])
    assert not out.loc[1, "ok_word_count"]
    assert not out.loc[2, "ok_mean_len"]
    assert not out.loc[3, "ok_symbol"]
    assert not out.loc[4, "ok_alpha"]
    assert not out.loc[5, "ok_stop"]
    assert not out.loc[1:, "keep"].any()
    # '...' counted non-overlapping, like str.count
    e = ray.data.from_items(
        [{"doc_id": 0, "text": "the and word word.... more " + "tok " * 60}]
    ).map_batches(gopher_rules_batch, batch_format="pyarrow").to_pandas()
    assert bool(e.loc[0, "ok_symbol"])  # 1 ellipsis vs 65+ words


def test_rrf_fuse_exact(ray_session):
    """Integer RRF: hand-computed contributions, membership in one list
    only, and (score DESC, id ASC) tie ordering."""
    from crawl4ai_ray.stages.ann import rrf_fuse

    lex = ray.data.from_items(
        [{"doc_id": 10, "rank": 1}, {"doc_id": 20, "rank": 2}]
    )
    sem = ray.data.from_items(
        [{"doc_id": 20, "rank": 1}, {"doc_id": 30, "rank": 2}]
    )
    out = rrf_fuse([lex, sem], k_const=60, topk=10).to_pandas()
    s = 10**9
    exp = {
        20: s // 62 + s // 61,  # in both lists
        10: s // 61,
        30: s // 62,
    }
    got = dict(zip(out["doc_id"], out["rrf_fp"]))
    assert got == exp
    assert out["doc_id"].tolist() == [20, 10, 30]  # fused order
    assert out["rank"].tolist() == [1, 2, 3]


def test_neardup_keep_canonical_winner(ray_session):
    """pairs → components → keep: identical docs collapse to the lowest
    id; a transitive chain shares one component; uniques keep."""
    from crawl4ai_ray.stages import dedup
    from crawl4ai_ray.stages.graph import connected_components

    t_dup = "alpha beta gamma delta epsilon zeta"
    rows = [
        {"doc_id": 0, "text": t_dup},
        {"doc_id": 1, "text": t_dup},
        {"doc_id": 2, "text": t_dup},
        {"doc_id": 3, "text": "totally different words here entirely now"},
    ]
    docs = ray.data.from_items(rows)
    pairs = dedup.ngram_jaccard_pairs_prefix(docs, tau=0.9, shingle=3)
    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "src": b.column("a").cast(pa.int64()),
                "dst": b.column("b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    comp = (
        connected_components(nodes, edges)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert comp["component"].tolist() == [0, 0, 0, 3]


def _kmeans_pure_python(embs, k, iters):
    """Independent scalar reimplementation of stages/cluster.py kmeans_fp
    (plain lists + math.floor — none of the numpy path)."""
    import math

    q = 1 << 20
    fp = [
        [int(math.floor(float(v) * q + 0.5)) for v in e] for e in embs
    ]
    cents = [list(fp[i]) for i in range(k)]
    d = len(fp[0])

    def assign(vec):
        best, bd = 0, None
        for ci in range(k):
            dist = sum((vec[j] - cents[ci][j]) ** 2 for j in range(d))
            if bd is None or dist < bd:
                best, bd = ci, dist
        return best, bd

    for _ in range(iters):
        sums = [[0] * d for _ in range(k)]
        ns = [0] * k
        for vec in fp:
            a, _ = assign(vec)
            ns[a] += 1
            for j in range(d):
                sums[a][j] += vec[j]
        for ci in range(k):
            if ns[ci] > 0:
                cents[ci] = [sums[ci][j] // ns[ci] for j in range(d)]
    return [assign(vec) for vec in fp]


def test_kmeans_fp_matches_pure_python_and_layout(ray_session):
    """kmeans_fp separates planted blobs, matches an independent scalar
    recompute exactly (integer arithmetic), and is invariant to block
    layout."""
    import random

    from crawl4ai_ray.stages.cluster import kmeans_fp

    rng = random.Random(7)
    embs, rows = [], []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 else [0.0, 1.0, 0.0, 0.0]
        e = [b + rng.uniform(-0.05, 0.05) for b in base]
        embs.append(e)
        rows.append({"vec_id": i, "embedding": e})
    expect = _kmeans_pure_python(embs, k=2, iters=3)

    ds = ray.data.from_items(rows)
    out = (
        kmeans_fp(ds, k=2, iters=3)[0]
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(out["cluster"]) == [a for a, _ in expect]
    assert list(out["dist_fp"]) == [d for _, d in expect]
    # blob separation: odd ids (≈e0) one cluster, even ids the other
    assert len(set(out[out.vec_id % 2 == 1]["cluster"])) == 1
    assert len(set(out[out.vec_id % 2 == 0]["cluster"])) == 1

    out7 = (
        kmeans_fp(ds.repartition(7), k=2, iters=3)[0]
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out7)


def test_semdedup_strict_threshold_and_chain(ray_session):
    """SemDeDup drop rule: strict > at the exact integer boundary, and
    lower-id-dominates-ANY-earlier semantics (a dropped doc still
    dominates later docs)."""
    from crawl4ai_ray.stages.cluster import semdedup

    # k=1 (single cluster): u=(1,0), v=(1,1) → cos^2 = 1/2 exactly in
    # fixed point. tau^2 = 1/2 → equality → KEEP (strict >);
    # tau^2 = 2/5 → 1/2 > 2/5 → DROP.
    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0]},
        {"vec_id": 1, "embedding": [1.0, 1.0]},
    ]
    ds = ray.data.from_items(rows)
    eq = semdedup(ds, k=1, iters=1, tau_num=1, tau_den=2).to_pandas()
    assert eq.sort_values("vec_id")["keep"].tolist() == [True, True]
    gt = semdedup(ds, k=1, iters=1, tau_num=2, tau_den=5).to_pandas()
    assert gt.sort_values("vec_id")["keep"].tolist() == [True, False]

    # chain: b ~ a and c ~ b but c !~ a. All-earlier semantics: b dropped
    # by a, c dropped by b EVEN THOUGH b itself was dropped.
    import math

    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0]},
        {"vec_id": 1, "embedding": [math.cos(0.25), math.sin(0.25)]},
        {"vec_id": 2, "embedding": [math.cos(0.5), math.sin(0.5)]},
    ]
    # cos(0.25) ≈ 0.9689 > 0.95 (adjacent), cos(0.5) ≈ 0.8776 < 0.95
    ds = ray.data.from_items(rows)
    out = (
        semdedup(ds, k=1, iters=1, tau_num=9025, tau_den=10000)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["keep"].tolist() == [True, False, False]


def test_dsir_weights_tilt_and_bitexact(ray_session):
    """DSIR importance weights: (1) docs made of target-slice tokens score
    above docs made of raw-only tokens, (2) fixed-point integer weights
    are invariant to block layout."""
    from crawl4ai_ray.stages.dsir import dsir_weights

    rows = []
    for i in range(8):
        rows.append({"doc_id": i, "text": "alpha beta alpha beta", "is_target": True})
    for i in range(8, 16):
        rows.append({"doc_id": i, "text": "gamma delta gamma delta", "is_target": False})
    # probe docs: target-looking vs raw-only-looking, both non-target
    rows.append({"doc_id": 16, "text": "alpha beta", "is_target": False})
    rows.append({"doc_id": 17, "text": "gamma delta", "is_target": False})
    ds = ray.data.from_items(rows)
    out = dsir_weights(ds, target_col="is_target", k=64).to_pandas().set_index("doc_id")
    assert out.loc[16, "logw_fp"] > 0 > out.loc[17, "logw_fp"]
    assert out.loc[16, "n_feat"] == 2
    assert bool(out.loc[0, "is_target"]) and not bool(out.loc[17, "is_target"])
    # block-layout invariance: integer sums are order-free
    a = dsir_weights(ds, target_col="is_target", k=64).to_pandas()
    b = dsir_weights(ds.repartition(7), target_col="is_target", k=64).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_token_budget_select_exact_and_bin_independent(ray_session):
    """Greedy budget selection: inclusive boundary, bin-granularity
    independence (the two-level scan is exact for ANY num_bins), and
    map-side pruning of bins past the budget."""
    from crawl4ai_ray.stages.sampling import token_budget_select

    rows = [
        {"doc_id": i, "quality": q, "n_tok": w}
        for i, (q, w) in enumerate(
            [(0.9, 10), (0.8, 20), (0.8, 5), (0.7, 40), (0.5, 100), (0.3, 1)]
        )
    ]
    ds = ray.data.from_items(rows)
    # order: d0(10) d1(30) d2(35) d3(75) d4(175) d5(176); budget 75 keeps
    # exactly d0,d1,d2,d3 (d3 lands ON the boundary — inclusive)
    out = (
        token_budget_select(ds, budget=75, num_bins=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2, 3]
    assert out["cum_tok"].tolist() == [10, 30, 35, 75]
    # same-quality tie (d1 vs d2) resolves by doc_id ascending
    assert out.loc[1, "cum_tok"] == 30 and out.loc[2, "cum_tok"] == 35
    # bin-granularity independence: 1 bin (pure sort) == many bins
    for bins in (1, 64, 1000):
        alt = (
            token_budget_select(ds, budget=75, num_bins=bins)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert alt["doc_id"].tolist() == [0, 1, 2, 3]
        assert alt["cum_tok"].tolist() == [10, 30, 35, 75]
    # tight budget: only the top doc fits; low bins never shuffle
    top = token_budget_select(ds, budget=10, num_bins=4).to_pandas()
    assert top["doc_id"].tolist() == [0]
    # budget below the best doc's weight → empty result
    assert token_budget_select(ds, budget=5, num_bins=4).count() == 0


def test_c4_rules_each_rule_fires(ray_session):
    """One doc per C4 rule: line terminal-punct/min-words/javascript
    filters, sentence floor, page-level lorem/brace/bad-word drops."""
    from crawl4ai_ray.stages.textstats import c4_rules_batch

    good = "one two three four five six.\nseven eight nine ten eleven!\ntwelve more words here too?"
    docs = [
        {"doc_id": 0, "text": good},                                   # all pass
        {"doc_id": 1, "text": "one two three four five six"},          # no terminal punct
        {"doc_id": 2, "text": "one two."},                             # < 5 words/line
        {"doc_id": 3, "text": "enable javascript to view this page."}, # javascript line
        {"doc_id": 4, "text": "one two three four five six."},         # 1 sentence < 3
        {"doc_id": 5, "text": good + "\nlorem ipsum dolor sit amet."}, # lorem
        {"doc_id": 6, "text": good + "\nvar x = { a: 1 };"},           # brace
        {"doc_id": 7, "text": good + "\nthis has a badword in it."},   # bad word
    ]
    out = (
        ray.data.from_items(docs)
        .map_batches(c4_rules_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "keep"])
    assert out.loc[0, "n_lines"] == 3 and out.loc[0, "n_kept_lines"] == 3
    assert out.loc[0, "n_sentences"] == 3
    assert out.loc[1, "n_kept_lines"] == 0 and not out.loc[1, "keep"]
    assert out.loc[2, "n_kept_lines"] == 0
    assert out.loc[3, "n_kept_lines"] == 0  # javascript filter, not word count
    assert out.loc[4, "n_kept_lines"] == 1 and out.loc[4, "n_sentences"] == 1
    assert not out.loc[4, "keep"]
    assert bool(out.loc[5, "has_lorem"]) and not out.loc[5, "keep"]
    assert bool(out.loc[6, "has_brace"]) and not out.loc[6, "keep"]
    assert bool(out.loc[7, "has_bad_word"]) and not out.loc[7, "keep"]
    # clean_chars counts the retained text only
    assert out.loc[4, "clean_chars"] == len("one two three four five six.")
    # bad-word match is token-exact, not substring: 'notbadwordish' is one
    # [a-z]+ token and must NOT trip the filter
    tok = (
        ray.data.from_items([{"doc_id": 0, "text": good + "\nnotbadwordish text here okay."}])
        .map_batches(c4_rules_batch, batch_format="pyarrow")
        .to_pandas()
    )
    assert not tok.loc[0, "has_bad_word"] and bool(tok.loc[0, "keep"])


def test_c4_structured_page_derivation_deterministic():
    """The synthetic structured-page generator is pure and injects each
    contamination on its documented residue class."""
    from crawl4ai_ray.stages.textstats import derive_structured_page

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert derive_structured_page(7, t) == derive_structured_page(7, t)
    # doc 0: k=3, lines of 3 tokens; %41==0 → lorem, %43==0 → brace, 0%37==0 → badword
    s0 = derive_structured_page(0, t)
    assert "lorem ipsum" in s0 and "{" in s0 and "badword" in s0
    s1 = derive_structured_page(1, t)
    assert "lorem ipsum" not in s1 and "{" not in s1 and "badword" not in s1
    # line width k = 3 + doc_id%5: doc 1 → k=4 → ceil(10/4)=3 lines
    assert s1.count("\n") == 2
    # (doc_id+li)%13==0 injects a javascript token: doc 12 line 1
    assert "javascript" in derive_structured_page(12, t).split("\n")[0]


def test_logreg_quality_bitexact_and_recall(ray_session):
    """Class-weighted distributed GD: (1) scores are invariant to block
    layout (integer gradient sums are order-free), (2) the fitted model
    reaches full recall on the planted stopword-density labels."""
    from crawl4ai_ray.stages.logreg import logreg_quality_scores

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        logreg_quality_scores(docs, iters=6, lr=2.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        logreg_quality_scores(docs.repartition(7), iters=6, lr=2.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)

    full = (
        logreg_quality_scores(docs)
        .to_pandas()
        .set_index("doc_id")
    )
    import pandas as pd

    raw = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    import re

    stop_re = re.compile(r"\b(the|a|and|of|to|in|is|it|that|for)\b")
    y = pd.Series(
        [
            10 * len(stop_re.findall(t.lower())) >= len(t.split())
            for t in raw["text"]
        ],
        index=raw["doc_id"],
    )
    pos = y[y].index
    assert len(pos) > 0
    assert full.loc[pos, "pred"].all(), "planted positives must be recalled"
    assert not full["pred"].all(), "classifier must discriminate"


def test_ngram_prefix_filter_equals_full_index(ray_session):
    """Prefix-filtered candidate generation + exact verify must return the
    IDENTICAL pair set as the full inverted index (prefix filtering is an
    exactness-preserving optimization, not an approximation)."""
    from crawl4ai_ray.stages import dedup

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    full = (
        dedup.ngram_jaccard_pairs(docs, tau=0.9, shingle=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pref = (
        dedup.ngram_jaccard_pairs_prefix(docs, tau=0.9, shingle=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(full) > 0
    assert full[["a", "b"]].equals(pref[["a", "b"]])
    # boundary tau exercises the ceil-epsilon guard in the prefix length
    full2 = dedup.ngram_jaccard_pairs(docs, tau=0.5, shingle=3).to_pandas()
    pref2 = dedup.ngram_jaccard_pairs_prefix(docs, tau=0.5, shingle=3).to_pandas()
    assert (
        full2.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b"]]
        .equals(pref2.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b"]])
    )


def test_temperature_mix_flattens_head(ray_session):
    """α=1/2 temperature sampling: shares follow sqrt(count), so the
    low-resource stratum keeps a far larger fraction of itself than the
    head (fr ~89% vs en ~15% here), while the head still dominates the
    absolute sample. Deterministic across runs."""
    from crawl4ai_ray.stages import sampling

    rows = (
        [{"doc_id": i, "lang": "en"} for i in range(900)]
        + [{"doc_id": 900 + i, "lang": "de"} for i in range(100)]
        + [{"doc_id": 1000 + i, "lang": "fr"} for i in range(25)]
    )
    ds = ray.data.from_items(rows)
    out = sampling.temperature_mix(ds, total_keep=200, strata_col="lang").to_pandas()
    by = out.groupby("lang").size().to_dict()
    # weights isqrt: en 30, de 10, fr 5 (sum 45) → cuts 1481/4444/8888 bp
    # expected kept ≈ 133 / 44 / 22; generous bands for hash variance
    assert 100 <= by.get("en", 0) <= 165
    assert 30 <= by.get("de", 0) <= 60
    assert 15 <= by.get("fr", 0) <= 25
    # flattening: per-stratum keep RATE is monotone in 1/size
    assert by["fr"] / 25 > by["de"] / 100 > by["en"] / 900
    out2 = sampling.temperature_mix(ds, total_keep=200, strata_col="lang").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_bpe_merges_match_scalar_and_layout(ray_session):
    """Both BPE learners (sharded-incremental scale path and all-Dataset
    baseline) equal the pure-python reference merge-for-merge
    (rank, left, right, count), regardless of block layout or shard
    count, and the deterministic tiebreak (lexicographic on ties) is
    exercised."""
    from crawl4ai_ray.stages.bpe import (
        apply_merge,
        learn_bpe_dataset,
        learn_bpe_scalar,
        learn_bpe_sharded,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest low newer",
        "ties tie tie ties",  # exercises count ties between pairs
    ] * 3
    want = learn_bpe_scalar(texts, 12)

    def rows_of(t):
        return list(
            zip(
                t.column("rank").to_pylist(),
                t.column("left").to_pylist(),
                t.column("right").to_pylist(),
                t.column("pair_count").to_pylist(),
            )
        )

    for blocks in (1, 4):
        ds = ray.data.from_items([{"text": t} for t in texts]).repartition(blocks)
        for shards in (1, 3):
            got = learn_bpe_sharded(ds, num_merges=12, num_shards=shards)
            assert rows_of(got) == want, f"blocks={blocks} shards={shards} diverged"
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(2)
    assert rows_of(learn_bpe_dataset(ds, num_merges=12)) == want
    # early stop: a corpus of 1-char words has one mergeable pair per word
    tiny = ray.data.from_items([{"text": "a b a"}])
    out = learn_bpe_sharded(tiny, num_merges=50)
    assert out.num_rows < 50  # stopped when no pair remained above vocab
    # greedy left-to-right apply: overlapping pair merges leftmost first
    assert apply_merge(list("aaa") + ["</w>"], "a", "a") == ["aa", "a", "</w>"]


def test_bpe_encode_rank_argmin_equals_sequential_and_tokenize(ray_session):
    """The GPT-2-style rank-argmin encoder equals the textbook sequential
    merge replay on every corpus word (incl. overlap-heavy words), and
    the actor-pool tokenize stage matches the scalar recompute."""
    from crawl4ai_ray.stages.bpe import (
        encode_word,
        encode_word_sequential,
        learn_bpe_scalar,
        tokenize_corpus,
        tokenize_scalar,
    )

    texts = [
        "banana bandana ananas banana",
        "aaaa aaa aa a aaaa",  # overlapping-pair stress
        "mississippi missive misses",
        "low lower lowest newer newest",
    ] * 2
    merge_rows = learn_bpe_scalar(texts, 20)
    merges = [(l, r) for _, l, r, _ in merge_rows]
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    vocab = {w for t in texts for w in t.split()}
    for w in sorted(vocab):
        assert encode_word(w, ranks) == encode_word_sequential(w, merges), w
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    got = tokenize_corpus(ds, merges).to_pandas().sort_values("doc_id")
    want = tokenize_scalar(list(range(len(texts))), texts, merges)
    assert (
        list(
            zip(
                got["doc_id"].astype(int),
                got["n_words"].astype(int),
                got["n_chars"].astype(int),
                got["n_tokens"].astype(int),
            )
        )
        == want
    )


def test_jsonl_roundtrip_values(ray_session, tmp_path):
    """Sink→source round trip under a pinned schema, including unicode,
    embedded newlines/quotes, and nulls; digest_ok True everywhere."""
    from crawl4ai_ray.sources.jsonl import read_jsonl, write_jsonl

    rows = {
        1: ("en", 'line one\nline "two" \\ backslash'),
        2: ("zh", "中文文本 é ü"),
        3: ("de", None),
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "lang": pa.array([v[0] for v in rows.values()], pa.string()),
                "text": pa.array([v[1] for v in rows.values()], pa.string()),
            }
        )
    )
    man = write_jsonl(ds, str(tmp_path), key_col="doc_id").take_all()
    assert sum(r["n_records"] for r in man) == 3
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
    )
    back = {r["doc_id"]: r for r in read_jsonl(str(tmp_path), schema).take_all()}
    assert back.keys() == rows.keys()
    for i, (lang, text) in rows.items():
        assert back[i]["lang"] == lang
        assert back[i]["text"] == text
        assert bool(back[i]["digest_ok"]) is True


def test_jsonl_write_deterministic_and_digest(ray_session, tmp_path):
    """Same rows → byte-identical shard under the same name; a tampered
    value flips digest_ok on read (in-band corruption check)."""
    import gzip
    import os as _os

    from crawl4ai_ray.sources.jsonl import read_jsonl, write_jsonl

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "lang": pa.array(["en", "fr"], pa.string()),
                "text": pa.array(["alpha", "beta"], pa.string()),
            }
        )
    )
    d1, d2 = str(tmp_path / "j1"), str(tmp_path / "j2")
    write_jsonl(ds, d1, key_col="doc_id").take_all()
    write_jsonl(ds, d2, key_col="doc_id").take_all()
    f1, f2 = sorted(_os.listdir(d1)), sorted(_os.listdir(d2))
    assert f1 == f2
    for f in f1:
        with open(_os.path.join(d1, f), "rb") as a, open(
            _os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read()
    # tamper one value (same byte length) inside the shard
    path = _os.path.join(d1, f1[0])
    with open(path, "rb") as f:
        data = gzip.decompress(f.read())
    with open(path, "wb") as f:
        f.write(gzip.compress(data.replace(b"alpha", b"aXpha"), mtime=0))
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
    )
    back = {r["doc_id"]: r for r in read_jsonl(d1, schema).take_all()}
    assert bool(back[10]["digest_ok"]) is False
    assert bool(back[11]["digest_ok"]) is True


def test_multi_source_bfs_hand_graph(ray_session):
    """Distances/attribution on a hand graph: tie at equal distance goes
    to the LOWEST seed id; propagation follows edge DIRECTION; nodes
    unreachable from every seed are omitted."""
    from crawl4ai_ray.stages.graph import multi_source_bfs

    #  10 -> 3 -> 4 -> 5     20 -> 4 (tie at node 4: dist 2 via 10, dist 1 via 20)
    #  6 -> 10 (wrong direction: 6 is NOT reachable)   7 isolated
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([10, 20, 3, 4, 5, 6, 7], pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([10, 3, 4, 20, 6], pa.int64()),
                "dst": pa.array([3, 4, 5, 4, 10], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: (r["dist"], r["seed"])
        for r in multi_source_bfs(nodes, edges, seeds=[10, 20]).take_all()
    }
    assert got == {
        10: (0, 10),
        20: (0, 20),
        3: (1, 10),
        4: (1, 20),  # dist 1 via seed 20 beats dist 2 via seed 10
        5: (2, 20),
    }


def test_ivfpq_prunes_cells_and_ranks(ray_session, tmp_path):
    """Single query → exactly nprobe of the cells are read
    (bytes_scanned < bytes_total), every neighbor comes from a probed
    cell, ranks are 1..k with nondecreasing fixed-point distances."""
    from crawl4ai_ray.stages.ann import ivfpq_topk

    rng = np.random.default_rng(7)
    n, d = 64, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            }
        )
    )
    out, tel = ivfpq_topk(
        ds,
        query_ids=[3],
        out_dir=str(tmp_path / "idx"),
        k=5,
        n_cells=4,
        nprobe=2,
        coarse_iters=2,
        m_subspaces=2,
        codebook_k=4,
        iters=2,
    )
    rows = out.take_all()
    assert tel["probed_cells"] == 2 and tel["total_cells"] == 4
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"]
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    dists = [r["dist_fp"] for r in rows]
    assert dists == sorted(dists)
    assert all(r["neighbor_id"] != 3 for r in rows)


def test_label_propagation_majority_ties_clamp(ray_session):
    """Mode voting: a node with one A-voter and two B-voters joins B;
    an exact 1-1 tie goes to the smallest label; seeds never flip even
    with contrary voters; unreached nodes are omitted."""
    from crawl4ai_ray.stages.graph import label_propagation

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([100, 200, 1, 2, 3, 4, 5, 6], pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([100, 200, 200, 1, 2, 3, 1, 2, 2], pa.int64()),
                "dst": pa.array([1, 2, 3, 4, 4, 4, 5, 5, 100], pa.int64()),
            }
        )
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            nodes, edges, seeds={100: 100, 200: 200}, n_sweeps=4
        ).take_all()
    }
    assert got == {100: 100, 200: 200, 1: 100, 2: 200, 3: 200, 4: 200, 5: 100}


def test_dhash_bits_and_one_pixel_sensitivity():
    """dHash packs bit[r][c] = g[r][c] < g[r][c+1] at weight 2^(r*8+c);
    a one-pixel change flips at most the two bits its comparisons touch
    ((0,0) touches only bit (0,0))."""
    from crawl4ai_ray.stages.multimodal import DHashImage

    g = np.zeros((8, 9), np.uint8)
    g[0, 1] = 5  # bit (0,0): g[0,0]=0 < 5 → set; bit (0,1): 5 < 0 → clear
    assert DHashImage._dhash(g) == 1
    g2 = g.copy()
    g2[3, 4] = 7  # sets bit (3,3): weight 2^(3*8+3)
    assert DHashImage._dhash(g2) == 1 + (1 << 27)
    # one-pixel bump at (0,0) flips at most bit (0,0)
    base = ((np.arange(72, dtype=np.int64) * 37) % 251).reshape(8, 9).astype(np.uint8)
    bumped = base.copy()
    bumped[0, 0] = (int(bumped[0, 0]) + 1) % 251
    x = DHashImage._dhash(base) ^ DHashImage._dhash(bumped)
    assert bin(x).count("1") <= 1


def test_mmr_prefers_diverse_over_redundant(ray_session):
    """Vector 2 is nearly identical to top hit 1; vector 3 is less
    relevant but orthogonal-ish — MMR's second pick must be 3, while
    pure relevance would pick 2."""
    from crawl4ai_ray.stages.ann import mmr_rerank

    # norms > 1 on the duplicate pair so sim(2,1) exceeds rel(2) and the
    # penalty term actually bites (the scores are unnormalized dots)
    emb = {
        0: [1.0, 0.0, 0.0, 0.0],    # query
        1: [1.0, 0.2, 0.0, 0.0],    # top hit
        2: [1.0, 0.19, 0.0, 0.0],   # near-dup of 1: rel 1.0, sim(2,1) ≈ 1.04
        3: [0.5, 0.0, 0.8, 0.0],    # diverse, lower rel
        4: [0.1, 0.0, 0.0, 0.9],    # mostly irrelevant
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(emb), pa.int64()),
                "embedding": pa.array(
                    list(emb.values()), pa.list_(pa.float32())
                ),
            }
        )
    )
    rows = sorted(
        mmr_rerank(ds, query_ids=[0], k_cand=4, k_out=3).take_all(),
        key=lambda r: r["rank"],
    )
    assert [r["neighbor_id"] for r in rows] == [1, 3, 4]


def test_audio_fingerprint_bits_and_nudge():
    """bit(n,m) = [E(n,m) > E(n,m+1)] at weight 2^(n*32+m); a one-sample
    change inside band b flips at most bits (n, b-1) and (n, b)."""
    from crawl4ai_ray.stages.multimodal import AudioFingerprint

    s = np.zeros(1024, np.int16)
    s[0:15] = 10  # frame 0 band 0 energy high → bit (0,0) set
    assert AudioFingerprint._fingerprint(s) == 1
    s2 = np.zeros(1024, np.int16)
    s2[512 + 15 : 512 + 30] = 3  # frame 1 band 1 → bit (1,1) at 2^(32+1)
    assert AudioFingerprint._fingerprint(s2) == (1 << 33)
    base = ((np.arange(1024, dtype=np.int64) * 37 + 11) % 1000) - 500
    base = base.astype(np.int16)
    bumped = base.copy()
    bumped[7] = bumped[7] + 1  # band 0 of frame 0
    x = AudioFingerprint._fingerprint(base) ^ AudioFingerprint._fingerprint(bumped)
    assert bin(x).count("1") <= 2


def test_hamming_pairs_complete_vs_bruteforce(ray_session):
    """The block-bucket candidate generation is COMPLETE within the
    radius: on random signatures with planted near pairs at every
    distance 0..r, hamming_pairs equals the O(n²) brute-force pair set
    (radii 2 and 4 — the ones the image/audio paths use)."""
    from crawl4ai_ray.stages.dedup import hamming_pairs

    rng = np.random.default_rng(11)
    sigs = rng.integers(0, 2**63, size=150, dtype=np.int64).astype(np.uint64)
    # plant near pairs: flip d bits of sig[i] into slot i+100 for d=0..4
    for d in range(5):
        s = np.uint64(sigs[d])
        for bit in rng.choice(64, size=d, replace=False):
            s ^= np.uint64(1) << np.uint64(bit)
        sigs[100 + d] = s
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(range(len(sigs)), pa.int64()),
                "sig": pa.array(sigs, pa.uint64()),
            }
        )
    )
    for radius in (2, 4):
        got = {
            (r["a"], r["b"])
            for r in hamming_pairs(
                ds, max_hamming=radius, id_col="id", sig_col="sig"
            ).take_all()
        }
        want = set()
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                if bin(int(sigs[i]) ^ int(sigs[j])).count("1") <= radius:
                    want.add((i, j))
        assert got == want, (radius, got ^ want)
        # the planted pairs at distance <= radius are all present
        for d in range(radius + 1):
            assert (d, 100 + d) in got


def test_kcore_hand_graph_and_bucketed_path_parity(ray_session):
    """Peeling on a hand graph: triangle {1,2,3} survives k=2; the tail
    4-5 needs TWO rounds to peel (5 first, then 4), the isolated pair
    6-7 one — exercising the multi-round loop. Then the same query on a
    200-node skew graph with broadcast_cap=0 (forcing the bucketed
    anti-join path) must equal the broadcast path row for row."""
    import numpy as np

    from crawl4ai_ray.stages.graph import kcore

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3, 3, 4, 6], pa.int64()),
                "dst": pa.array([2, 3, 1, 4, 5, 7], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["deg"] for r in kcore(edges, k=2).take_all()}
    assert got == {1: 2, 2: 2, 3: 2}

    n = 200
    ids = np.arange(n, dtype=np.int64)
    nz = ids[ids >= 1]
    skew = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([nz, ids]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([nz // 2, (ids * ids + 1) % n]), pa.int64()
                ),
            }
        )
    )
    broad = {(r["node"], r["deg"]) for r in kcore(skew, k=3).take_all()}
    bucketed = {
        (r["node"], r["deg"])
        for r in kcore(skew, k=3, broadcast_cap=0).take_all()
    }
    assert broad == bucketed and len(broad) > 0


def test_weighted_sample_es_matches_bruteforce_and_layout_independent(ray_session):
    """The distributed top-k (per-batch argpartition prune + sort/limit)
    must equal a single-process recompute of the E-S keys exactly, and be
    invariant to block layout (the prune is per batch, so this guards the
    'local k per block' logic)."""
    import hashlib
    import math

    import numpy as np

    from crawl4ai_ray.stages.sampling import weighted_sample_es

    n, k = 300, 20
    ids = np.arange(n, dtype=np.int64)
    w = (ids % 13 + 1).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})

    def brute():
        keys = []
        for d, wi in zip(ids.tolist(), w.tolist()):
            h = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
            keys.append((-math.log((h + 1.0) / 4294967296.0) / float(wi), d, wi))
        keys.sort()
        return [(d, wi, key) for key, d, wi in keys[:k]]

    expect = brute()
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        got = [
            (r["doc_id"], r["w"], r["es_key"])
            for r in weighted_sample_es(ds, k=k).take_all()
        ]
        assert got == expect


def test_budget_allocate_quota_and_bruteforce_parity(ray_session):
    """Hamilton apportionment invariants on an adversarial demand vector
    (heavy head + many ties): sum(alloc) == B exactly, every alloc within
    [floor, ceil] of its exact share (lower/upper quota), and bit-equal
    to a single-process reference incl. the (rem DESC, key ASC)
    tie-break — across block layouts."""
    import numpy as np

    from crawl4ai_ray.stages.agg import budget_allocate

    d = np.array([97, 1, 1, 1, 5, 5, 5, 40, 13, 2], dtype=np.int64)
    keys = [f"h{i:02d}" for i in range(len(d))]
    T = int(d.sum())
    B = 61

    def brute():
        base = (B * d) // T
        rem = (B * d) % T
        order = sorted(range(len(d)), key=lambda i: (-rem[i], keys[i]))
        leftover = B - int(base.sum())
        alloc = base.copy()
        for i in order[:leftover]:
            alloc[i] += 1
        return {keys[i]: (int(d[i]), int(alloc[i])) for i in range(len(d))}

    expect = brute()
    tbl = pa.table({"host": pa.array(keys), "demand": pa.array(d)})
    for nblocks in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        rows = budget_allocate(ds, B).take_all()
        got = {r["host"]: (r["demand"], r["alloc"]) for r in rows}
        assert got == expect
        assert sum(a for _, a in got.values()) == B
        for i, k in enumerate(keys):
            lo = (B * d[i]) // T
            hi = lo + (1 if (B * d[i]) % T else 0)
            assert lo <= got[k][1] <= hi


def test_common_neighbor_scores_hand_graph_and_pivot_cap(ray_session):
    """Square 1-2-3-4-1: the only candidates are the two diagonals
    (1,3) and (2,4), each with cn=2 and jaccard=2/(2+2-2)=1.0; the four
    existing edges must NOT appear. A pivot cap of 1 suppresses every
    wedge (all pivots have deg 2) -> empty result."""
    from crawl4ai_ray.stages.graph import common_neighbor_scores

    square = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3, 4], pa.int64()),
                "dst": pa.array([2, 3, 4, 1], pa.int64()),
            }
        )
    )
    got = {
        (r["u"], r["v"]): (r["cn"], r["jaccard"])
        for r in common_neighbor_scores(square).take_all()
    }
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}

    capped = common_neighbor_scores(square, max_pivot_degree=1).take_all()
    assert capped == []


def test_lexical_diversity_hand_cases(ray_session):
    """Counts on hand-built docs: all-distinct, all-same, mixed, empty
    (omitted), whitespace-only (omitted)."""
    from crawl4ai_ray.stages.textstats import lexical_diversity_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b c",          # 3 tokens, 3 distinct, 3 hapax
                    "x x x x",        # 4 tokens, 1 distinct, 0 hapax
                    "a b a c c d",    # 6 tokens, 4 distinct, 2 hapax (b, d)
                    "",
                    "   \t  ",
                ]
            ),
        }
    )
    out = lexical_diversity_batch(batch).to_pydict()
    assert out["doc_id"] == [1, 2, 3]
    assert out["n_tokens"] == [3, 4, 6]
    assert out["n_distinct"] == [3, 1, 4]
    assert out["n_hapax"] == [3, 0, 2]
    assert out["ttr"] == [1.0, 0.25, 4 / 6]
    assert out["hapax_ratio"] == [1.0, 0.0, 2 / 6]


def test_degree_assortativity_star_and_regular(ray_session):
    """A star graph is maximally disassortative (r = -1); a regular
    graph (cycle) has zero degree variance and must raise rather than
    emit 0/0."""
    import pytest as _pytest

    from crawl4ai_ray.stages.graph import degree_assortativity

    star = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 0, 0, 0], pa.int64()),
                "dst": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    row = degree_assortativity(star).take_all()[0]
    assert row["assortativity"] == -1.0

    cycle = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3], pa.int64()),
                "dst": pa.array([1, 2, 3, 0], pa.int64()),
            }
        )
    )
    with _pytest.raises(ValueError, match="degenerate"):
        degree_assortativity(cycle)


def test_fuzzy_one_edit_checks():
    """The specialized one-edit predicates must agree with a reference
    DP Levenshtein on exhaustive short strings (alphabet ab, len <= 4)."""
    import itertools

    from crawl4ai_ray.pipelines.queries_wave8 import q_fuzzy_url_pairs  # noqa: F401

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    # re-implement the predicates locally (they are closures inside the
    # query); this test pins the ALGORITHM the query relies on
    def one_sub(a, b):
        mism = 0
        for x, y in zip(a, b):
            if x != y:
                mism += 1
                if mism > 1:
                    return False
        return mism == 1

    def one_del(a, b):
        i = j = 0
        skipped = False
        while i < len(a) and j < len(b):
            if a[i] == b[j]:
                i += 1
                j += 1
            elif skipped:
                return False
            else:
                skipped = True
                j += 1
        return True

    words = [
        "".join(w)
        for n in range(5)
        for w in itertools.product("ab", repeat=n)
    ]
    for a in words:
        for b in words:
            if len(a) == len(b) and a != b:
                assert one_sub(a, b) == (lev(a, b) == 1), (a, b)
            if len(b) == len(a) + 1:
                assert one_del(a, b) == (lev(a, b) == 1), (a, b)


def test_pagerank_dual_path_parity(ray_session):
    """The small-graph broadcast fast path must agree with the
    distributed path bit-for-bit after the final ROUND(8) — same
    parity contract as random_walks' dual path."""
    from crawl4ai_ray.stages.graph import pagerank

    rng = np.random.RandomState(11)
    n = 60
    src = rng.randint(0, n, 300).astype(np.int64)
    dst = rng.randint(0, n, 300).astype(np.int64)
    outdeg = np.bincount(src, minlength=n)
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64), pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(1.0 / outdeg[src], pa.float64()),
            }
        )
    )
    fast = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, n_iters=4).take_all()
    }
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(
            nodes, edges, n_iters=4, small_threshold=0
        ).take_all()
    }
    assert fast == dist
    # personalized variant too
    fast_p = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, n_iters=4, seeds=[1, 2]).take_all()
    }
    dist_p = {
        r["node"]: r["rank"]
        for r in pagerank(
            nodes, edges, n_iters=4, seeds=[1, 2], small_threshold=0
        ).take_all()
    }
    assert fast_p == dist_p


def test_bfs_and_cc_dual_path_parity(ray_session):
    """multi_source_bfs / connected_components small-graph fast paths
    are exact integer fixpoints — outputs must be IDENTICAL to the
    distributed path (including dangling edge endpoints absent from
    the node list, which join the output once labeled)."""
    from crawl4ai_ray.stages.graph import connected_components, multi_source_bfs

    rng = np.random.RandomState(5)
    n = 50
    src = rng.randint(0, n + 5, 120).astype(np.int64)  # a few dangling ids
    dst = rng.randint(0, n + 5, 120).astype(np.int64)
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64), pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )

    def as_set(ds):
        return {tuple(sorted(r.items())) for r in ds.take_all()}

    assert as_set(multi_source_bfs(nodes, edges, [0, 3])) == as_set(
        multi_source_bfs(nodes, edges, [0, 3], small_threshold=0)
    )
    assert as_set(connected_components(nodes, edges)) == as_set(
        connected_components(nodes, edges, small_threshold=0)
    )


def test_lpa_dual_path_parity(ray_session):
    """label_propagation's small-graph fast path: integer votes +
    deterministic tie rule — output identical to the distributed path,
    including dangling endpoints and unlabeled nodes."""
    from crawl4ai_ray.stages.graph import label_propagation

    rng = np.random.RandomState(9)
    n = 40
    src = rng.randint(0, n + 4, 160).astype(np.int64)
    dst = rng.randint(0, n + 4, 160).astype(np.int64)
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64), pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    seeds = {0: 100, 7: 200, 13: 300}

    def as_set(ds):
        return {tuple(sorted(r.items())) for r in ds.take_all()}

    assert as_set(label_propagation(nodes, edges, seeds, n_sweeps=3)) == as_set(
        label_propagation(nodes, edges, seeds, n_sweeps=3, small_threshold=0)
    )


def test_hits_dual_path_parity(ray_session):
    """hits' small-graph fast path agrees with the distributed path
    after the final ROUND(8) — the pagerank parity contract."""
    from crawl4ai_ray.stages.graph import hits

    rng = np.random.RandomState(13)
    n = 50
    e = {(int(a), int(b)) for a, b in zip(rng.randint(0, n, 200),
                                          rng.randint(0, n, 200))}
    src = np.array([a for a, _ in sorted(e)], np.int64)
    dst = np.array([b for _, b in sorted(e)], np.int64)
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64), pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )

    def as_map(ds):
        return {r["node"]: (r["hub"], r["auth"]) for r in ds.take_all()}

    assert as_map(hits(nodes, edges, n_iters=4)) == as_map(
        hits(nodes, edges, n_iters=4, small_threshold=0)
    )


def test_pagerank_hits_dangling_fall_through(ray_session):
    """Edges referencing nodes outside the declared node set must not
    crash or misattribute mass in the fast paths — they fall through to
    the distributed path (review finding: searchsorted on undeclared
    endpoints was out-of-bounds/misindexed)."""
    from crawl4ai_ray.stages.graph import hits, pagerank

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 1, 2, 5], pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 0], pa.int64()),
                "dst": pa.array([9, 3, 1], pa.int64()),  # 9, 3 undeclared
                "w": pa.array([0.5, 1.0, 0.5], pa.float64()),
            }
        )
    )
    pr = {r["node"]: r["rank"] for r in pagerank(nodes, edges, n_iters=3).take_all()}
    pr_dist = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, n_iters=3, small_threshold=0).take_all()
    }
    assert pr == pr_dist  # identical because BOTH took the distributed path
    assert 9 in pr and 3 in pr  # dangling dsts receive rank rows
    h = hits(
        nodes,
        edges.drop_columns(["w"]),
        n_iters=2,
    ).take_all()
    h_dist = hits(
        nodes, edges.drop_columns(["w"]), n_iters=2, small_threshold=0
    ).take_all()
    as_map = lambda rows: {r["node"]: (r["hub"], r["auth"]) for r in rows}
    assert as_map(h) == as_map(h_dist)


def test_salsa_dual_path_parity_and_semantics(ray_session):
    """salsa's small-graph fast path is BIT-equal to the distributed
    path (all-integer arithmetic — no ROUND needed), and the pushes
    conserve the degree-division semantics: total authority mass after
    round 1 equals sum over nodes with out-edges of q (up to per-edge
    floor loss < outdeg per sender)."""
    from crawl4ai_ray.stages.graph import salsa

    rng = np.random.RandomState(7)
    n = 40
    e = {(int(a), int(b)) for a, b in zip(rng.randint(0, n, 150),
                                          rng.randint(0, n, 150))}
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64), pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in sorted(e)], pa.int64()),
                "dst": pa.array([b for _, b in sorted(e)], pa.int64()),
            }
        )
    )

    def as_map(ds):
        return {r["node"]: (r["auth_q"], r["hub_q"]) for r in ds.take_all()}

    local = as_map(salsa(nodes, edges, n_iters=3, q=10**9))
    dist = as_map(salsa(nodes, edges, n_iters=3, q=10**9, small_threshold=0))
    assert local == dist
    assert len(local) == n  # every node keeps a row, isolated ones at 0

    # one-round mass check: senders emit q - (q % outdeg) in total
    one = salsa(nodes, edges, n_iters=1, q=10**9)
    outdeg = {}
    for a, _ in e:
        outdeg[a] = outdeg.get(a, 0) + 1
    expect_auth_mass = sum(10**9 - (10**9 % d) for d in outdeg.values())
    got_auth_mass = sum(v[0] for v in as_map(one).values())
    assert got_auth_mass == expect_auth_mass


def test_bounded_sssp_dual_path_parity_and_horizon(ray_session):
    """bounded_sssp's fast path is BIT-equal to the distributed path,
    and the horizon semantics hold: with rounds < needed hops a far
    node stays unreached (-1); with enough rounds it gets the true
    weighted distance on a hand-built path graph."""
    from crawl4ai_ray.stages.graph import bounded_sssp

    # path 0-1-2-3-4 with weights 2,3,4,5 plus a heavy shortcut 0->4 (99)
    src = np.array([0, 1, 2, 3, 0], np.int64)
    dst = np.array([1, 2, 3, 4, 4], np.int64)
    w = np.array([2, 3, 4, 5, 99], np.int64)
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(5, dtype=np.int64), pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )
    )

    def as_map(ds):
        return {r["node"]: r["dist"] for r in ds.take_all()}

    for rounds, expect4 in [(1, 99), (4, 14), (12, 14)]:
        local = as_map(bounded_sssp(nodes, edges, source=0, rounds=rounds))
        dist = as_map(
            bounded_sssp(nodes, edges, source=0, rounds=rounds,
                         small_threshold=0)
        )
        assert local == dist
        assert local[4] == expect4
    assert as_map(bounded_sssp(nodes, edges, source=0, rounds=1))[2] == -1


def test_merkle_root_dual_path_parity(ray_session):
    """merkle_root's distributed rank+halving-groupby fold is bit-equal
    to the local collect-and-fold fast path (md5 arithmetic is
    deterministic), for even, odd-promotion, and sparse-key leaf sets;
    insufficient levels raise on both paths."""
    import hashlib as hl

    import pytest as pt

    from crawl4ai_ray.stages.merkle import merkle_root

    def mk(keys):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(keys, pa.int64()),
                    "h": pa.array(
                        [hl.md5(str(k).encode()).hexdigest() for k in keys],
                        pa.string(),
                    ),
                }
            )
        ).repartition(4)

    for keys in [list(range(8)), list(range(13)), [3, 99, 7, 1000, 42]]:
        local = merkle_root(mk(keys), levels=6)
        dist = merkle_root(mk(keys), levels=6, small_threshold=0,
                           num_partitions=3)
        assert local == dist
        assert local[0] == len(keys)

    # scalar recompute for the odd case: promotion keeps the tail hash
    keys = list(range(5))
    lv = [hl.md5(str(k).encode()).hexdigest() for k in keys]
    while len(lv) > 1:
        lv = [
            hl.md5((lv[i] + lv[i + 1]).encode()).hexdigest()
            if i + 1 < len(lv) else lv[i]
            for i in range(0, len(lv), 2)
        ]
    assert merkle_root(mk(keys), levels=6)[1] == lv[0]
    assert merkle_root(mk(keys), levels=6, small_threshold=0)[1] == lv[0]

    with pt.raises(ValueError):
        merkle_root(mk(list(range(9))), levels=2)
    with pt.raises(ValueError):
        merkle_root(mk(list(range(9))), levels=2, small_threshold=0)
    assert merkle_root(mk([]).filter(lambda r: False), levels=3) == (0, "")


def test_bucketed_lookup_join_semantics(ray_session):
    """stages/agg.bucketed_lookup_join: broadcast-free key join — value
    attached to every probe row, column set preserved, string and int
    keys both supported, missing probe keys raise."""
    import pytest as pt

    from crawl4ai_ray.stages.agg import bucketed_lookup_join

    rows = ray.data.from_items(
        [{"w": f"t{i % 5}", "payload": i} for i in range(40)]
    ).repartition(4)
    lk = ray.data.from_items([{"w": f"t{j}", "score": 100 + j} for j in range(5)])
    out = bucketed_lookup_join(rows, lk, key="w", value_col="score").to_pandas()
    assert len(out) == 40
    assert sorted(out.columns) == ["payload", "score", "w"]
    assert (out["score"] == 100 + out["w"].str[1:].astype(int)).all()

    ints = ray.data.from_items([{"k": i % 3, "x": i} for i in range(12)])
    ilk = ray.data.from_items([{"k": j, "v": j * 7} for j in range(3)])
    iout = bucketed_lookup_join(ints, ilk, key="k", value_col="v").to_pandas()
    assert (iout["v"] == iout["k"] * 7).all()

    bad = ray.data.from_items([{"w": "missing", "payload": 0}])
    with pt.raises((KeyError, Exception)):
        bucketed_lookup_join(bad, lk, key="w", value_col="score").materialize()


def test_bucketed_lookup_join_left_null_fills(ray_session):
    """r5 LEFT variant: probe keys absent from the lookup null-fill
    instead of raising (deleted_interpolation's held-out probes), and
    an all-miss bucket (no lookup rows at all) null-fills too."""
    from crawl4ai_ray.stages.agg import bucketed_lookup_join

    rows = ray.data.from_items(
        [{"w": f"t{i % 8}", "payload": i} for i in range(32)]
    ).repartition(4)
    lk = ray.data.from_items(
        [{"w": f"t{j}", "score": 100 + j} for j in range(4)]
    )
    out = bucketed_lookup_join(
        rows, lk, key="w", value_col="score", left=True
    ).to_pandas()
    assert len(out) == 32
    hit = out["w"].str[1:].astype(int) < 4
    assert (out.loc[hit, "score"] == 100 + out.loc[hit, "w"].str[1:].astype(int)).all()
    assert out.loc[~hit, "score"].isna().all()

    # lookup empty entirely (typed empty table): every probe row
    # survives, value all-null
    empty_lk = ray.data.from_arrow(
        pa.table(
            {"w": pa.array([], pa.string()), "score": pa.array([], pa.int64())}
        )
    )
    out2 = bucketed_lookup_join(
        rows, empty_lk, key="w", value_col="score", left=True
    ).to_pandas()
    assert len(out2) == 32 and out2["score"].isna().all()

"""Tenth-wave operator tests: hand-computed parity on tiny inputs."""

import pyarrow as pa
import pyarrow.parquet as pq

import ray


def _write_docs(tmp_path, ids, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["src0"] * len(ids), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_kmv_overlap_small_set_exact_branch(ray_session, tmp_path):
    """With both sets smaller than k the sketches ARE the sets: the
    estimators must return exact cardinalities and exact Jaccard."""
    from crawl4ai_ray.pipelines.queries_wave10 import q_kmv_overlap

    sf = _write_docs(tmp_path, list(range(10)), ["w"] * 10)
    r = q_kmv_overlap(sf).to_pylist()[0]
    # A drops id%7==3 -> {3} out of 0..9 -> 9 elems; B drops id%10==6 -> 9
    assert (r["exact_a"], r["exact_b"], r["exact_intersection"]) == (9, 9, 8)
    assert r["est_a"] == 9.0 and r["est_b"] == 9.0 and r["est_union"] == 10.0
    assert r["jaccard_est"] == 8.0 / 10.0
    assert r["est_intersection"] == (8.0 / 10.0) * 10.0


def test_seed_cover_bruteforce_parity(ray_session, tmp_path):
    """Greedy 1-hop set cover must match an independent brute-force
    replication of the same tie-break and coverage rules."""
    from crawl4ai_ray.pipelines.queries_wave10 import (
        _COVER_ROUNDS,
        q_seed_cover,
    )

    n = 37
    sf = _write_docs(tmp_path, list(range(n)), ["w"] * n)
    got = [
        (r["round"], r["seed"], r["gain"], r["covered_after"])
        for r in q_seed_cover(sf).to_pylist()
    ]

    adj = {}
    for s in range(n):
        for d in {(2 * s + 1) % n, (2 * s + 2) % n, (7 * s + 3) % n}:
            if d != s:
                adj.setdefault(s, set()).add(d)
    covered, picked, want = set(), set(), []
    for rnd in range(1, _COVER_ROUNDS + 1):
        gains = {
            s: len(adj[s] - covered)
            for s in adj
            if s not in picked and len(adj[s] - covered) > 0
        }
        seed = min(gains, key=lambda s: (-gains[s], s))
        covered |= adj[seed] | {seed}
        picked.add(seed)
        want.append((rnd, seed, gains[seed], len(covered)))
    assert got == want


def test_rake_keywords_hand_scores(ray_session, tmp_path):
    """freq/deg/score arithmetic on a two-doc corpus, including the
    fixed-point integer division and the desc-score/asc-phrase order."""
    from crawl4ai_ray.pipelines.queries_wave10 import q_rake_keywords

    sf = _write_docs(
        tmp_path, [0, 1, 2], ["fast key the fast", "key", "the the"]
    )
    rows = [
        (r["phrase"], r["n_occ"], r["score"])
        for r in q_rake_keywords(sf).take_all()
    ]
    # freq(fast)=2 deg(fast)=2+1=3 -> 1_500_000_000; freq(key)=2
    # deg(key)=2+1=3 -> 1_500_000_000. Stopword-only doc contributes
    # nothing.
    assert rows == [
        ("fast key", 1, 3_000_000_000),
        ("fast", 1, 1_500_000_000),
        ("key", 1, 1_500_000_000),
    ]


def test_host_gini_hand_distribution(ray_session, tmp_path, monkeypatch):
    """counts {a:1, b:1, c:4}: sorted ranks (a,1),(b,1),(c,4) ->
    S1 = 1+2+12 = 15, S0 = 6, n = 3; Gini = 30/18 - 4/3 = 1/3."""
    import crawl4ai_ray.pipelines.queries as q
    from crawl4ai_ray.pipelines.queries_wave10 import q_host_gini

    urls = (
        ["https://a.example.com/1"]
        + ["https://b.example.com/1"]
        + [f"https://c.example.com/{i}" for i in range(4)]
    )
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    monkeypatch.setattr(q, "_pages_ds", lambda sf_dir, columns=None: ds)
    r = q_host_gini("unused").to_pylist()[0]
    assert (r["n_hosts"], r["total_pages"]) == (3, 6)
    assert r["gini"] == 30.0 / 18.0 - 4.0 / 3.0


def test_compression_ratio_known_text(ray_session, tmp_path):
    import zlib

    from crawl4ai_ray.pipelines.queries_wave10 import q_compression_ratio

    texts = ["abc " * 100, "xyz", ""]
    sf = _write_docs(tmp_path, [0, 1, 2], texts)
    rows = {r["doc_id"]: r for r in q_compression_ratio(sf).take_all()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        cl = len(zlib.compress(raw, 6))
        assert rows[i]["raw_len"] == len(raw)
        assert rows[i]["comp_len"] == cl
        assert rows[i]["ratio"] == cl / max(len(raw), 1)
    # repetitive text compresses far below 1; the ratio is the signal
    assert rows[0]["ratio"] < 0.1 < rows[1]["ratio"]


def test_rendezvous_assign_bruteforce_parity(ray_session, monkeypatch):
    import hashlib

    import numpy as np

    import crawl4ai_ray.pipelines.queries as q
    from crawl4ai_ray.pipelines.queries_wave10 import (
        _HRW_WORKERS,
        q_rendezvous_assign,
    )

    hosts = [f"h{i}.example.com" for i in range(40)]
    urls = [f"https://{h}/p{j}" for i, h in enumerate(hosts) for j in range(i % 3 + 1)]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    monkeypatch.setattr(q, "_pages_ds", lambda sf_dir, columns=None: ds)
    got = {r["worker"]: (r["n_hosts"], r["n_pages"]) for r in q_rendezvous_assign("x").take_all()}

    want = {}
    for i, h in enumerate(hosts):
        scores = [
            int(hashlib.md5(f"{h}#{w}".encode()).hexdigest()[:15], 16)
            for w in range(_HRW_WORKERS)
        ]
        w = int(np.argmax(scores))
        nh, np_ = want.get(w, (0, 0))
        want[w] = (nh + 1, np_ + i % 3 + 1)
    assert got == want


def test_water_level_properties():
    from crawl4ai_ray.pipelines.queries_wave10 import _water_level

    cases = [
        ([(1, 1), (3, 1), (10, 1)], 4, 1),
        ([(5, 4)], 20, 5),        # budget == total -> full satisfaction
        ([(5, 4)], 19, 4),
        ([(2, 3), (100, 1)], 50, 44),  # 2+2+2+44 = 50
    ]
    for hist, budget, want in cases:
        lev = _water_level(hist, budget)
        assert lev == want
        # defining property: alloc(L) <= B < alloc(L+1) (when not saturated)
        def alloc(L):
            return sum(min(v, L) * c for v, c in hist)
        assert alloc(lev) <= budget
        if lev < max(v for v, _ in hist):
            assert alloc(lev + 1) > budget


def test_fair_share_alloc_hand_case(ray_session, monkeypatch):
    import crawl4ai_ray.pipelines.queries as q
    from crawl4ai_ray.pipelines.queries_wave10 import q_fair_share_alloc

    # demands a:10 b:3 c:1, total 14, budget 4 -> L=1, leftover 1 goes to
    # the highest-demand uncapped host (a)
    urls = (
        [f"https://a.example.com/{i}" for i in range(10)]
        + [f"https://b.example.com/{i}" for i in range(3)]
        + ["https://c.example.com/0"]
    )
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    monkeypatch.setattr(q, "_pages_ds", lambda sf_dir, columns=None: ds)
    got = {r["host"]: (r["demand"], r["alloc"]) for r in q_fair_share_alloc("x").take_all()}
    assert got == {
        "a.example.com": (10, 2),
        "b.example.com": (3, 1),
        "c.example.com": (1, 1),
    }
    assert sum(a for _, a in got.values()) == 14 // 3


def test_zipf_fit_planted_powerlaw(ray_session, tmp_path):
    """freqs 30/r for ranks 1..3 -> ln f = ln 30 - ln r: slope -1,
    intercept ln 30 (up to the 1e-9 quantization)."""
    import math

    from crawl4ai_ray.pipelines.queries_wave10 import q_zipf_fit

    text = " ".join(["a"] * 30 + ["b"] * 15 + ["c"] * 10)
    sf = _write_docs(tmp_path, [0], [text])
    r = q_zipf_fit(sf).to_pylist()[0]
    assert r["n_points"] == 3
    assert abs(r["slope"] - (-1.0)) < 1e-6
    assert abs(r["intercept"] - math.log(30.0)) < 1e-6


def test_logreg_auc_pairwise_bruteforce_parity(ray_session, tmp_path):
    """AUC from the rank-sum fold must equal the O(n_pos*n_neg) pairwise
    definition (1 per win, 0.5 per tie) on the same fitted scores."""
    from crawl4ai_ray.stages.logreg import fit_logreg_quality, logreg_auc, _xy
    import math

    # positives: stopword-dense ("the a of ..."); negatives: content-only
    texts = []
    for i in range(30):
        texts.append("the a of to in " + "word " * (i % 4))          # y=1
        texts.append("alpha beta gamma delta " + "word " * (i % 5))  # y=0
    sf = _write_docs(tmp_path, list(range(len(texts))), texts)
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])

    r = logreg_auc(docs, iters=12, lr=2.0, pos_weight=6.0).to_pylist()[0]

    # independent pairwise recompute from the same fit
    w, feats = fit_logreg_quality(docs, iters=12, lr=2.0, pos_weight=6.0)
    ps, ys = [], []
    for batch in feats.iter_batches(batch_format="pyarrow"):
        x, y = _xy(batch)
        for i in range(len(y)):
            z = sum(w[j] * x[j][i] for j in range(5))
            ps.append(round(1.0 / (1.0 + math.exp(-z)), 8))
            ys.append(y[i] == 1.0)
    pos = [p for p, yy in zip(ps, ys) if yy]
    neg = [p for p, yy in zip(ps, ys) if not yy]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    wins = sum(1.0 if pp > pn else 0.5 if pp == pn else 0.0 for pp in pos for pn in neg)
    assert abs(r["auc"] - wins / (len(pos) * len(neg))) < 1e-12
    assert 0.5 < r["auc"] <= 1.0  # the classifier must actually separate


def test_recrawl_pipeline_admission_invariants(ray_session):
    """On the real sf0.001 corpus: per-host ranks are contiguous 1..n_h,
    the total admitted equals the water-filled budget (total_stale // 3),
    and no host exceeds its demand."""
    from collections import Counter

    from crawl4ai_ray.pipelines.queries_wave10 import (
        _water_level,
        q_recrawl_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_recrawl_pipeline(sf).take_all()
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host_id"], []).append(r["rk"])
    for h, rks in per_host.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), h

    # independent demand recompute: stale = >=1 change over the 6-snap log
    import hashlib

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    demands = Counter()
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        v = 0
        hashes = []
        for k in range(6):
            if k >= 1 and (did * 3 + k * k) % 7 == 0:
                v += 1
            if (did + k) % 13 != 0:
                hashes.append(hashlib.md5(f"{text}#v{v}".encode()).hexdigest())
        changes = sum(1 for a, b in zip(hashes, hashes[1:]) if a != b)
        if changes >= 1:
            demands[0 if did % 7 == 0 else did % 20] += 1
    total = sum(demands.values())
    budget = total // 3
    assert len(rows) == budget
    lev = _water_level(sorted(Counter(demands.values()).items()), budget)
    for h, rks in per_host.items():
        assert len(rks) <= demands[h]
        assert len(rks) >= min(demands[h], lev)  # base share always granted


def test_kmeans_silhouette_scalar_recompute(ray_session, tmp_path):
    """Per-cluster means must equal a scalar recompute of the simplified
    silhouette from the same fitted centroids; tight planted clusters
    must score near 1."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    import crawl4ai_ray.pipelines.queries_wave10 as w10
    from crawl4ai_ray.stages.cluster import kmeans_fp, quantize_embeddings

    # 8 well-separated anchors (the k-means inits) + 5 satellites each
    rng_pts = []
    for c in range(8):
        base = [float(10 * c), float(3 * c * c)]
        rng_pts.append(base)
    for c in range(8):
        for j in range(5):
            rng_pts.append([10 * c + 0.01 * (j + 1), 3 * c * c + 0.01 * j])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(rng_pts)), pa.int64()),
            "embedding": pa.array(rng_pts, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = {r["cluster"]: r for r in w10.q_kmeans_silhouette(str(tmp_path)).take_all()}

    emb = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    _, cents = kmeans_fp(emb, k=8, iters=4)
    e = quantize_embeddings(tbl, "embedding").astype(np.int64)
    want_sum, want_n = {}, {}
    for i in range(e.shape[0]):
        d2 = [int(((e[i] - cents[c]) ** 2).sum()) for c in range(8)]
        srt = sorted(range(8), key=lambda c: (d2[c], c))
        a, b = d2[srt[0]], d2[srt[1]]
        mx = max(a, b)
        s = 0.0 if mx == 0 else (math.sqrt(float(b)) - math.sqrt(float(a))) / math.sqrt(float(mx))
        cl = srt[0]
        want_sum[cl] = want_sum.get(cl, 0) + math.floor(s * 1e9 + 0.5)
        want_n[cl] = want_n.get(cl, 0) + 1
    assert set(got) == set(want_n)
    for cl in want_n:
        assert got[cl]["n"] == want_n[cl]
        assert got[cl]["mean_silhouette"] == want_sum[cl] / 1e9 / want_n[cl]
        assert got[cl]["mean_silhouette"] > 0.9  # tight planted clusters


def test_snapshot_novelty_hand_cases(ray_session, tmp_path):
    """doc 10 (in both, %5==0 so curr text gets 'v2'): only the grams
    touching the changed last token are novel; doc 3 (curr-only,
    %7==3): fully novel; doc 6 (%10==6): absent from curr."""
    from crawl4ai_ray.pipelines.queries_wave10 import q_snapshot_novelty

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 10 tokens -> 6 grams
    texts = {i: f"x{i} " * 12 for i in range(12)}
    texts[10] = base
    texts[3] = "n0 n1 n2 n3 n4 n5"
    texts[6] = base
    sf = _write_docs(
        tmp_path, sorted(texts), [texts[i].strip() for i in sorted(texts)]
    )
    rows = {r["doc_id"]: r for r in q_snapshot_novelty(sf).take_all()}
    assert 6 not in rows  # dropped from curr
    # doc 10: curr = "... w9v2": grams 1-5 unchanged? no — last token in
    # grams (w5..w9v2) changes grams at positions 5..9 start idx 6..6?
    # 10 tokens -> grams start 0..5; token 9 appears in grams 5 only...
    # tokens 5-9 form gram idx 5; w9 is in grams with start >= 5: only
    # gram 5. So 1 of 6 grams novel.
    r10 = rows[10]
    assert (r10["n_grams"], r10["n_novel"]) == (6, 1)
    assert r10["novelty"] == 1.0 / 6.0
    # doc 3 is new in curr (prev drops %7==3): every gram novel (its
    # n-tokens are unique to it)
    r3 = rows[3]
    assert (r3["n_grams"], r3["n_novel"]) == (2, 2) and r3["novelty"] == 1.0


def test_lang_mixing_hand_cases(ray_session, tmp_path):
    """One French window + one English window -> mixed doc with one
    disagreement; an all-unknown doc votes nothing; tie votes break to
    the lexicographically lowest language."""
    from crawl4ai_ray.pipelines.queries_wave10 import q_lang_mixing

    fr = "le la les et " + "mot " * 16          # 20 tokens, window 0 -> fr
    en = "the and of to " + "word " * 16        # 20 tokens, window 1 -> en
    texts = [
        (fr + en).strip(),          # doc 0: mixed, majority tie en/fr -> en
        "zz yy xx",                 # doc 1: unconfident everywhere
        "de la",                    # doc 2: 'de' votes de/es/fr/it, 'la'
                                    # votes es/fr/it -> es,fr,it have 2;
                                    # tie -> es
    ]
    sf = _write_docs(tmp_path, [0, 1, 2], texts)
    rows = {r["doc_id"]: r for r in q_lang_mixing(sf).take_all()}
    r0 = rows[0]
    assert (r0["n_windows"], r0["n_confident"], r0["n_langs"]) == (2, 2, 2)
    assert r0["majority_lang"] == "en" and r0["n_disagree"] == 1
    r1 = rows[1]
    assert (r1["n_confident"], r1["majority_lang"], r1["n_disagree"]) == (
        0, "unknown", 0,
    )
    r2 = rows[2]
    assert (r2["n_confident"], r2["majority_lang"]) == (1, "es")


def test_water_level_hypothesis_property():
    """For random demand histograms and budgets: L = _water_level is the
    unique max integer with alloc(L) <= budget."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl4ai_ray.pipelines.queries_wave10 import _water_level

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40),
        st.integers(min_value=0, max_value=20_000),
    )
    def check(demands, budget):
        hist = sorted(Counter(demands).items())
        lev = _water_level(hist, budget)

        def alloc(L):
            return sum(min(d, L) for d in demands)

        assert alloc(lev) <= budget
        if lev < max(demands):
            assert alloc(lev + 1) > budget
        assert lev >= 0

    check()


def test_scene_cuts_within_shot_zero_across_shot_cut(ray_session, tmp_path):
    """Within-shot consecutive frames are identical (dist 0, no cut);
    every planted shot boundary must be detected; cut positions follow
    (id + 17*f) % 5 == 0 exactly."""
    from crawl4ai_ray.pipelines.queries_wave10 import (
        _SCENE_CUT_DIST,
        _SCENE_FRAMES,
        q_scene_cuts,
    )

    sf = _write_docs(tmp_path, list(range(40)), ["w"] * 40)
    rows = q_scene_cuts(sf).take_all()
    assert len(rows) == 40 * (_SCENE_FRAMES - 1)
    for r in rows:
        boundary = (r["media_id"] + 17 * r["frame_idx"]) % 5 == 0
        if boundary:
            assert r["dist"] >= _SCENE_CUT_DIST and r["is_cut"], r
        else:
            assert r["dist"] == 0 and not r["is_cut"], r


def test_sniff_mime_signatures():
    """Every signature, the HTML probe (with leading whitespace and
    case-insensitivity), and the unknown fallback."""
    from crawl4ai_ray.pipelines.queries_wave10 import sniff_mime

    assert sniff_mime(b"%PDF-1.4 blah") == "application/pdf"
    assert sniff_mime(b"\xff\xd8\xff\xe1EXIF") == "image/jpeg"
    assert sniff_mime(b"\x89PNG\r\n\x1a\nIHDR") == "image/png"
    assert sniff_mime(b"GIF89a....") == "image/gif"
    assert sniff_mime(b"GIF87a....") == "image/gif"
    assert sniff_mime(b"\x1f\x8b\x08rest") == "application/gzip"
    assert sniff_mime(b"  \n<!DOCTYPE HTML><html>") == "text/html"
    assert sniff_mime(b"<HTML><head>") == "text/html"
    assert sniff_mime(b"random bytes") == "application/octet-stream"
    assert sniff_mime(b"") == "application/octet-stream"


def test_mime_sniff_planted_mismatches(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.queries_wave10 import q_mime_sniff

    sf = _write_docs(tmp_path, list(range(40)), ["w"] * 40)
    rows = {r["doc_id"]: r for r in q_mime_sniff(sf).take_all()}
    for did, r in rows.items():
        if did % 17 == 0 and did % 6 != 0:
            assert r["mismatch"] and r["declared"] == "text/html"
        else:
            assert not r["mismatch"]
    assert rows[17]["sniffed"] == "application/gzip"  # 17 % 6 == 5


def test_minhash_estimator_identical_and_disjoint(ray_session, tmp_path):
    """Identical shingle sets after the drop -> est == exact == 1; a
    short doc whose drop removes everything is excluded; estimate stays
    within [0,1] with n_match on the 1/16 grid."""
    from crawl4ai_ray.pipelines.queries_wave10 import (
        _MH_EST_PERMS,
        q_minhash_estimator,
    )

    texts = [
        "a a a a a a",       # drop-first leaves identical shingle set {a a a}
        "x y",               # <3 tokens: no shingles at all -> excluded
        "p q r s t u v w",   # generic near-copy pair
    ]
    sf = _write_docs(tmp_path, [0, 1, 2], texts)
    rows = {r["a_id"]: r for r in q_minhash_estimator(sf).take_all()}
    assert set(rows) == {0, 2}
    r0 = rows[0]
    assert r0["n_match"] == _MH_EST_PERMS
    assert r0["jaccard_est"] == 1.0 and r0["jaccard_exact"] == 1.0
    r2 = rows[2]
    # copy = drop first token: exact J = 5/6 (6 shingles vs 5, 5 shared)
    assert r2["jaccard_exact"] == 5.0 / 6.0
    assert 0.0 <= r2["jaccard_est"] <= 1.0
    assert r2["n_match"] * 1.0 / _MH_EST_PERMS == r2["jaccard_est"]


def test_minhash_bbit_truncation_and_correction(ray_session, tmp_path):
    """Truncated matches can only gain over full-width matches (low-bit
    collisions), the correction maps a full match to exactly 1.0, and
    identical sets stay at 1.0."""
    from crawl4ai_ray.pipelines.queries_wave10 import (
        _BBIT_B,
        _MH_EST_PERMS,
        q_minhash_bbit,
        q_minhash_estimator,
    )

    texts = ["a a a a a a", "p q r s t u v w"]
    sf = _write_docs(tmp_path, [0, 1], texts)
    full = {r["a_id"]: r for r in q_minhash_estimator(sf).take_all()}
    bbit = {r["a_id"]: r for r in q_minhash_bbit(sf).take_all()}
    floor = 1.0 / (1 << _BBIT_B)
    for a in full:
        assert bbit[a]["n_match_b"] >= full[a]["n_match"]
        want = (bbit[a]["n_match_b"] / _MH_EST_PERMS - floor) / (1.0 - floor)
        assert bbit[a]["jaccard_bbit"] == want
    assert bbit[0]["n_match_b"] == _MH_EST_PERMS
    assert bbit[0]["jaccard_bbit"] == 1.0

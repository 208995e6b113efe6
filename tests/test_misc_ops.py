"""Coverage for the long tail of SURVEY §2 operators: link scoring,
cosine-cluster stage, LLM stubs, raw/file sources, text helpers."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from crawl4ai_ray.config import ScrapeConfig
from crawl4ai_ray.functions.link_scoring import (
    calculate_link_intrinsic_score,
    calculate_total_score,
    extract_page_context,
)
from crawl4ai_ray.functions.llm import (
    LLMContentFilter,
    LLMConfig,
    LLMExtractionStrategy,
)
from crawl4ai_ray.functions.text import (
    advanced_split,
    clean_tokens,
    extract_xml_data,
    sanitize_input_encode,
    split_and_parse_json_objects,
)
from crawl4ai_ray.html.scrape import scrape_page


def test_link_scoring_in_scrape():
    html = (
        "<html><head><title>Python tutorial guide</title></head><body>"
        "<h1>Python tutorial</h1>"
        '<a href="https://a.com/docs/python" title="good docs">python tutorial docs</a>'
        '<a href="https://a.com/x/y/z/w/k/j/click/">here</a>'
        "</body></html>"
    )
    r = scrape_page("https://a.com/base", html, ScrapeConfig(score_links=True))
    links = {l["href"]: l for l in r["links_internal"]}
    good = links["https://a.com/docs/python"]["intrinsic_score"]
    bad = links["https://a.com/x/y/z/w/k/j/click"]["intrinsic_score"]
    assert good > bad
    assert 0.0 <= bad <= 10.0 and 0.0 <= good <= 10.0


def test_page_context_and_total_score():
    ctx = extract_page_context("Py docs", "API guide", "reference manual", "https://docs.x.com")
    assert ctx["is_docs_site"]
    assert "guide" in ctx["terms"]
    s = calculate_link_intrinsic_score("api guide", "https://docs.x.com/api/", "title here", "", "", ctx)
    assert s > 3
    assert calculate_total_score(8.0, 0.5) == pytest.approx(0.7 * 0.8 + 0.3 * 0.5)
    assert calculate_total_score(None, None) is None


def test_cosine_cluster_stage(ray_session):
    from crawl4ai_ray.stages.embed import cosine_sections

    rows = [
        {"url": "u1", "text": ("spark data engine " * 30) + (" cooking pasta recipe " * 30)},
        {"url": "u2", "text": "tiny"},
    ]
    ds = ray.data.from_items(rows)
    out = cosine_sections(ds).to_pandas()
    assert set(out["url"]) == {"u1", "u2"}
    # u1's two topic runs should split into >1 cluster
    assert len(out[out.url == "u1"]) >= 2


def test_llm_stubs():
    with pytest.raises(NotImplementedError):
        LLMExtractionStrategy().extract("u", "content")
    with pytest.raises(NotImplementedError):
        LLMContentFilter().filter_content("<p>x</p>")
    # injected completion path works end-to-end
    strat = LLMExtractionStrategy(
        llm_config=LLMConfig(provider="stub"),
        instruction="extract",
        completion_fn=lambda prompt: '[{"k": 1}]',
    )
    assert strat.extract("u", "text") == [{"k": 1}]
    filt = LLMContentFilter(completion_fn=lambda p: "kept")
    assert filt.filter_content("<p>x</p>") == ["kept"]
    assert filt.filter_content("<p>x</p>") == ["kept"]  # cached


def test_raw_and_file_sources(ray_session, tmp_path):
    from crawl4ai_ray.sources.raw import from_raw_html, read_html_files, seed_urls

    ds = from_raw_html([("raw://1", "<p>hello world</p>")])
    assert ds.count() == 1
    f = tmp_path / "page.html"
    f.write_text("<p>file content</p>")
    fds = read_html_files([str(f)])
    row = fds.take(1)[0]
    assert row["url"].startswith("file://") and b"file content" in row["html"]
    seeds = seed_urls(
        ["https://a.com/docs/1", "https://a.com/blog/2"], pattern="*/docs/*"
    )
    assert seeds.count() == 1


def test_text_helpers():
    assert clean_tokens(["the", "Spark", "engine", "to", "x"]) == ["Spark", "engine"]
    assert advanced_split("a-b_c, d.e") == ["a", "b", "c", "d", "e"]
    parsed, bad = split_and_parse_json_objects('x {"a": 1} y {"b": {"c": 2}} {broken}')
    assert parsed == [{"a": 1}, {"b": {"c": 2}}]
    assert len(bad) == 1
    assert extract_xml_data(["t"], "<t attr='1'>val</t>") == {"t": "val"}
    assert sanitize_input_encode(b"caf\xc3\xa9") == "café"
    assert sanitize_input_encode(None) == ""


def test_strategy_class_surface():
    from crawl4ai_ray.strategies import (
        DefaultMarkdownGenerator,
        LXMLWebScrapingStrategy,
        PruningContentFilter,
        WebScrapingStrategy,
    )

    s = WebScrapingStrategy()
    r = s.scrap("https://a.example.com/p", "<body><h1>T</h1><p>hello world text</p></body>")
    assert r["success"] and "hello world" in r["cleaned_html"]
    assert "internal" in r["links"] and "images" in r["media"]
    assert LXMLWebScrapingStrategy is WebScrapingStrategy

    g = DefaultMarkdownGenerator(content_filter=PruningContentFilter(threshold=0.2))
    out = g.generate_markdown("<body><h1>T</h1><p>some sufficiently long paragraph of text here</p></body>")
    assert "# T" in out["raw_markdown"]
    assert "fit_markdown" in out and "fit_html" in out


def test_quality_deciles_uneven_ntile(ray_session, tmp_path):
    """n=23 (rem=3): the first 3 deciles get 3 docs, the rest 2 — the
    uneven-remainder branch of the NTILE formula, checked against
    DuckDB's NTILE over the same synthetic corpus."""
    import duckdb
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.queries import QUERIES

    texts = []
    for i in range(23):
        # vary stopword density so scores spread (with collisions)
        stops = "the and of " * (i % 5)
        texts.append((stops + "alpha beta gamma delta " * 3).strip())
    tbl = pa.table(
        {
            "doc_id": pa.array(range(23), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 23, pa.string()),
            "source": pa.array(["t"] * 23, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["score"], r["decile"])
        for r in QUERIES["quality_deciles"](str(tmp_path)).take_all()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    from crawl4ai_ray.pipelines.queries import ORACLES

    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(ORACLES["quality_deciles"]).fetchall()
    }
    assert got == want
    sizes = {}
    for _, d in got.values():
        sizes[d] = sizes.get(d, 0) + 1
    assert sorted(sizes.values(), reverse=True) == [3, 3, 3] + [2] * 7


def test_phrase_lookup_positions_and_pruning(ray_session, tmp_path):
    """Adjacency is enforced via position intersection (not just term
    co-occurrence); repeated-word phrases work; only the phrase terms'
    partitions are read."""
    from crawl4ai_ray.stages.index import build_positional_index, phrase_lookup

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma",          # phrase at 0
                        "beta alpha zzz alpha beta", # phrase at 3
                        "alpha zzz beta",            # terms present, NOT adjacent
                        "alpha alpha beta",          # repeated-word doc
                    ],
                    pa.string(),
                ),
            }
        )
    )
    idx = str(tmp_path / "pidx")
    build_positional_index(docs, idx, num_partitions=8)
    res, tel = phrase_lookup(idx, "alpha beta")
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in res.take_all()}
    assert got == {1: (1, 0), 2: (1, 3), 4: (1, 1)}
    assert tel["partitions_read"] <= 2 < tel["partitions_total"]
    # repeated-word phrase: needs alpha at p and p+1
    res2, _ = phrase_lookup(idx, "alpha alpha")
    got2 = {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in res2.take_all()}
    assert got2 == {4: (1, 0)}


def test_trigram_regex_prunes_and_verifies(ray_session, tmp_path):
    """Candidates need ALL literal trigrams (doc 3 has 'batch' but not
    'window' → pruned before any regex); a candidate that fails the
    regex (doc 2: words present, pattern shape absent) is dropped by
    verify; telemetry shows the prune."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.stages.index import (
        build_trigram_index,
        regex_search_trigram,
    )

    docs_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a batch big window z",      # matches
                    "window then batch",          # trigrams present, regex no
                    "batch batch batch",          # missing ' window'
                    "batch x window batch y window",  # two matches
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs_tbl, str(tmp_path / "documents.parquet"))
    ds = ray.data.from_arrow(docs_tbl)
    idx = str(tmp_path / "tridx")
    build_trigram_index(ds, idx, num_partitions=8)
    res, tel = regex_search_trigram(
        idx,
        str(tmp_path / "documents.parquet"),
        pattern=r"batch [a-z]+ window",
        literals=["batch ", " window"],
    )
    got = {r["doc_id"]: r["n_matches"] for r in res.take_all()}
    assert got == {1: 1, 4: 2}
    assert tel["candidates"] <= 3  # doc 3 pruned without running a regex


def test_leakage_safe_split_keeps_clusters_whole(ray_session):
    """Every duplicate cluster lands on exactly one side; a naive per-doc
    hash split on the same corpus WOULD break the planted (i, i+N)
    pairs (checked explicitly for contrast)."""
    from crawl4ai_ray.pipelines.queries import QUERIES

    rows = QUERIES["leakage_safe_split"]("/root/testdata/sf0.001").take_all()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(sides) == 1 for sides in by_comp.values())
    # the planted pair (i, i+N) shares component i — both present
    n = 500
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[3]["component"] == by_id[3 + n]["component"] == 3
    assert by_id[3]["split"] == by_id[3 + n]["split"]
    assert {r["split"] for r in rows} == {"train", "eval"}


def test_bm25_lookup_prunes_and_matches_scan_semantics(ray_session, tmp_path):
    """Only the query terms' partitions are read; scores equal the scan
    formula; docs without any query term never surface."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.stages.index import bm25_lookup, build_term_index

    docs_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "table scan table merge filler words here",
                    "scan only appears once in this document",
                    "nothing relevant in here at all",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs_tbl, str(tmp_path / "documents.parquet"))
    ds = ray.data.from_arrow(docs_tbl)
    idx = str(tmp_path / "bidx")
    build_term_index(ds, idx, num_partitions=16, keep_dl=True)
    res, tel = bm25_lookup(idx, ["table", "scan", "merge"], k=10)
    rows = res.take_all()
    got_ids = [r["doc_id"] for r in rows]
    assert got_ids == [1, 2]  # doc 3 has no query term → absent
    assert rows[0]["score"] > rows[1]["score"] > 0
    assert tel["partitions_read"] <= 3 < tel["partitions_total"]
    assert 0 < tel["bytes_scanned"] < tel["bytes_total"]


def test_merge_term_indexes_equals_fresh_build(ray_session, tmp_path):
    """Compacting two segment indexes with tombstone deletes yields the
    same bm25_lookup output AND the same collection stats as a fresh
    index of the surviving docs; mismatched partition counts refuse."""
    import pytest as _pytest

    from crawl4ai_ray.stages.index import (
        bm25_lookup,
        build_term_index,
        merge_term_indexes,
    )

    texts = {
        1: "table scan merge alpha",
        2: "table table beta gamma",
        3: "scan delta epsilon zeta",
        4: "merge merge merge table",
        5: "unrelated words only here",
    }

    def ds_of(ids):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(ids), pa.int64()),
                    "text": pa.array([texts[i] for i in ids], pa.string()),
                }
            )
        )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_term_index(ds_of([1, 2]), a, num_partitions=8, keep_dl=True)
    build_term_index(ds_of([3, 4, 5]), b, num_partitions=8, keep_dl=True)
    merged = str(tmp_path / "m")
    merge_term_indexes([a, b], merged, delete_ids={2})
    fresh = str(tmp_path / "f")
    build_term_index(ds_of([1, 3, 4, 5]), fresh, num_partitions=8, keep_dl=True)

    q = ["table", "scan", "merge"]
    got = bm25_lookup(merged, q, k=10)[0].take_all()
    want = bm25_lookup(fresh, q, k=10)[0].take_all()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    m_meta = open(f"{merged}/_META").read()
    f_meta = open(f"{fresh}/_META").read()
    assert m_meta == f_meta

    bad = str(tmp_path / "bad")
    build_term_index(ds_of([1]), bad, num_partitions=4, keep_dl=True)
    with _pytest.raises(ValueError, match="num_partitions"):
        merge_term_indexes([a, bad], str(tmp_path / "x"))


def test_bm25_lookup_absent_and_duplicate_terms(ray_session, tmp_path):
    """Review-finding regressions: absent-term queries return empty (not
    crash); a repeated query term contributes once PER OCCURRENCE,
    exactly as the scan path's duplicate slots do."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.stages.index import bm25_lookup, build_term_index

    docs_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["table scan words here", "other words entirely now"], pa.string()
            ),
        }
    )
    pq.write_table(docs_tbl, str(tmp_path / "documents.parquet"))
    ds = ray.data.from_arrow(docs_tbl)
    idx = str(tmp_path / "idx")
    build_term_index(ds, idx, num_partitions=8, keep_dl=True)

    empty, _ = bm25_lookup(idx, ["zzznotfound", "qqqmissing"], k=10)
    assert empty.count() == 0

    single, _ = bm25_lookup(idx, ["table"], k=10)
    doubled, _ = bm25_lookup(idx, ["table", "table"], k=10)
    s1 = {r["doc_id"]: r["score"] for r in single.take_all()}
    s2 = {r["doc_id"]: r["score"] for r in doubled.take_all()}
    # x + x == 2*x exactly in IEEE; round-8 applied after the sum
    assert s2[1] == round(s1[1] * 2, 8) and s2[1] > s1[1]


def test_merge_term_indexes_refuses_overlap(ray_session, tmp_path):
    """Review-finding regression: overlapping segments (the recrawl
    double-index case) refuse instead of silently corrupting stats."""
    import pytest as _pytest

    from crawl4ai_ray.stages.index import build_term_index, merge_term_indexes

    def ds_of(ids):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(ids), pa.int64()),
                    "text": pa.array(["alpha beta"] * len(ids), pa.string()),
                }
            )
        )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_term_index(ds_of([1, 2]), a, num_partitions=8, keep_dl=True)
    build_term_index(ds_of([2, 3]), b, num_partitions=8, keep_dl=True)
    with _pytest.raises(ValueError, match="overlap"):
        merge_term_indexes([a, b], str(tmp_path / "m"))


def test_opic_order_crawl_once_and_seed_wave(ray_session):
    """OPIC invariants at sf0.001: wave 0 admits exactly the three
    seeds at full cash; no doc is ever admitted twice (crawl-once);
    every admitted cash is non-negative; double-run determinism."""
    from crawl4ai_ray.pipelines.queries_wave8 import q_opic_order, _OPIC_CASH

    t1 = q_opic_order("/root/testdata/sf0.001").to_pydict()
    t2 = q_opic_order("/root/testdata/sf0.001").to_pydict()
    assert t1 == t2
    wave0 = {
        d: c
        for d, w, c in zip(t1["doc_id"], t1["wave"], t1["cash"])
        if w == 0
    }
    assert wave0 == {0: _OPIC_CASH, 1: _OPIC_CASH, 2: _OPIC_CASH}
    assert len(t1["doc_id"]) == len(set(t1["doc_id"]))
    assert all(c >= 0 for c in t1["cash"])


def test_graph_diameter_double_sweep_on_path(ray_session):
    """On a path graph 0-1-2-3-4 the double sweep is EXACT: BFS from 0
    reaches 4 at dist 4 (ecc1=4), BFS from 4 reaches 0 at dist 4 —
    diameter_lb == true diameter == 4. Validates seed choice, the
    (dist DESC, node ASC) tie-break and the symmetrization contract
    (the query symmetrizes; the stage itself is directed)."""
    from crawl4ai_ray.stages.graph import multi_source_bfs

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 1, 2, 3, 4], pa.int64())})
    )
    fwd = pa.table(
        {
            "src": pa.array([0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    sym = ray.data.from_arrow(fwd).union(
        ray.data.from_arrow(
            pa.table({"src": fwd.column("dst"), "dst": fwd.column("src")})
        )
    )
    b1 = multi_source_bfs(nodes, sym, seeds=[0]).take_all()
    far1 = max(b1, key=lambda r: (r["dist"], -r["node"]))
    assert (far1["node"], far1["dist"]) == (4, 4)
    b2 = multi_source_bfs(nodes, sym, seeds=[4]).take_all()
    assert max(r["dist"] for r in b2) == 4

"""Pipeline-level tests: extraction pipeline, link preview join, adaptive
stopping, entry-point contract."""

import pandas as pd
import pytest

import ray

SF = "/root/testdata/sf0.001"


def test_extract_pipeline_rows_and_schema(ray_session):
    from crawl4ai_ray.pipelines.extract_pipeline import extract_pipeline

    docs = extract_pipeline(SF)
    df = docs.limit(5).to_pandas()
    assert len(df) == 5
    for col in ("url", "markdown", "cleaned_html", "text", "links_internal"):
        assert col in df.columns
    assert df["success"].all()


def test_link_preview_join(ray_session):
    from crawl4ai_ray.pipelines.extract_pipeline import extract_pipeline
    from crawl4ai_ray.sources.pages import read_pages
    from crawl4ai_ray.stages.link_preview import link_preview

    docs = extract_pipeline(SF)
    pages = read_pages(SF, columns=["url", "html"])
    lp = link_preview(docs, pages).to_pandas()
    # every page has 3 child links (some self/dup-collapsed) joined to titles
    assert len(lp) > 1000
    row = lp[lp.dst == "https://site1.example.com/page/1"].iloc[0]
    assert row["dst_title"] == "Page 1 — site1.example.com"


def test_adaptive_confidence_stops(ray_session):
    from crawl4ai_ray.pipelines.adaptive import adaptive_crawl
    from crawl4ai_ray.sources.pages import url_of

    res = adaptive_crawl(
        SF, [url_of(0)], query="table scan merge join",
        max_waves=4, wave_size=8, max_pages=40,
    )
    assert res.stopped_reason in ("confidence", "budget", "frontier_exhausted")
    assert res.pages_crawled > 0
    assert 0.0 <= res.confidence <= 1.0
    # confidence should be monotone-ish upward on this corpus
    confs = [w["confidence"] for w in res.waves]
    assert confs[-1] >= confs[0]


def test_adaptive_embedding_strategy(ray_session):
    """Embedding strategy: coverage confidence from distributed best-cosine
    updates, gap-steered frontier, deterministic across runs; the
    'irrelevant' early-stop fires on a nonsense query."""
    from crawl4ai_ray.pipelines.adaptive import adaptive_crawl
    from crawl4ai_ray.sources.pages import url_of

    kw = dict(max_waves=3, wave_size=8, max_pages=24, strategy="embedding")
    res = adaptive_crawl(SF, [url_of(0)], query="table scan merge join", **kw)
    assert res.stopped_reason in ("confidence", "budget", "frontier_exhausted")
    assert res.pages_crawled > 0
    assert 0.0 <= res.confidence <= 1.0
    assert "val_confidence" in res.metrics
    confs = [w["confidence"] for w in res.waves]
    assert confs[-1] >= confs[0]  # running max ⇒ monotone
    assert all("gaps" in w and "coverage" in w for w in res.waves)
    # deterministic end to end
    res2 = adaptive_crawl(SF, [url_of(0)], query="table scan merge join", **kw)
    assert [w["confidence"] for w in res2.waves] == confs
    assert res2.stopped_reason == res.stopped_reason
    # unrelated query → min-confidence early stop after wave 1
    bad = adaptive_crawl(SF, [url_of(0)], query="zzqx qqzz xxqq", **kw)
    assert bad.stopped_reason == "irrelevant"
    assert len(bad.waves) == 1


def test_entry_contract(ray_session):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.entry()
    assert isinstance(res, ray.data.Dataset)
    assert res.count() >= 0
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_webtext_pipeline_composition(ray_session):
    """Flagship composition must actually prune at every stage: survivors
    < corpus, every survivor is head/middle (tail dropped), doc_ids are
    unique (exact dedup ran), and dl > 0 (boilerplate-only docs dropped)."""
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["webtext_pipeline"](sf).to_pandas()
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert 0 < len(df) < n_docs
    assert set(df["bucket"]) <= {"head", "middle"}
    assert df["doc_id"].is_unique
    assert (df["dl"] > 0).all()
    assert (df["nll_fixed"] // df["dl"] == df["mean_nll_fixed"]).all()


def test_webtext_checkpoint_resume(ray_session, tmp_path):
    """Checkpointed runner: fresh run == streaming pipeline result;
    re-running resumes (skips finished stages); a killed stage-4 recomputes
    from stage-3 parquet; changed params refuse to resume."""
    import json
    import shutil

    import pytest as _pytest

    from crawl4ai_ray.pipelines.webtext import run_webtext, webtext_pipeline

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    out = str(tmp_path / "wt")
    man = run_webtext(docs, out)
    final = (
        ray.data.read_parquet(man["stages"]["4_lm_filter"]["path"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        webtext_pipeline(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert final.equals(want[final.columns])
    assert [s["resumed"] for s in man["stages"].values()] == [False] * 4
    assert man["stages"]["4_lm_filter"]["input"] == "3_exact_dedup"

    # full resume: all four stages skipped
    man2 = run_webtext(docs, out)
    assert all(s["resumed"] for s in man2["stages"].values())

    # kill stage 4 → stages 1-3 resume, 4 recomputes, result identical
    shutil.rmtree(man["stages"]["4_lm_filter"]["path"])
    man3 = run_webtext(docs, out)
    assert man3["stages"]["3_exact_dedup"]["resumed"]
    assert man3["stages"]["4_lm_filter"]["resumed"] is False
    final3 = (
        ray.data.read_parquet(man3["stages"]["4_lm_filter"]["path"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert final3.equals(final)

    # parameter drift must refuse to resume, not silently mix semantics
    with _pytest.raises(ValueError, match="refusing to resume"):
        run_webtext(docs, out, vocab_k=8)


def test_webtext_export_stage(ray_session, tmp_path):
    """Optional stage 5: deterministic training-shard export — shard dirs
    written, manifest carries per-shard rows, resume skips the stage, and
    export config is part of the run identity."""
    import glob

    import pytest as _pytest

    from crawl4ai_ray.pipelines.webtext import run_webtext

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = str(tmp_path / "wt")
    man = run_webtext(docs, out, export_shards_n=4, export_seed=3)
    exp = man["stages"]["5_export"]
    kept = man["stages"]["4_lm_filter"]["rows"]
    assert exp["rows"] == kept
    assert sum(exp["rows_per_shard"].values()) == kept
    for s in range(4):
        files = glob.glob(f"{out}/5_export/shard={s}/*.parquet")
        assert files, f"shard {s} missing"
    t = ray.data.read_parquet(f"{out}/5_export/shard=0/").to_pandas()
    assert {"doc_id", "clean_text", "bucket", "pos"} <= set(t.columns)
    assert sorted(t["pos"]) == list(range(len(t)))

    man2 = run_webtext(docs, out, export_shards_n=4, export_seed=3)
    assert man2["stages"]["5_export"]["resumed"]

    with _pytest.raises(ValueError, match="refusing to resume"):
        run_webtext(docs, out, export_shards_n=8, export_seed=3)


def test_webtext_curriculum_stage(ray_session, tmp_path):
    """Optional stage 6: curriculum deciles — decile dirs written with
    NTILE sizes, scores nondecreasing across deciles, resume skips,
    tile-count change refuses, and omitting the flag keeps the old
    config hash (pre-curriculum checkpoints still resume)."""
    import glob

    import pytest as _pytest

    from crawl4ai_ray.pipelines.webtext import run_webtext

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = str(tmp_path / "wt")
    man = run_webtext(docs, out, curriculum_tiles=10)
    cur = man["stages"]["6_curriculum"]
    kept = man["stages"]["4_lm_filter"]["rows"]
    assert cur["rows"] == kept
    sizes = [cur["rows_per_decile"][str(i)] for i in range(1, 11)]
    q, rem = divmod(kept, 10)
    assert sizes == [q + 1] * rem + [q] * (10 - rem)
    assert glob.glob(f"{out}/6_curriculum/decile=1/*.parquet")
    d1 = ray.data.read_parquet(f"{out}/6_curriculum/decile=1/").to_pandas()
    d10 = ray.data.read_parquet(f"{out}/6_curriculum/decile=10/").to_pandas()
    assert {"doc_id", "score", "clean_text"} <= set(d1.columns)
    assert d1["score"].max() <= d10["score"].min()

    man2 = run_webtext(docs, out, curriculum_tiles=10)
    assert man2["stages"]["6_curriculum"]["resumed"]
    with _pytest.raises(ValueError, match="refusing to resume"):
        run_webtext(docs, out, curriculum_tiles=5)

    # no-curriculum run in a fresh dir has the pre-curriculum hash →
    # old checkpoints resume under the new code
    out2 = str(tmp_path / "wt2")
    m_plain = run_webtext(docs, out2)
    assert "curriculum_tiles" not in m_plain["params"]
    m_resume = run_webtext(docs, out2)
    assert m_resume["stages"]["4_lm_filter"]["resumed"]


def test_webtext_compression_gate(ray_session, tmp_path):
    """min_compression_ratio drops repetitive docs in stage 1, changes
    the config hash (so stale checkpoints refuse), and stays out of the
    hash when unset (old checkpoints resume)."""
    import zlib

    import pyarrow as pa
    import pytest

    from crawl4ai_ray.pipelines.webtext import run_webtext

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    texts = [base, " ".join([base] * 6)]
    # both pass the 0.5 quality gate (identical stopword/length profile);
    # the repeated one compresses far better
    r0 = len(zlib.compress(texts[0].encode(), 6)) / len(texts[0].encode())
    r1 = len(zlib.compress(texts[1].encode(), 6)) / len(texts[1].encode())
    assert r1 < r0
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    thr = (r0 + r1) / 2
    man = run_webtext(docs, str(tmp_path / "a"), min_compression_ratio=thr)
    assert man["stages"]["1_quality"]["rows"] == 1
    assert man["params"]["min_compression_ratio"] == thr

    # unset gate -> different config hash -> refuse to resume dir "a"
    with pytest.raises(ValueError):
        run_webtext(docs, str(tmp_path / "a"))

    # unset gate writes a param dict WITHOUT the key (old-checkpoint
    # hash compatibility)
    man2 = run_webtext(docs, str(tmp_path / "b"))
    assert "min_compression_ratio" not in man2["params"]
    assert man2["stages"]["1_quality"]["rows"] == 2


def test_webtext_lang_gate(ray_session, tmp_path):
    """lang_gate keeps majority==gate and unmixed docs only; unset
    keeps the param out of the config hash."""
    import pyarrow as pa

    from crawl4ai_ray.pipelines.webtext import run_webtext

    en = "the cat and the dog of the town is it that for with good"
    fr = "le chat et la maison de les gens est que une pour bien oui"
    mixed = en + " " + " ".join(["pad"] * 8) + " " + fr  # en window + fr window
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array([en, fr, mixed], pa.string()),
            }
        )
    )
    man = run_webtext(docs, str(tmp_path / "a"), lang_gate="en")
    assert man["stages"]["1_quality"]["rows"] == 1
    assert man["params"]["lang_gate"] == "en"
    man2 = run_webtext(docs, str(tmp_path / "b"))
    assert "lang_gate" not in man2["params"]

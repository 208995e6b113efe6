"""Seventeenth-wave operator unit tests: sitemap-robots audit, OOV
rate, quality-gate funnel."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave17 import (
    _OOV_V,
    q_oov_rate,
    q_quality_gate_funnel,
    q_sitemap_robots_audit,
)


def test_sitemap_robots_audit_violations(ray_session, sf_dir):
    df = q_sitemap_robots_audit(sf_dir).to_pandas()
    # every violation is on a host with a disallow rule
    assert set(df["host"]) <= {"site0.example.com", "site1.example.com"}
    # host0 disallows /page/ entirely: every host0 sitemap url violates
    h0 = df[df["host"] == "site0.example.com"]
    assert (h0["url"].str.contains("/page/")).all()
    # host1 only /page/1*: every listed violation starts with /page/1
    h1 = df[df["host"] == "site1.example.com"]
    assert (
        h1["url"].str.startswith("https://site1.example.com/page/1")
    ).all()
    assert len(df) > 0


def _write_docs(tmp_path, rows):
    langs, texts = zip(*rows)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "lang": pa.array(list(langs), pa.string()),
            "text": pa.array(list(texts), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def test_oov_rate_hand_corpus(ray_session, tmp_path):
    from collections import Counter

    rows = [("en", "aa aa aa " + " ".join(f"w{i}" for i in range(19)))]
    rows.append(("fr", "aa zz qq"))
    _write_docs(tmp_path, rows)
    df = q_oov_rate(str(tmp_path)).to_pandas().set_index("lang")
    # brute-force the top-V vocab (freq DESC, token ASC) and the rates
    freq = Counter(t for _, tx in rows for t in tx.split())
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_OOV_V]
    }
    for lang in ("en", "fr"):
        toks = [t for l, tx in rows if l == lang for t in tx.split()]
        oov = sum(1 for t in toks if t not in vocab)
        r = df.loc[lang]
        assert (r["n_tok"], r["n_oov"]) == (len(toks), oov)
        assert r["oov_rate"] == float(oov) / float(len(toks))
    # the fr doc's 'zz' is out of vocab (the token-ASC tie keeps 'qq')
    assert df.loc["fr", "n_oov"] == 1


def test_oov_rate_bounds(ray_session, sf_dir):
    df = q_oov_rate(sf_dir).to_pandas()
    assert (df["n_oov"] <= df["n_tok"]).all()
    assert ((df["oov_rate"] >= 0) & (df["oov_rate"] <= 1)).all()


def test_quality_gate_funnel_sequential(ray_session, sf_dir):
    df = q_quality_gate_funnel(sf_dir).to_pandas().sort_values("stage")
    assert list(df["gate"]) == ["gopher", "c4", "lang_en"]
    # sequential: each stage's n_in equals the previous stage's n_kept
    n_in = df["n_in"].to_numpy()
    n_kept = df["n_kept"].to_numpy()
    assert (n_in[1:] == n_kept[:-1]).all()
    assert (df["n_dropped"] == df["n_in"] - df["n_kept"]).all()
    assert df["n_in"].iloc[0] == 500
    # every stage keeps something, and stage 1 drops something, on the
    # synthetic corpus (gopher keeps 260/500 at sf0.001, 251/500 at
    # sf0.01 — the conjunction discriminates at both)
    assert (n_kept > 0).all()
    assert df["n_kept"].iloc[0] < 500

"""r5 (r4 VERDICT task #3): the recorded-completion LLM kernel — replay
fidelity, loud miss behavior, and the end-to-end query against its SQL
oracle at sf0.001."""

from __future__ import annotations

import duckdb
import pytest


def test_recorded_completions_replay_and_miss():
    from crawl4ai_ray.functions.llm import RecordedCompletions

    rc = RecordedCompletions()
    assert len(rc._completions) >= 1000
    # any recorded prompt is irrecoverable from the md5 key, but a MISS
    # must raise loudly with re-record guidance
    with pytest.raises(KeyError, match="re-record"):
        rc("this prompt was never recorded")


def test_llm_extract_recorded_matches_sql_oracle(ray_session, sf_dir):
    import pyarrow as pa

    import ray as _ray
    from crawl4ai_ray.pipelines.queries import ORACLES, QUERIES

    t = QUERIES["llm_extract_recorded"](sf_dir)
    if isinstance(t, _ray.data.Dataset):
        t = pa.Table.from_pylist(t.take_all())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    o = con.execute(ORACLES["llm_extract_recorded"]).arrow()
    a = t.to_pandas()
    b = o.to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_prompt_drift_fails_loudly(ray_session, sf_dir):
    """A changed instruction changes every md5 key — the stage must
    raise, never silently extract stale answers."""
    import pyarrow as pa

    from crawl4ai_ray.functions.extraction import IdentityChunking
    from crawl4ai_ray.functions.llm import (
        LLM_EXTRACT_SCHEMA,
        LLMExtractionStrategy,
        RecordedCompletions,
    )

    s = LLMExtractionStrategy(
        instruction="a DIFFERENT instruction",
        schema=LLM_EXTRACT_SCHEMA,
        chunking=IdentityChunking(),
        completion_fn=RecordedCompletions(),
    )
    with pytest.raises(KeyError, match="drifted|re-record"):
        s.extract("0", "some document text")

"""Record the LLM-extraction completion fixture
(crawl4ai_ray/models/recorded_llm_extract_v1.json) — run once; the
artifact is committed so the non-stub LLM path runs in every
environment (r4 VERDICT task #3).

Protocol: for each document at sf0.001 and sf0.01 the RECORDER builds
the exact prompt `llm_extract_recorded` will build at query time
(LLMExtractionStrategy.build_prompt with the same instruction, schema
and IdentityChunking) and records the completion a deterministic
"teacher" returns for it: a JSON object with the document's title (its
first 6 whitespace tokens), whitespace token count, and md5 of the raw
text. Every recorded field is independently recomputable in ANSI SQL,
so the replay query gets a REAL DuckDB oracle (not a golden pin): the
oracle recomputes the same fields from `documents` and must match the
values that travelled prompt → recorded completion → JSON parse → rows.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from crawl4ai_ray.functions.extraction import IdentityChunking  # noqa: E402
from crawl4ai_ray.functions.llm import (  # noqa: E402
    LLM_EXTRACT_INSTRUCTION,
    LLM_EXTRACT_SCHEMA,
    LLMExtractionStrategy,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def teacher(doc_id: int, text: str) -> str:
    toks = text.split()
    return json.dumps(
        [
            {
                "doc_id": doc_id,
                "title": " ".join(toks[:6]),
                "n_tokens": len(toks),
                "content_md5": hashlib.md5(text.encode("utf-8")).hexdigest(),
            }
        ],
        sort_keys=True,
    )


def main() -> None:
    strategy = LLMExtractionStrategy(
        instruction=LLM_EXTRACT_INSTRUCTION,
        schema=LLM_EXTRACT_SCHEMA,
        chunking=IdentityChunking(),
        completion_fn=lambda p: "",  # recorder builds prompts only
    )
    recorded: dict[str, str] = {}
    for sf in SF_DIRS:
        t = pq.read_table(
            os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
        )
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            prompt = strategy.build_prompt(str(did), text)
            key = hashlib.md5(prompt.encode("utf-8")).hexdigest()
            recorded[key] = teacher(int(did), text)
        print(f"{sf}: {t.num_rows} docs recorded (cum {len(recorded)})")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "crawl4ai_ray",
        "models",
        "recorded_llm_extract_v1.json",
    )
    with open(out, "w") as f:
        json.dump(recorded, f, indent=0, sort_keys=True)
    print(f"wrote {out}: {len(recorded)} completions")


if __name__ == "__main__":
    main()

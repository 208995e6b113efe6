"""Local stand-in for the driver's correctness gate: runs every queries()
entry at a given sf and compares against oracle_sql() via DuckDB
(row count + sorted-column value hash, order-insensitive)."""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()


def main(sf_dir: str, only: list[str] | None = None):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    from crawl4ai_ray.pipelines.queries import GOLDEN_PINNED_SF001

    # goldens are pinned at sf0.01 ONLY (sf0.001's documents table has the
    # same row count but different text — verified 2026-08-18); any other
    # sf is meaningless for a pinned-VALUES oracle
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    pinned_sf = base == "sf0.01"
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in GOLDEN_PINNED_SF001 and not pinned_sf:
            results[name] = {"status": "golden_pinned_sf001_skip"}
            print(name, "→", json.dumps(results[name]), flush=True)
            continue
        t0 = time.time()
        try:
            df = to_pandas(fn(sf_dir))
            dt = round(time.time() - t0, 2)
            if name not in oracles:
                results[name] = {"status": "rows_only", "rows": len(df), "sec": dt}
                continue
            odf = con.execute(oracles[name]).fetchdf()
            ok_rows = len(df) == len(odf)
            ok_schema = sorted(map(str.lower, df.columns)) == sorted(
                map(str.lower, odf.columns)
            )
            df.columns = [c.lower() for c in df.columns]
            odf.columns = [c.lower() for c in odf.columns]
            ok_hash = ok_schema and value_hash(df) == value_hash(odf)
            results[name] = {
                "status": "match" if (ok_rows and ok_schema and ok_hash) else "MISMATCH",
                "rows": len(df),
                "oracle_rows": len(odf),
                "schema_ok": ok_schema,
                "hash_ok": ok_hash,
                "sec": dt,
            }
        except Exception as e:
            results[name] = {"status": "ERROR", "error": f"{type(e).__name__}: {e}"}
        print(name, "→", json.dumps(results[name]), flush=True)
    bad = [k for k, v in results.items() if v["status"] in ("MISMATCH", "ERROR")]
    print("\nSUMMARY:", len(results) - len(bad), "ok /", len(results), "bad:", bad)
    return results


def timing_summary(results: dict) -> dict:
    """Per-query wall-clock percentiles + the top-10 slowest (r4 VERDICT
    task #7: make oracle-heavy / engine-side regressions diffable
    round-over-round)."""
    import numpy as np

    secs = sorted(
        (v["sec"], k) for k, v in results.items() if "sec" in v
    )
    if not secs:
        return {}
    vals = np.array([s for s, _ in secs], dtype=float)
    pct = {
        f"p{p}": round(float(np.percentile(vals, p)), 2)
        for p in (50, 90, 99)
    }
    return {
        "n_timed": len(vals),
        "total_sec": round(float(vals.sum()), 1),
        "percentiles_sec": pct,
        "top10_slowest": [
            {"query": k, "sec": round(s, 2)} for s, k in secs[-10:][::-1]
        ],
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("only", nargs="?", default=None)
    ap.add_argument("--out", help="write a CORRECTNESS_full-style JSON artifact")
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    results = main(args.sf_dir, args.only.split(",") if args.only else None)
    if args.out:
        import datetime
        import os

        statuses = [v["status"] for v in results.values()]
        artifact = {
            "round": args.round,
            "date": datetime.date.today().isoformat(),
            "sf": os.path.basename(args.sf_dir.rstrip("/")),
            "note": args.note,
            "n_queries": len(results),
            "n_match": statuses.count("match"),
            "n_golden_skip": statuses.count("golden_pinned_sf001_skip"),
            "n_rows_only": statuses.count("rows_only"),
            "n_bad": sum(s in ("MISMATCH", "ERROR") for s in statuses),
            "timing": timing_summary(results),
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", args.out)
    ray.shutdown()

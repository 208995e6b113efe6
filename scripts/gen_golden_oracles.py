"""Generate pinned-golden DuckDB oracles for the non-SQL-expressible
queries (r2 VERDICT #6): fingerprints, cosine_sections, fit_markdown,
adaptive_crawl, adaptive_embedding.

These five are deterministic but not reconstructable in SQL (hash-valued /
iterative / heuristic). The driver's correctness gate compares each query
against its oracle SQL at sf=0.01, so we pin the query's own deterministic
output as a literal VALUES table — converting "runs" into "checked":
any regression in the engine (hashing, winnowing, stub embedder, pruning
filter, adaptive loop) flips the hash compare.

The pin is NOT a blind self-snapshot where an independent check is
possible:

- fingerprints are recomputed here in PURE PYTHON (fnv1a64_py + a scalar
  rolling-hash winnowing loop — none of the vectorized numpy path) and
  asserted equal before pinning;
- every query is run TWICE and asserted deterministic;
- the generated module records the sf0.01 documents-table fingerprint so a
  regenerated corpus is detectable.

Run from the repo root:  python scripts/gen_golden_oracles.py
Writes crawl4ai_ray/pipelines/golden_sf001.json (committed data file).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import hashlib

import pyarrow as pa

import ray

SF = "/root/testdata/sf0.01"
GOLDEN_NAMES = [
    "fingerprints",
    "cosine_sections",
    "fit_markdown",
    "adaptive_crawl",
    "adaptive_embedding",
    "distinct_users_hll",
    "media_decode",
    "token_quantiles_sketch",
    "bpe_merges",
    "bpe_tokenize",
    "compression_ratio",
]


def sketch_pure_python(sf_dir: str) -> list[tuple[str, float, float]]:
    """Independent scalar reimplementation of q_token_quantiles_sketch
    (stages/sketch.py DQSketch + quantiles_per_key plan: id-range
    partials, bucket-ordered left fold) — plain lists, no numpy."""
    import math

    import pyarrow.parquet as pq

    K = 64
    QS = [0.25, 0.5, 0.9]

    class ScalarSketch:
        def __init__(self):
            self.levels = [[]]
            self.comp = [0]

        def add(self, vals):
            for i in range(0, len(vals), K):
                self.levels[0].extend(float(v) for v in vals[i : i + K])
                self._compress()

        def _compress(self):
            lvl = 0
            while lvl < len(self.levels):
                if len(self.levels[lvl]) <= K:
                    lvl += 1
                    continue
                buf = sorted(self.levels[lvl])
                off = self.comp[lvl] & 1
                self.comp[lvl] += 1
                promoted = buf[off::2]
                self.levels[lvl] = []
                if lvl + 1 == len(self.levels):
                    self.levels.append([])
                    self.comp.append(0)
                self.levels[lvl + 1].extend(promoted)
                lvl += 1

        def merge(self, other):
            while len(self.levels) < len(other.levels):
                self.levels.append([])
                self.comp.append(0)
            for lvl, buf in enumerate(other.levels):
                self.levels[lvl].extend(buf)
            self._compress()
            return self

        def quantiles(self, qs):
            pairs = []
            for lvl, buf in enumerate(self.levels):
                pairs.extend((v, 1 << lvl) for v in buf)
            pairs.sort(key=lambda p: p[0])
            total = sum(w for _, w in pairs)
            out = []
            for q in qs:
                target = max(1, math.ceil(q * total))
                acc = 0
                val = pairs[-1][0]
                for v, w in pairs:
                    acc += w
                    if acc >= target:
                        val = v
                        break
                out.append(val)
            return out

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    rows = sorted(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("lang").to_pylist(),
            tbl.column("text").to_pylist(),
        )
    )
    partials: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for doc_id, lang, text in rows:
        partials.setdefault((lang, doc_id // 64), []).append(
            (doc_id, len((text or "").split()))
        )
    folded: dict[str, ScalarSketch] = {}
    for (lang, bucket) in sorted(partials):
        sk = ScalarSketch()
        sk.add([n for _, n in sorted(partials[(lang, bucket)])])
        if lang in folded:
            folded[lang].merge(sk)
        else:
            folded[lang] = sk
    out = []
    for lang in sorted(folded):
        for q, v in zip(QS, folded[lang].quantiles(QS)):
            out.append((lang, float(q), float(v)))
    return sorted(out)


def media_decode_pure_python(sf_dir: str) -> list[tuple[int, str, int, int, str]]:
    """Independent scalar recompute of q_media_decode (blake2b stub decode
    + max-edge-256 clamp + float32 feature hash) — no numpy vectors."""
    import hashlib as hl
    import struct

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        payload = text.encode("utf-8")
        h = hl.blake2b(payload, digest_size=32).digest()
        w, ht = 64 + h[0] * 4, 64 + h[1] * 4
        scale = min(1.0, 256.0 / max(w, ht))
        feats = [b / 255.0 for b in h[:16]]
        fmd5 = hl.md5(struct.pack("<16f", *feats)).hexdigest()
        mime = ("image/png", "image/jpeg", "video/mp4")[doc_id % 3]
        rows.append((int(doc_id), mime, int(w * scale), int(ht * scale), fmd5))
    return sorted(rows)


def hll_pure_python(sf_dir: str) -> list[tuple[str, int]]:
    """Independent scalar reimplementation of stages/agg.py
    hll_distinct_per_key (fnv1a64 → murmur fmix64 → p=10 registers →
    bias-corrected estimate w/ linear counting) — no numpy in the loop."""
    import math

    import pyarrow.parquet as pq

    from crawl4ai_ray.functions.hashing import fnv1a64_py

    P, M = 10, 1024
    alpha = 0.7213 / (1.0 + 1.079 / M)
    mask = (1 << 64) - 1

    def fmix64(h: int) -> int:
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & mask
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & mask
        h ^= h >> 33
        return h

    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    regs: dict[str, list[int]] = {}
    for et, uid in zip(
        tbl.column("event_type").to_pylist(), tbl.column("user_id").to_pylist()
    ):
        h = fmix64(fnv1a64_py(str(uid)))
        idx = h >> (64 - P)
        w = (h << P) & mask
        rho = (64 - P + 1) if w == 0 else (64 - w.bit_length() + 1)
        r = regs.setdefault(et, [0] * M)
        if rho > r[idx]:
            r[idx] = rho
    out = []
    for et, r in regs.items():
        est = alpha * M * M / sum(2.0 ** -x for x in r)
        zeros = sum(1 for x in r if x == 0)
        if est <= 2.5 * M and zeros:
            est = M * math.log(M / zeros)
        out.append((et, int(round(est))))
    return sorted(out)


def fingerprints_pure_python(sf_dir: str) -> list[tuple[int, int, int]]:
    """Independent scalar reimplementation of stages/textstats.py
    fingerprint_batch (winnowing: token fnv hashes → rolling polynomial
    window hashes → keep 8 smallest, sorted)."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.functions.hashing import fnv1a64_py

    mask = (1 << 64) - 1
    base = 1_000_003
    window = 8
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        tokens = text.split()
        if len(tokens) < window:
            fp = [fnv1a64_py(" ".join(tokens))] if tokens else [0]
        else:
            th = [fnv1a64_py(t) for t in tokens]
            acc = []
            for i in range(len(th) - window + 1):
                h = 0
                for j in range(window):
                    h = (h * base + th[i + j]) & mask
                acc.append(h)
            fp = sorted(sorted(acc)[:8])
        for j, v in enumerate(fp):
            rows.append((int(doc_id), j, int(v)))
    return rows


def sql_literal(v, typ: pa.DataType) -> str:
    if v is None:
        return f"CAST(NULL AS {duck_type(typ)})"
    if pa.types.is_string(typ):
        return "'" + str(v).replace("'", "''") + "'"
    if pa.types.is_floating(typ):
        # exponent form: DuckDB types it DOUBLE directly. A plain decimal
        # literal lands in a DECIMAL column whose scale is unified across
        # the whole VALUES list, and the wide-decimal→double conversion
        # can lose the last bit (observed on compression_ratio ratios).
        return "%.17e" % float(v)
    return str(int(v))


def duck_type(typ: pa.DataType) -> str:
    if pa.types.is_uint64(typ):
        return "UBIGINT"
    if pa.types.is_int64(typ):
        return "BIGINT"
    if pa.types.is_int32(typ):
        return "INTEGER"
    if pa.types.is_floating(typ):
        return "DOUBLE"
    if pa.types.is_string(typ):
        return "VARCHAR"
    raise TypeError(f"unsupported golden column type {typ}")


def table_to_values_sql(tbl: pa.Table) -> str:
    cols = tbl.column_names
    types = [tbl.schema.field(c).type for c in cols]
    lines = []
    for row in zip(*[tbl.column(c).to_pylist() for c in cols]):
        lines.append(
            "(" + ", ".join(sql_literal(v, t) for v, t in zip(row, types)) + ")"
        )
    # column names are double-quoted: reserved words like left/right are
    # legal column names in the Ray output but bare they break the parser
    select = ", ".join(
        f'CAST("{c}" AS {duck_type(t)}) AS "{c}"' for c, t in zip(cols, types)
    )
    return (
        f"SELECT {select} FROM (VALUES\n"
        + ",\n".join(lines)
        + "\n) AS golden({})".format(", ".join(f'"{c}"' for c in cols))
    )


def main() -> None:
    ray.init(address="local", num_cpus=16, include_dashboard=False)
    from crawl4ai_ray.pipelines.queries import QUERIES

    goldens: dict[str, str] = {}
    for name in GOLDEN_NAMES:
        print(f"== {name}")
        t1 = QUERIES[name](SF)
        t1 = t1 if isinstance(t1, pa.Table) else pa.Table.from_pandas(t1.to_pandas())
        t2 = QUERIES[name](SF)
        t2 = t2 if isinstance(t2, pa.Table) else pa.Table.from_pandas(t2.to_pandas())
        key = t1.column_names
        import pandas as pd

        d1 = t1.to_pandas().sort_values(key).reset_index(drop=True)
        d2 = t2.to_pandas().sort_values(key).reset_index(drop=True)
        assert d1.equals(d2), f"{name} is NOT deterministic — refusing to pin"
        if name == "fingerprints":
            want = sorted(fingerprints_pure_python(SF))
            got = sorted(
                zip(d1["doc_id"].tolist(), d1["idx"].tolist(), d1["fp"].tolist())
            )
            assert [
                (int(a), int(b), int(c)) for a, b, c in got
            ] == want, "fingerprints: vectorized path != pure-python recompute"
            print(f"   pure-python recompute OK ({len(want)} rows)")
        if name == "distinct_users_hll":
            want = hll_pure_python(SF)
            got = sorted(
                zip(d1["event_type"].tolist(), d1["n_distinct_est"].tolist())
            )
            assert [
                (str(a), int(b)) for a, b in got
            ] == want, "distinct_users_hll: vectorized path != pure-python recompute"
            print(f"   pure-python HLL recompute OK ({len(want)} rows)")
        if name == "media_decode":
            want = media_decode_pure_python(SF)
            got = sorted(
                zip(
                    d1["media_id"].tolist(),
                    d1["mime"].tolist(),
                    d1["width"].tolist(),
                    d1["height"].tolist(),
                    d1["feat_md5"].tolist(),
                )
            )
            assert [
                (int(a), str(b), int(c), int(d), str(e)) for a, b, c, d, e in got
            ] == want, "media_decode: stage path != pure-python recompute"
            print(f"   pure-python media recompute OK ({len(want)} rows)")
        if name == "bpe_merges":
            import pyarrow.parquet as pq

            from crawl4ai_ray.stages.bpe import learn_bpe_scalar

            texts = pq.read_table(
                f"{SF}/documents.parquet", columns=["text"]
            ).column("text").to_pylist()
            want = learn_bpe_scalar(texts, 24)
            got = list(
                zip(
                    d1["rank"].tolist(),
                    d1["left"].tolist(),
                    d1["right"].tolist(),
                    d1["pair_count"].tolist(),
                )
            )
            assert [
                (int(a), str(b), str(c), int(d)) for a, b, c, d in got
            ] == want, "bpe_merges: distributed path != pure-python recompute"
            print(f"   pure-python BPE recompute OK ({len(want)} merges)")
        if name == "bpe_tokenize":
            import pyarrow.parquet as pq

            from crawl4ai_ray.stages.bpe import learn_bpe_scalar, tokenize_scalar

            t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
            texts = t.column("text").to_pylist()
            ids = t.column("doc_id").to_pylist()
            merges = [(l, r) for _, l, r, _ in learn_bpe_scalar(texts, 48)]
            want = sorted(tokenize_scalar(ids, texts, merges))
            got = sorted(
                zip(
                    d1["doc_id"].tolist(),
                    d1["n_words"].tolist(),
                    d1["n_chars"].tolist(),
                    d1["n_tokens"].tolist(),
                )
            )
            assert [
                (int(a), int(b), int(c), int(d)) for a, b, c, d in got
            ] == want, "bpe_tokenize: actor-pool encode != sequential scalar recompute"
            print(f"   pure-python tokenize recompute OK ({len(want)} docs)")
        if name == "compression_ratio":
            import zlib

            import pyarrow.parquet as pq

            t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
            want = []
            for did, text in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ):
                raw = (text or "").encode("utf-8")
                cl = len(zlib.compress(raw, 6))
                rl = len(raw)
                want.append((int(did), rl, cl, cl / max(rl, 1)))
            want.sort()
            got = sorted(
                zip(
                    d1["doc_id"].tolist(),
                    d1["raw_len"].tolist(),
                    d1["comp_len"].tolist(),
                    d1["ratio"].tolist(),
                )
            )
            assert [
                (int(a), int(b), int(c), float(d)) for a, b, c, d in got
            ] == want, "compression_ratio: batch path != scalar recompute"
            print(f"   scalar zlib recompute OK ({len(want)} rows)")
        if name == "token_quantiles_sketch":
            want = sketch_pure_python(SF)
            got = sorted(
                zip(d1["lang"].tolist(), d1["q"].tolist(), d1["value"].tolist())
            )
            assert [
                (str(a), float(b), float(c)) for a, b, c in got
            ] == want, "token_quantiles_sketch: numpy path != scalar recompute"
            print(f"   pure-python sketch recompute OK ({len(want)} rows)")
        goldens[name] = table_to_values_sql(
            pa.Table.from_pandas(d1, preserve_index=False).cast(
                pa.schema([t1.schema.field(c) for c in key])
            )
        )
        print(f"   pinned {t1.num_rows} rows")

    docs_md5 = hashlib.md5(open(f"{SF}/documents.parquet", "rb").read()).hexdigest()
    doc = (
        "AUTO-GENERATED by scripts/gen_golden_oracles.py — do not edit.\n\n"
        "Pinned sf0.01 golden oracles for the non-SQL-expressible queries\n"
        "(deterministic output captured as literal VALUES tables; the\n"
        "fingerprints rows were independently recomputed in pure python\n"
        "before pinning — see the generator script for the protocol).\n"
        f"Input pin: md5(documents.parquet @ sf0.01) = {docs_md5}"
    )
    import json as _json

    with open("crawl4ai_ray/pipelines/golden_sf001.json", "w") as f:
        _json.dump({"__doc__": doc, "golden_sql": goldens}, f, indent=1)
    print("wrote crawl4ai_ray/pipelines/golden_sf001.json")
    ray.shutdown()


if __name__ == "__main__":
    main()

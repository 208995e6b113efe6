"""Text-analysis stages for training-data pipelines over the ``documents``
table: token counting, quality counters, language-ID heuristic, content
hashing, rolling-hash fingerprints. All vectorized ``map_batches`` UDFs
(polars/pyarrow kernels inside; no per-row Python in the hot path except the
fingerprint's tight loop over token-hash arrays, which is numpy).
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

# Fixed stopword list shared verbatim with the DuckDB oracle regex.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"

TOKEN_RE = r"\S+"
# BPE-ish word/number/punct splitter for token_count(mode="bpe")
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_tokens, n_chars)."""
    text = batch.column("text")
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_chars = pc.utf8_length(text)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
        }
    )


def quality_counts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → integer quality counters (uppercase / digit /
    punctuation chars, stopword occurrences, tokens). Integers, not ratios,
    so the DuckDB oracle comparison is float-exact; ratio scores are a
    trivial projection downstream."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    out = df.select(
        pl.col("doc_id"),
        pl.col("text").str.count_matches(r"[A-Z]").cast(pl.Int64).alias("n_upper"),
        pl.col("text").str.count_matches(r"[0-9]").cast(pl.Int64).alias("n_digit"),
        pl.col("text").str.count_matches(r"[.,;:!?]").cast(pl.Int64).alias("n_punct"),
        pl.col("text")
        .str.to_lowercase()
        .str.count_matches(STOPWORD_RE)
        .cast(pl.Int64)
        .alias("n_stop"),
        pl.col("text").str.count_matches(TOKEN_RE).cast(pl.Int64).alias("n_tokens"),
    )
    return out.to_arrow()


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Composite quality score in [0,1]: penalize extreme length, high
    punct/digit density, low stopword density (boilerplate/gibberish
    signals commonly used in web-corpus filtering)."""
    t = quality_counts_batch(batch)
    n_chars = pc.utf8_length(batch.column("text")).cast(pa.float64()).to_numpy(zero_copy_only=False)
    n_tok = t.column("n_tokens").to_numpy().astype(np.float64)
    n_punct = t.column("n_punct").to_numpy().astype(np.float64)
    n_digit = t.column("n_digit").to_numpy().astype(np.float64)
    n_stop = t.column("n_stop").to_numpy().astype(np.float64)
    safe_chars = np.maximum(n_chars, 1.0)
    safe_tok = np.maximum(n_tok, 1.0)
    length_score = np.clip(n_tok / 100.0, 0.0, 1.0)
    punct_pen = np.clip(1.0 - 5.0 * (n_punct + n_digit) / safe_chars, 0.0, 1.0)
    stop_score = np.clip(5.0 * n_stop / safe_tok, 0.0, 1.0)
    score = (length_score + punct_pen + stop_score) / 3.0
    return pa.table(
        {"doc_id": batch.column("doc_id"), "quality": pa.array(score, pa.float64())}
    )


# --- language ID -----------------------------------------------------------

_LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "que", "une", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "es", "en", "una", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "mit", "für", "ein"),
    "it": ("il", "la", "di", "che", "e", "per", "una", "sono", "con", "del"),
}


class LangId:
    """Stopword-profile language ID (n-gram-heuristic class; the reference
    has no lang-id — the input corpus carries a lang column — but a
    training-data pipeline needs one). Actor-pool friendly: profiles are
    compiled once in __init__."""

    def __init__(self):
        self.langs = list(_LANG_PROFILES)
        self.patterns = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in _LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        low = pl.col("text").str.to_lowercase()
        counts = df.select(
            pl.col("doc_id"),
            *[
                low.str.count_matches(p).cast(pl.Int64).alias(f"c_{lang}")
                for lang, p in self.patterns.items()
            ],
        )
        arr = counts.select([f"c_{lang}" for lang in self.langs]).to_numpy()
        best = arr.argmax(axis=1)
        confident = arr.max(axis=1) > 0
        langs = np.array(self.langs)[best]
        langs = np.where(confident, langs, "unknown")
        return pa.table(
            {
                "doc_id": counts.get_column("doc_id").to_arrow(),
                "lang_pred": pa.array(langs.tolist(), pa.string()),
            }
        )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition counters per document (Rae et al. 2021 §A1.1
    use duplicate-line / top-n-gram fractions to drop repetitive web text;
    the corpus here is single-line, so the token-level signals apply):
    (doc_id) → n_tokens, n_distinct, max_token_count (most common token's
    count), max_bigram_count (most common token-bigram's count). Integer
    counters so the DuckDB oracle compares exactly; the usual ratios
    (1 - distinct/total, top-gram coverage) are trivial projections.

    Fully vectorized in polars: explode tokens once, two groupbys within
    the batch — no shuffle (per-doc state never leaves the batch)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        lst=pl.col("text").str.extract_all(TOKEN_RE)
    )
    toks = (
        df.select("doc_id", tok=pl.col("lst"))
        .explode("tok", empty_as_null=True)
        .filter(pl.col("tok").is_not_null())
    )
    per_tok = toks.group_by(["doc_id", "tok"]).len()
    agg1 = per_tok.group_by("doc_id").agg(
        n_tokens=pl.col("len").sum().cast(pl.Int64),
        n_distinct=pl.len().cast(pl.Int64),
        max_token_count=pl.col("len").max().cast(pl.Int64),
    )
    bigrams = (
        toks.with_columns(
            big=pl.col("tok") + " " + pl.col("tok").shift(-1).over("doc_id")
        )
        .filter(pl.col("big").is_not_null())
        .group_by(["doc_id", "big"])
        .len()
    )
    agg2 = bigrams.group_by("doc_id").agg(
        max_bigram_count=pl.col("len").max().cast(pl.Int64)
    )
    out = agg1.join(agg2, on="doc_id", how="left").with_columns(
        pl.col("max_bigram_count").fill_null(0)
    )
    return out.sort("doc_id").to_arrow()


def term_frequency_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, tok, tf) — per-doc term counts, computed
    entirely inside the batch (polars explode + groupby; a doc never spans
    batches, so no shuffle)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        lst=pl.col("text").str.extract_all(TOKEN_RE)
    )
    toks = (
        df.select("doc_id", tok=pl.col("lst"))
        .explode("tok", empty_as_null=True)
        .filter(pl.col("tok").is_not_null())
    )
    out = toks.group_by(["doc_id", "tok"]).len().rename({"len": "tf"})
    return out.sort(["doc_id", "tok"]).with_columns(
        pl.col("tf").cast(pl.Int64)
    ).to_arrow()


class TfIdfTopTerms:
    """Actor-pool stage for pass 2 of corpus TF-IDF: scores each doc's
    terms against the broadcast idf table and emits the top-k
    (doc_id, term, rank, score). The idf dict is resolved from plasma
    ONCE per actor. Scoring uses tf * idf with idf = ln(N/df) precomputed
    per distinct df via scalar math.log, so an SQL oracle evaluating the
    same expression through libm gets bit-identical inputs to the ranking."""

    def __init__(self, idf_ref, k: int = 3):
        import ray as _ray

        idf: dict[str, float] = _ray.get(idf_ref)
        # materialize the join table once per ACTOR, not per batch
        self.idf_df = pl.DataFrame(
            {"tok": list(idf.keys()), "idf": list(idf.values())}
        )
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        tf = pl.from_arrow(term_frequency_batch(batch))
        scored = tf.join(self.idf_df, on="tok", how="inner").with_columns(
            score=pl.col("tf").cast(pl.Float64) * pl.col("idf")
        )
        top = (
            scored.sort(["doc_id", "score", "tok"], descending=[False, True, False])
            .group_by("doc_id", maintain_order=True)
            .head(self.k)
            .with_columns(
                rank=pl.int_range(pl.len()).over("doc_id") + 1,
                score=pl.col("score").round(8),
            )
        )
        return top.select(
            pl.col("doc_id"),
            pl.col("tok").alias("term"),
            pl.col("rank").cast(pl.Int64),
            pl.col("score"),
        ).to_arrow()


def tfidf_top_terms(
    docs: "ray.data.Dataset", k: int = 3, concurrency: int = 4
) -> "ray.data.Dataset":
    """Corpus TF-IDF, the standard two-pass plan (Spark MLlib's IDF model
    does the same collect+broadcast): pass 1 aggregates document
    frequencies with ONE vocabulary-keyed groupby (the DF table is
    vocab-sized, orders of magnitude smaller than the corpus); the idf
    map is then broadcast via ray.put and pass 2 re-derives per-doc TF
    batch-locally and emits each doc's top-k terms — the corpus text
    never shuffles."""
    import math

    import ray as _ray

    n = docs.count()
    tf = docs.map_batches(term_frequency_batch, batch_format="pyarrow")
    df_tbl = tf.groupby("tok").count()
    idf: dict[str, float] = {}
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        for tok, dfc in zip(
            b.column("tok").to_pylist(), b.column("count()").to_pylist()
        ):
            idf[tok] = math.log(n / dfc)
    ref = _ray.put(idf)
    return docs.map_batches(
        TfIdfTopTerms,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def content_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """md5 content hash (parity with generate_content_hash,
    utils.py:2681-2685)."""
    texts = batch.column(col).to_pylist()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    out = batch.select([c for c in ("doc_id", "url") if c in batch.column_names])
    return out.append_column("content_hash", pa.array(hashes, pa.string()))


# --- rolling-hash fingerprint ---------------------------------------------

_FP_BASE = np.uint64(1_000_003)
_FP_WINDOW = 8


def fingerprint_batch(batch: pa.Table, n_keep: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over
    token-hash windows, keep the ``n_keep`` smallest window hashes
    (order-free near-dup signature)."""
    from ..functions.hashing import hash64

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    fps: list[list[int]] = []
    for t in texts:
        tokens = t.split()
        if len(tokens) < _FP_WINDOW:
            h = hash64([" ".join(tokens)])[0] if tokens else np.uint64(0)
            fps.append([int(h)])
            continue
        th = hash64(tokens)
        # vectorized rolling polynomial hash over windows of _FP_WINDOW
        n = len(th) - _FP_WINDOW + 1
        with np.errstate(over="ignore"):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(_FP_WINDOW):
                acc = acc * _FP_BASE + th[j : j + n]
        k = min(n_keep, len(acc))
        sel = np.partition(acc, k - 1)[:k]
        sel.sort()
        fps.append([int(x) for x in sel])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "fingerprint": pa.array(fps, pa.list_(pa.uint64())),
        }
    )


def pmi_pairs(
    docs: "ray.data.Dataset",
    window: int = 3,
    min_count: int = 5,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Windowed pointwise mutual information over ordered token pairs —
    the collocation/phrase-mining primitive (word2vec-style forward window:
    positions i < j ≤ i+window in the same doc emit pair (tok_i, tok_j)).

        pmi(x,y) = ln( n_xy · P / (L_x · R_y) )

    with P = total pairs, L_x = pairs with left=x, R_y = pairs with
    right=y — every operand an exact integer, ONE float expression at the
    end (x·P then /(L·R), doubles), so the value hashes bit-stably.

    Scale plan: pair counting is map-side combined per batch (a Counter —
    distinct pairs per batch ≤ tokens·window), so only (x, y, partial_n)
    rows shuffle into ONE groupby; marginals are vocab-sized aggregates of
    the pair table, collected and ray.put-broadcast exactly like tfidf's
    DF table. min_count prunes AFTER marginals (pruning before would bias
    the denominators)."""
    import math
    from collections import Counter

    import ray as _ray

    def pair_partials(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            n = len(toks)
            for i in range(n):
                x = toks[i]
                for j in range(i + 1, min(i + window, n - 1) + 1):
                    cnt[(x, toks[j])] += 1
        xs, ys, cs = [], [], []
        for (x, y), c in cnt.items():
            xs.append(x)
            ys.append(y)
            cs.append(c)
        return pa.table(
            {
                "x": pa.array(xs, pa.string()),
                "y": pa.array(ys, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    pair_tbl = (
        docs.select_columns([text_col])
        .map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(_ray.data.aggregate.Sum("c", alias_name="n_xy"))
        .materialize()
    )
    left: dict[str, int] = {}
    right: dict[str, int] = {}
    total = 0
    for b in (
        pair_tbl.groupby("x")
        .aggregate(_ray.data.aggregate.Sum("n_xy", alias_name="s"))
        .iter_batches(batch_format="pyarrow")
    ):
        for x, s in zip(b.column("x").to_pylist(), b.column("s").to_pylist()):
            left[x] = s
            total += s
    for b in (
        pair_tbl.groupby("y")
        .aggregate(_ray.data.aggregate.Sum("n_xy", alias_name="s"))
        .iter_batches(batch_format="pyarrow")
    ):
        for y, s in zip(b.column("y").to_pylist(), b.column("s").to_pylist()):
            right[y] = s
    left_ref, right_ref = _ray.put(left), _ray.put(right)

    def score(batch: pa.Table) -> pa.Table:
        lmap, rmap = _ray.get(left_ref), _ray.get(right_ref)
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        ns = batch.column("n_xy").to_pylist()
        keep_x, keep_y, keep_n, pmis = [], [], [], []
        for x, y, n in zip(xs, ys, ns):
            if n < min_count:
                continue
            keep_x.append(x)
            keep_y.append(y)
            keep_n.append(n)
            pmis.append(
                round(
                    math.log(
                        (float(n) * float(total)) / (float(lmap[x]) * float(rmap[y]))
                    ),
                    8,
                )
            )
        return pa.table(
            {
                "x": pa.array(keep_x, pa.string()),
                "y": pa.array(keep_y, pa.string()),
                "n_xy": pa.array(keep_n, pa.int64()),
                "pmi": pa.array(pmis, pa.float64()),
            }
        )

    return pair_tbl.map_batches(score, batch_format="pyarrow")


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def derive_structured_page(doc_id: int, text: str) -> str:
    """Deterministic structured-page generator for the line-less synthetic
    ``documents`` table (the ``url_nonsense`` / ``line_dedup`` pattern:
    both engines derive the SAME variant, so a rule regression on either
    side breaks the value hash). Lines are k-token windows
    (k = 3 + doc_id%5, partial tail kept), terminal punctuation rotates
    '.'/'!'/'?'/none per (doc_id+line)%4, a 'javascript' token is injected
    on (doc_id+line)%13 lines, and doc-level contaminations ('lorem
    ipsum' / '{' / a bad word) append to the final line on doc_id%41 /
    %43 / %37. Mirrored operand-for-operand by the ``c4_rules`` SQL
    oracle."""
    import re

    toks = re.findall(r"\S+", text or "")
    k = 3 + doc_id % 5
    nlines = (len(toks) + k - 1) // k
    lines = []
    for li in range(1, nlines + 1):
        base = " ".join(toks[(li - 1) * k : li * k])
        if (doc_id + li) % 13 == 0:
            base += " javascript"
        base += (".", "!", "?", "")[(doc_id + li) % 4]
        lines.append(base)
    s = "\n".join(lines)
    if doc_id % 41 == 0:
        s += " lorem ipsum"
    if doc_id % 43 == 0:
        s += " {"
    if doc_id % 37 == 0:
        s += " badword"
    return s


def c4_rules_batch(
    batch: pa.Table,
    text_col: str = "text",
    bad_words: tuple[str, ...] = ("badword",),
    min_sentences: int = 3,
    min_line_words: int = 5,
) -> pa.Table:
    """The C4 cleaning-rule bundle (Raffel et al. 2020, §2.2) over
    newline-structured text, emitted as per-rule observables + the keep
    conjunction:

      line kept      rstripped line ends in terminal punct (. ! ? \") AND
                     has ≥ min_line_words whitespace tokens AND does not
                     contain 'javascript' (case-insensitive)
      n_sentences    count of [.!?] in the RETAINED (kept-lines) text — the
                     deterministic sentence model both engines share
      page dropped   if it contains any bad word (lowercase [a-z]+ token
                     membership), the phrase 'lorem ipsum', or a '{'
      keep           ≥1 kept line AND n_sentences ≥ min_sentences AND no
                     page-level contamination

    The reference corpus pipeline this models is public C4; counts are
    integers and containment flags are exact, so the DuckDB oracle
    comparison is bit-stable. The span-dedup rule of C4 lives separately
    in ``duplicate_spans`` (stages/dedup.py)."""
    import re

    term_re = re.compile(r'[.!?"]$')
    word_re = re.compile(r"\S+")
    sent_re = re.compile(r"[.!?]")
    tok_re = re.compile(r"[a-z]+")
    bad = set(bad_words)

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column(text_col).to_pylist()
    n_lines, n_kept, n_sent = [], [], []
    has_bad, has_lorem, has_brace, keep, clean_chars = [], [], [], [], []
    for t in texts:
        s = t or ""
        ls = s.split("\n")
        kept = [
            l
            for l in ls
            if term_re.search(l.rstrip()) is not None
            and len(word_re.findall(l)) >= min_line_words
            and "javascript" not in l.lower()
        ]
        retained = "\n".join(kept)
        ns = len(sent_re.findall(retained))
        low = s.lower()
        lorem = "lorem ipsum" in low
        brace = "{" in s
        badw = not bad.isdisjoint(tok_re.findall(low))
        n_lines.append(len(ls))
        n_kept.append(len(kept))
        n_sent.append(ns)
        has_bad.append(badw)
        has_lorem.append(lorem)
        has_brace.append(brace)
        keep.append(
            len(kept) >= 1 and ns >= min_sentences and not (lorem or brace or badw)
        )
        clean_chars.append(len(retained))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept_lines": pa.array(n_kept, pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "has_bad_word": pa.array(has_bad, pa.bool_()),
            "has_lorem": pa.array(has_lorem, pa.bool_()),
            "has_brace": pa.array(has_brace, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
            "clean_chars": pa.array(clean_chars, pa.int64()),
        }
    )


def gopher_rules_batch(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stops: int = 2,
) -> pa.Table:
    """The Gopher web-corpus repetition/quality rule bundle (Rae et al.
    2021, table A1 — the rules that apply to plain text without line
    structure), emitted as per-rule flags + the conjunction:

      ok_word_count   min_words ≤ n_words ≤ max_words
      ok_mean_len     3 ≤ mean word length ≤ 10
      ok_symbol       (#-marks + '...' occurrences) / n_words ≤ 0.1
      ok_alpha        ≥80% of words contain an alphabetic character
      ok_stop         ≥min_stops distinct Gopher stop words present

    Every ratio is compared by integer cross-multiplication
    (3·n ≤ chars ≤ 10·n, 10·sym ≤ n, 5·alpha ≥ 4·n) so both engines
    compare exact integers — no float leaves the stage."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column(text_col).to_pylist()
    n_words, ok_wc, ok_ml, ok_sym, ok_al, ok_st, keep = [], [], [], [], [], [], []
    for t in texts:
        toks = (t or "").split()
        n = len(toks)
        chars = sum(len(w) for w in toks)
        syms = (t or "").count("#") + (t or "").count("...")
        alpha = sum(1 for w in toks if any(c.isalpha() for c in w))
        stops = len(set(toks) & set(_GOPHER_STOPS))
        r1 = min_words <= n <= max_words
        r2 = n > 0 and (3 * n <= chars <= 10 * n)
        r3 = 10 * syms <= n
        r4 = 5 * alpha >= 4 * n
        r5 = stops >= min_stops
        n_words.append(n)
        ok_wc.append(r1)
        ok_ml.append(r2)
        ok_sym.append(r3)
        ok_al.append(r4)
        ok_st.append(r5)
        keep.append(r1 and r2 and r3 and r4 and r5)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "ok_word_count": pa.array(ok_wc, pa.bool_()),
            "ok_mean_len": pa.array(ok_ml, pa.bool_()),
            "ok_symbol": pa.array(ok_sym, pa.bool_()),
            "ok_alpha": pa.array(ok_al, pa.bool_()),
            "ok_stop": pa.array(ok_st, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def lexical_diversity_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-doc lexical-diversity signals: token count,
    distinct-token count, hapax count (tokens occurring exactly once in
    the doc), type-token ratio and hapax ratio — the classic "is this
    templated / keyword-stuffed or natural prose" quality features
    (low TTR = repetitive boilerplate; Gopher's repetition rules are the
    coarse cousin, stages/textstats.py repetition family the n-gram
    one). Integer counts + single divisions → bit-identical doubles in
    the DuckDB oracle. Zero-token docs are omitted (no ratio exists;
    the oracle's WHERE mirrors it).

    Tokens are TOKEN_RE (\\S+) runs, case-sensitive — the shared
    convention with token_stats. The per-doc Counter loop is the honest
    cost (distinct-within-doc has no batch-level pyarrow kernel); the
    doc loop is O(total tokens) with no quadratic blowup."""
    import re
    from collections import Counter

    rx = re.compile(TOKEN_RE)
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_id, n_tok, n_dis, n_hap = [], [], [], []
    for d, t in zip(ids, texts):
        toks = rx.findall(t or "")
        if not toks:
            continue
        counts = Counter(toks)
        out_id.append(d)
        n_tok.append(len(toks))
        n_dis.append(len(counts))
        n_hap.append(sum(1 for c in counts.values() if c == 1))
    nt = np.asarray(n_tok, dtype=np.int64)
    nd = np.asarray(n_dis, dtype=np.int64)
    nh = np.asarray(n_hap, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "n_hapax": pa.array(nh, pa.int64()),
            "ttr": pa.array(nd.astype(np.float64) / nt.astype(np.float64)),
            "hapax_ratio": pa.array(nh.astype(np.float64) / nt.astype(np.float64)),
        }
    )


def lang_window_votes(text: str, window: int = 20):
    """Per-window stopword-profile votes for ``text`` (lowercased,
    whitespace tokens; a window is confident when ≥1 profile word
    matches; argmax ties break to the lexicographically lowest
    language). Returns (n_windows, votes) — the kernel shared by the
    lang_mixing query and the webtext language gate. Returns (0, [])
    for empty text."""
    toks = (text or "").lower().split()
    if not toks:
        return 0, []
    langs_sorted = sorted(_LANG_PROFILES)
    word2langs: dict = _WORD2LANGS
    nw = (len(toks) + window - 1) // window
    votes = []
    for wi in range(nw):
        counts = {lang: 0 for lang in langs_sorted}
        for t in toks[wi * window : (wi + 1) * window]:
            for lang in word2langs.get(t, ()):
                counts[lang] += 1
        best = min(lg for lg in langs_sorted if counts[lg] == max(counts.values()))
        if counts[best] > 0:
            votes.append(best)
    return nw, votes


def lang_mix_doc(text: str, window: int = 20):
    """(n_windows, n_confident, n_langs, majority_lang, n_disagree) for
    one doc — the lang_mixing row, from the shared window voter."""
    from collections import Counter

    nw, votes = lang_window_votes(text, window)
    vc = Counter(votes)
    if vc:
        majority = min(lg for lg in vc if vc[lg] == max(vc.values()))
        n_dis = sum(1 for v in votes if v != majority)
    else:
        majority, n_dis = "unknown", 0
    return nw, len(votes), len(vc), majority, n_dis


_WORD2LANGS: dict = {}
for _lang, _words in _LANG_PROFILES.items():
    for _w in _words:
        _WORD2LANGS.setdefault(_w, []).append(_lang)

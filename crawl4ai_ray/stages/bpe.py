"""Distributed BPE merge learning (Sennrich-style byte-pair encoding).

The tokenizer-training step of a training-data pipeline: learn the top-K
merge operations over the corpus word frequencies. No reference analogue
(crawl4ai stops at markdown); this is the corpus-side operator the build
brief adds for LLM-training pipelines.

Distribution shape — the corpus is touched ONCE, everything iterative
runs on the (much smaller) word-frequency table:

1. corpus → word counts: map-side Counter per batch (only (word, partial)
   rows shuffle) → one groupby(word) sum. The vocab table is the
   loop-carried dataset; each word carries its symbol list
   (chars + '</w>' end marker).
2. per merge iteration: map-side adjacent-pair Counter over the vocab
   table (weighted by word count) → groupby(pair) sum → distributed
   argmax via sort(count desc, pair asc) + limit(1) — the pair table
   never materializes on the driver, only the single winner does.
   Deterministic tiebreak: lexicographically smallest (left, right).
3. broadcast the winning pair; one map_batches rewrites every word's
   symbol list (greedy left-to-right merge — the standard BPE apply).
   The vocab table is materialized per iteration to keep the lazy plan
   flat (loop-carried Ray datasets otherwise accumulate operators and
   block counts superlinearly — r3 pagerank finding).

All counts are int64 and every decision is integer/lexicographic, so the
learned merge sequence is bit-identical under any block layout or
parallelism (locked by tests) and reproducible by a scalar reference
implementation (scripts/gen_golden_oracles.py pins it).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray

END = "</w>"


def word_symbols(word: str) -> list[str]:
    return list(word) + [END]


def _word_count_table(
    docs: "ray.data.Dataset", text_col: str
) -> "ray.data.Dataset":
    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").lower().split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="count"))
    )


def apply_merge(symbols: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right merge of every adjacent (left, right) pair."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def learn_bpe(
    docs: "ray.data.Dataset",
    num_merges: int,
    text_col: str = "text",
) -> pa.Table:
    """Learn ``num_merges`` BPE merges; returns (rank, left, right,
    pair_count) — rank 1 = first merge learned. Stops early when no
    adjacent pair remains (tiny corpora)."""
    words = _word_count_table(docs, text_col)

    def init_syms(batch: pa.Table) -> pa.Table:
        syms = [word_symbols(w) for w in batch.column("word").to_pylist()]
        return pa.table(
            {
                "count": batch.column("count"),
                "symbols": pa.array(syms, pa.list_(pa.string())),
            }
        )

    vocab = words.map_batches(init_syms, batch_format="pyarrow").materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        counts = batch.column("count").to_pylist()
        for syms, n in zip(batch.column("symbols").to_pylist(), counts):
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += n
        if not c:
            return pa.table(
                {
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lefts, rights, ns = zip(*((a, b, n) for (a, b), n in c.items()))
        return pa.table(
            {
                "left": pa.array(lefts, pa.string()),
                "right": pa.array(rights, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(num_merges) + 1):
        top = (
            vocab.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(ray.data.aggregate.Sum("n", alias_name="pair_count"))
            .sort(["pair_count", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not top:
            break
        best = top[0]
        left, right, cnt = best["left"], best["right"], int(best["pair_count"])
        merges.append((rank, left, right, cnt))

        def apply_batch(batch: pa.Table, left=left, right=right) -> pa.Table:
            syms = [
                apply_merge(s, left, right)
                for s in batch.column("symbols").to_pylist()
            ]
            return pa.table(
                {
                    "count": batch.column("count"),
                    "symbols": pa.array(syms, pa.list_(pa.string())),
                }
            )

        vocab = vocab.map_batches(apply_batch, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def learn_bpe_scalar(
    texts: list[str], num_merges: int
) -> list[tuple[int, str, str, int]]:
    """Pure-python reference (no Ray, no numpy) — the pin/parity oracle."""
    wc: Counter = Counter()
    for t in texts:
        wc.update((t or "").lower().split())
    vocab = {w: word_symbols(w) for w in wc}
    merges = []
    for rank in range(1, int(num_merges) + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, int(cnt)))
        vocab = {w: apply_merge(s, left, right) for w, s in vocab.items()}
    return merges

"""Distributed BPE tokenizer training + encoding.

A large-scale training-data pipeline owns its tokenizer: before a corpus
ships, merges are *learned* from it (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm) and the
corpus is re-encoded to measure the real token budget. The reference engine
has no tokenizer training (its lexer is fixed, `JASSjr_index.cpp:32-63`);
this module adds the capability Spark-first.

Shape at 100 TB:

* Training never touches the corpus row count. The corpus collapses to a
  **word-frequency table** (Heaps' law: vocab ≈ sqrt-ish of corpus size) in
  one partial-agg shuffle; every merge iteration is then a pair-count
  partial aggregation over that vocab-sized table plus a 1-row argmax
  collect. ``max_words`` caps the table by frequency for a hard bound.
* Each iteration's merge application is a pure Column HOF fold (no Python,
  no shuffle — word rows are independent). The table is cached per round
  and localCheckpoint-truncated periodically so plan depth stays O(1) per
  round instead of O(rounds).
* Encoding documents with the learned merges is an Arrow-batched
  mapInPandas pass — per-word greedy rank-lookup loop exactly like real
  BPE tokenizers, amortized over Arrow batches, embarrassingly parallel.

Determinism: ties on pair count break by (left, right) ascending, so the
learned merge list is a pure function of the corpus — re-runs and both
test engines agree exactly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.constants import TOKEN_RE

# truncate the plan lineage this often during training
_CHECKPOINT_EVERY = 8


def word_frequencies(docs: DataFrame, max_words: int | None = None) -> DataFrame:
    """(docid, content) -> (word, n): corpus word-frequency table.

    Words are the engine's lexer tokens (lowercased TOKEN_RE matches), so
    the trained tokenizer sees exactly what the index sees. One exploded
    partial-agg shuffle; optional frequency cap (ties broken word-asc) for
    a hard vocab-table bound at petabyte scale.
    """
    w = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if max_words is not None:
        w = w.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    return w


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right single-merge application as a Column fold:
    acc ends with `left` and the next symbol is `right` -> replace the
    tail with the merged symbol. Matches the sequential semantics of the
    classic algorithm (a fresh merge result participates in later pairs
    but is never re-split)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    words: DataFrame, n_merges: int, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a (word, n) frequency table.

    Returns [(left, right, pair_count), ...] in merge order. Stops early
    when the best remaining pair's corpus count drops below ``min_freq``.

    Every iteration: explode adjacent symbol pairs weighted by word count,
    partial-agg to (pair, count), take the argmax with a deterministic
    (count desc, left asc, right asc) tie-break — a single collected row —
    then rewrite the symbol arrays with one Column fold. All heavy work
    stays executor-side on the vocab-sized table.
    """
    cur = words.select(
        F.col("n").cast("long").alias("n"),
        # regexp_extract_all('.') = one element per char, no empty strings
        # (F.split(word, "") emits boundary empties on some engines)
        F.regexp_extract_all(F.col("word"), F.lit("."), 0).alias("syms"),
    ).cache()
    cur.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for i in range(n_merges):
            # guard: sequence(1, size-1) DESCENDS for 1-symbol words and
            # element_at(syms, 0) would throw — single-symbol words carry
            # no pairs anyway
            pairs = cur.filter(F.size("syms") >= 2).select(
                "n",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda j: F.struct(
                            F.element_at("syms", j).alias("left"),
                            F.element_at("syms", j + 1).alias("right"),
                        ),
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(
                    F.desc("cnt"),
                    F.asc(F.col("p").getField("left")),
                    F.asc(F.col("p").getField("right")),
                )
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_freq:
                break
            left, right = best[0]["p"]["left"], best[0]["p"]["right"]
            merges.append((left, right, int(best[0]["cnt"])))
            nxt = cur.select("n", _apply_merge(F.col("syms"), left, right).alias("syms"))
            if (i + 1) % _CHECKPOINT_EVERY == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.cache()
                nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard iterative BPE encode of one word: repeatedly apply the
    lowest-rank applicable merge (greedy left-to-right within a rank)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pos = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pos = r, j
        if best_rank is None:
            break
        # apply THIS merge greedily left-to-right across the whole word,
        # mirroring training's single-pass fold
        left, right = syms[best_pos], syms[best_pos + 1]
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """(docid, content) -> (docid, n_words, n_bpe_tokens, tokens):
    re-encode every document with the learned merges.

    Arrow-batched mapInPandas; the merge-rank dict is closure-captured
    (merge lists are tiny — vocab-sized, broadcast with the task). The
    per-doc ``tokens`` array is the exact subword stream a token-budget
    measurement needs.
    """
    import re

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    tok_re = re.compile(TOKEN_RE)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out_rows = []
            for docid, content in zip(pdf["docid"], pdf["content"]):
                toks: list[str] = []
                words = tok_re.findall(str(content).lower())
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                out_rows.append((docid, len(words), len(toks), toks))
            yield pd.DataFrame(
                out_rows,
                columns=["docid", "n_words", "n_bpe_tokens", "tokens"],
            )

    return docs.select("docid", "content").mapInPandas(
        encode,
        "docid long, n_words long, n_bpe_tokens long, tokens array<string>",
    )

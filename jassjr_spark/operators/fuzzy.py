"""Multi-term query rewrites: fuzzy ``term~d``, wildcard-prefix
``term*``, and regex ``/pat/`` — dictionary-expansion operators over
the vocabulary.

The reference matches query terms exactly (``JASSjr_search.py:65-75``);
every production engine pairs that with a fuzzy operator. Lucene's
FuzzyQuery intersects a Levenshtein automaton with the term dictionary
and rewrites to a bounded multi-term disjunction; the Spark-first
analogue is a *vocab-sized* (never corpus-sized) dictionary pass:

  1. band prefilter ``abs(len(term) - len(q)) <= d`` — cheap Column
     math that prunes most of the vocabulary before the O(len^2) DP
     (and is min/max-pushable if the dictionary is persisted with a
     length column),
  2. ``levenshtein(term, q) <= d`` on the survivors,
  3. deterministic cap at ``max_expansions`` per fuzzy term by
     (distance asc, cf desc, term asc) — the suggest_terms ranking:
     closest first, popularity breaks distance ties, spelling breaks
     popularity ties,
  4. ONE ordinary ``search()`` over the expanded query; every matched
     dictionary term scores with its OWN idf (Lucene's classic
     rewrite behaviour — rarer variants contribute more), weight 1.

Expansion positions are ``(slot+1)*1000 + rank`` so the ordered rsv
fold stays deterministic and never collides with plain-term positions
(which must stay < 1000 — enforced).

Scale shape: the expansion is one dictionary scan joined to a
broadcast of the (tiny) fuzzy-term set — a BroadcastNestedLoopJoin
over the vocabulary, which is millions of rows when the corpus is
trillions; the expanded term list is <= #fuzzy * max_expansions, so
the follow-on search keeps its bucket+term-pruned postings fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import Index

MAX_EXPANSIONS = 50
EXPANSION_POS_BASE = 1000


def expand_fuzzy(
    index: Index,
    fuzzy: list[tuple[int, int, str, int]],
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """``fuzzy``: (query_id, slot, term, max_dist) rows ->
    (query_id, pos, term) expansion rows, ``pos = (slot+1)*1000 + rank``,
    at most ``max_expansions`` per (query_id, slot)."""
    spark = index.dictionary.sparkSession
    fdf = spark.createDataFrame(
        fuzzy, "query_id long, slot int, fterm string, dist int"
    )
    w = Window.partitionBy("query_id", "slot").orderBy(
        F.col("ed").asc(), F.col("cf").desc(), F.col("term").asc()
    )
    return (
        index.dictionary.select("term", "cf")
        .join(
            F.broadcast(fdf),
            F.abs(F.length("term") - F.length("fterm")) <= F.col("dist"),
        )
        .withColumn("ed", F.levenshtein("term", "fterm"))
        .filter(F.col("ed") <= F.col("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_expansions)
        .select(
            "query_id",
            ((F.col("slot") + 1) * EXPANSION_POS_BASE + F.col("rank"))
            .cast("int").alias("pos"),
            "term",
        )
    )


MIN_PREFIX_LEN = 2


def _cap_expansions(cands: DataFrame, max_expansions: int) -> DataFrame:
    """(query_id, slot, term, cf) candidate rows -> (query_id, pos, term)
    capped at ``max_expansions`` per slot by (cf desc, term asc),
    ``pos = (slot+1)*EXPANSION_POS_BASE + rank``. The window partitions
    by (query_id, slot), so Spark's rank<=k pushes into partial/final
    WindowGroupLimit — an UNPARTITIONED orderBy here would funnel every
    candidate of a hot prefix/pattern through one task (the plan-gate
    tests assert the partitioned shape)."""
    w = Window.partitionBy("query_id", "slot").orderBy(
        F.col("cf").desc(), F.col("term").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_expansions)
        .select(
            "query_id",
            ((F.col("slot") + 1) * EXPANSION_POS_BASE + F.col("rank"))
            .cast("int").alias("pos"),
            "term",
        )
    )


def expand_prefix(
    index: Index,
    prefixes: list[tuple[int, int, str]],
    max_expansions: int = MAX_EXPANSIONS,
    min_prefix_len: int = MIN_PREFIX_LEN,
) -> DataFrame:
    """``prefixes``: (query_id, slot, prefix) rows -> (query_id, pos,
    term) expansion rows for the wildcard-prefix operator ``prefix*``:
    dictionary terms starting with the prefix, capped at
    ``max_expansions`` per slot by (cf desc, term asc) — most-frequent
    variants first, spelling breaks ties (the ft_complete ranking).

    Plan shape: prefixes are driver-known and few, so each becomes a
    LITERAL ``StartsWith`` filter on the dictionary — a predicate Parquet
    min/max-prunes on a term-sorted dictionary — and the per-prefix scans
    union. (A broadcast-join formulation would evaluate the prefix test
    against every vocabulary row and push nothing.) Prefixes shorter
    than ``min_prefix_len`` are refused: a 1-char prefix at web scale
    names a constant fraction of the vocabulary (Lucene's
    prefix-length guardrail for the same reason).
    """
    from functools import reduce

    for _, _, p in prefixes:
        if len(p) < min_prefix_len:
            raise ValueError(
                f"wildcard prefix {p!r} shorter than min_prefix_len="
                f"{min_prefix_len}; a 1-char prefix expands to a "
                "vocabulary slice"
            )
    outs = []
    for qid, slot, p in prefixes:
        outs.append(
            index.dictionary
            .filter(F.col("term").startswith(p))
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.lit(slot).cast("int").alias("slot"),
                "term", "cf",
            )
        )
    return _cap_expansions(
        reduce(lambda a, b: a.unionByName(b), outs), max_expansions
    )


def expand_regex(
    index: Index,
    patterns: list[tuple[int, int, str]],
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """``patterns``: (query_id, slot, pattern) rows -> (query_id, pos,
    term) expansions: dictionary terms FULLY matching the pattern
    (Lucene RegexpQuery semantics — the pattern is anchored), capped at
    ``max_expansions`` per slot by (cf desc, term asc).

    Scale shape: a regex cannot min/max-prune, so each pattern costs one
    full vocabulary scan (vocab-sized, never corpus-sized — same class
    as the fuzzy band scan). The vocabulary is lowercase; write patterns
    accordingly. Stick to portable syntax (classes, ., *, +, ?, |):
    the filter runs Java regex while the DuckDB oracle runs RE2 —
    portable subsets behave identically, lookarounds/backrefs do not."""
    from functools import reduce

    outs = []
    for qid, slot, pat in patterns:
        outs.append(
            index.dictionary
            .filter(F.col("term").rlike(f"^(?:{pat})$"))
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.lit(slot).cast("int").alias("slot"),
                "term", "cf",
            )
        )
    return _cap_expansions(
        reduce(lambda a, b: a.unionByName(b), outs), max_expansions
    )


def search_fuzzy(
    index: Index,
    queries: DataFrame | None,
    fuzzy: list[tuple[int, int, str, int]],
    k: int = 10,
    max_expansions: int = MAX_EXPANSIONS,
    stats: dict | None = None,
    prefixes: list[tuple[int, int, str]] | None = None,
    patterns: list[tuple[int, int, str]] | None = None,
) -> DataFrame:
    """Disjunctive BM25 over plain ``queries`` (query_id, pos, term[,
    weight]; may be None) plus the expansions of the ``fuzzy`` terms,
    wildcard ``prefixes``, and regex ``patterns`` -> (query_id, docno,
    rank, rsv). Expansion slot numbers must be unique across
    fuzzy+prefix+regex within a query.

    The expansion set is collected driver-side first (it is bounded by
    ``#expansions * max_expansions`` — the rewrite happens before
    scoring, exactly like Lucene's MultiTermQuery rewrite), so the
    follow-on ``search()`` knows its full term list and keeps the pruned
    postings fetch + single-job plan of every other mode.
    """
    from jassjr_spark.operators.search import search

    spark = index.dictionary.sparkSession
    exp = expand_fuzzy(index, fuzzy, max_expansions).collect() if fuzzy else []
    if prefixes:
        exp += expand_prefix(index, prefixes, max_expansions).collect()
    if patterns:
        exp += expand_regex(index, patterns, max_expansions).collect()
    boosted = queries is not None and "weight" in queries.columns
    rows = [(r.query_id, r.pos, r.term) for r in exp]
    if boosted:
        rows = [(qid, pos, t, 1.0) for qid, pos, t in rows]
    schema = "query_id long, pos int, term string" + (
        ", weight double" if boosted else ""
    )
    expanded = spark.createDataFrame(rows, schema)
    if queries is not None:
        bad = queries.filter(F.col("pos") >= EXPANSION_POS_BASE).count()
        if bad:
            raise ValueError(
                f"plain-term positions must stay < {EXPANSION_POS_BASE} "
                "(expansion slots start there)"
            )
        expanded = queries.unionByName(expanded)
    qterms = sorted(
        {r.term for r in exp}
        | ({r.term for r in queries.select("term").collect()}
           if queries is not None else set())
    )
    if not qterms:
        return spark.createDataFrame(
            [], "query_id long, docno string, rank long, rsv double"
        )
    return search(index, expanded, k=k, qterms=qterms, stats=stats)

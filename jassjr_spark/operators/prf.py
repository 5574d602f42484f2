"""Pseudo-relevance feedback (Rocchio-style) query expansion.

Classic second-pass retrieval the reference engine (single-pass BM25,
``JASSjr_search.py:61-105``) stops short of: run the query, assume the
top R results are relevant, mine their strongest terms, and rerun the
query expanded with them. Spark-first and deterministic end-to-end:

* pass 1 is the ordinary ``search()``; the FEEDBACK CUT uses 4-decimal
  rounded rsv with docno-desc ties — the repo's standard cross-engine
  boundary discipline (unrounded sums differ in fold order between
  engines; rounded values are hash-stable);
* expansion weights are ``(sum of tf across feedback docs) * ln(N/df)``
  — the tf sum stays INTEGER (order-free, exact), the log is CPython
  ``math.log`` (the repo-wide ulp-identity guarantee), so the top
  ``n_expand`` selection (weight desc, term asc) is reproducible in SQL
  verbatim; original query terms and terms with df < min_df or df == N
  never qualify;
* expansion terms are appended at pos 1000+selection-rank so the
  ordered rsv fold of pass 2 is position-identical across engines;
* candidate mining is one join of the feedback set (R rows/query)
  against the postings table — term-pruned? no: docid-driven, but the
  feedback set is tiny and broadcast, so the probe is a broadcast
  semi-join against postings, never a second corpus scan.

At scale both passes are ordinary k-term queries; the only new work is
the broadcast feedback-postings probe and two driver-side collects
bounded by R * doc-vocabulary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import search

EXPAND_POS_BASE = 1000


def prf_feedback(index: Index, run: DataFrame, r: int = 10) -> DataFrame:
    """(query_id, docid): the top-``r`` feedback documents per query from
    a search run, cut on rounded rsv (docno-desc ties)."""
    w = Window.partitionBy("query_id").orderBy(
        F.round("rsv", 4).desc(), F.col("docno").desc()
    )
    top = (
        run.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= r)
        .select("query_id", "docno")
    )
    # broadcast the R-rows-per-query side INTO the docids table — the
    # docno resolution join must never materialize the corpus driver-side
    return index.docids.join(F.broadcast(top), "docno").select(
        "query_id", "docid"
    )


def prf_expansion_terms(
    index: Index,
    feedback: DataFrame,
    queries: DataFrame,
    n_expand: int = 5,
    min_df: int = 2,
    stats: dict | None = None,
) -> dict[int, list[str]]:
    """query_id -> expansion terms (selection order), mined from the
    feedback docs' postings; deterministic (weight desc, term asc)."""
    s = stats or index.scalar_stats()
    n = s["n_docs"]
    cand = (
        index.postings.join(F.broadcast(feedback), "docid")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").cast("long").alias("tf_sum"))
        .join(F.broadcast(index.dictionary.select("term", "df")), "term")
        .filter((F.col("df") >= min_df) & (F.col("df") < n))
        .join(
            queries.select("query_id", "term"), ["query_id", "term"],
            "left_anti",
        )
        .collect()
    )
    by_query: dict[int, list] = {}
    for row in cand:
        by_query.setdefault(row.query_id, []).append(
            (row.tf_sum * math.log(n / row.df), row.term)
        )
    out = {}
    for qid, weighted in by_query.items():
        weighted.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = [t for _, t in weighted[:n_expand]]
    return out


def prf_search(
    index: Index,
    queries: DataFrame,
    k: int = 10,
    r: int = 10,
    n_expand: int = 5,
    min_df: int = 2,
    first_pass_k: int = 200,
) -> DataFrame:
    """Two-pass PRF run -> (query_id, docno, rank, rsv).

    ``first_pass_k`` only needs to comfortably exceed ``r`` (the feedback
    cut re-sorts on rounded rsv, so a wide margin absorbs boundary
    drift)."""
    spark = queries.sparkSession
    qrows = queries.select("query_id", "pos", "term").collect()
    qterms = sorted({row.term for row in qrows})
    run0 = search(index, queries, k=first_pass_k, qterms=qterms)
    feedback = prf_feedback(index, run0, r=r)
    s = index.scalar_stats()
    expansions = prf_expansion_terms(
        index, feedback, queries, n_expand=n_expand, min_df=min_df, stats=s
    )
    expanded = [(row.query_id, row.pos, row.term) for row in qrows]
    for qid, terms in expansions.items():
        expanded += [
            (qid, EXPAND_POS_BASE + i, t) for i, t in enumerate(terms)
        ]
    q2 = spark.createDataFrame(
        expanded, "query_id long, pos int, term string"
    )
    all_terms = sorted({t for _, _, t in expanded})
    return search(index, q2, k=k, stats=s, qterms=all_terms)

"""Learning-to-rank feature extraction: the training-matrix export.

The reference emits only the final TREC run line (qid, docno, rank, rsv
— JASSjr_search.py:100-106). A ranking pipeline built on the same index
needs one more artifact: a per-(query, candidate) FEATURE VECTOR to
train a reranker on (the classic LTR dataset shape — LETOR/MSLR rows).
This operator derives those features from the inverted index alone, in
one pass over the matched postings — no second retrieval, no per-doc
re-tokenization:

  rsv        ATIRE BM25 (identical fold => identical to the run line)
  n_matched  #distinct query terms present in the doc
  sum_tf/max_tf   raw term-frequency mass of the matched terms
  sum_idf/max_idf rarity mass of the matched terms
  doc_len    |d| in tokens (includes the DOCNO token, like the scorer)
  len_ratio  |d| / avgdl

Scale shape: same as search() — the per-query term/idf set broadcasts,
the postings join prunes to the query terms' lists (term pushdown into
the bucketed Parquet scan when persisted), features are ONE hash
aggregate over (query_id, docid) with map-side partial aggregation, then
the top-k window per query. Candidate generation and feature extraction
share a single plan; at 10^12 docs nothing new shuffles beyond what the
run-line query already paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.operators.search import K1, B, attach_idf, bm25_contrib


def ltr_features(
    idx,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """queries (query_id, pos, term) -> one feature row per (query,
    top-k candidate): (query_id, docid, rank, rsv, n_matched, sum_tf,
    max_tf, sum_idf, max_idf, doc_len, len_ratio).

    Bag semantics match the scorer: a term repeated in the query
    multiplies its BM25 contribution by its query-tf, but counts ONCE
    in n_matched / sum_tf / sum_idf (features describe the doc-term
    match, not the query's phrasing). rsv folds in term order so the
    4-decimal rounding is deterministic cross-engine."""
    s = idx.scalar_stats()
    n_docs, avgdl = s["n_docs"], s["avgdl"]
    qd = queries.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("qtf")
    )
    q = attach_idf(qd, idx.dictionary, n_docs)
    joined = idx.postings.join(
        F.broadcast(q.select("query_id", "term", "qtf", "idf")), "term"
    )
    contrib = (bm25_contrib(avgdl, k1=k1, b=b) * F.col("qtf")).alias("contrib")
    per_term = joined.select(
        "query_id", "docid", "term", contrib, "tf", "idf", "dl"
    )
    feats = per_term.groupBy("query_id", "docid").agg(
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ),
            4,
        ).alias("rsv"),
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("tf").cast("long").alias("sum_tf"),
        F.max("tf").cast("long").alias("max_tf"),
        F.round(F.sum("idf"), 4).alias("sum_idf"),
        F.round(F.max("idf"), 4).alias("max_idf"),
        F.first("dl").cast("long").alias("doc_len"),
        F.round(F.first("dl") / F.lit(float(avgdl)), 4).alias("len_ratio"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    return (
        feats.filter(F.col("rsv") > 0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"), "docid", "rank", "rsv",
            "n_matched", "sum_tf", "max_tf", "sum_idf", "max_idf",
            "doc_len", "len_ratio",
        )
    )

"""Diagnostic/verification operators — SURVEY.md §2.3 T1-T3 parity, plus a
trec_eval-style quality scorer (the reference's §5 layer-4 evaluation,
README.md:101-134, computed by the external trec_eval binary there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from jassjr_spark.operators.index_build import Index


def index_stats(index: Index) -> DataFrame:
    """T1 (tools/index_stats.py:33-58): N, avgdl, min/max doclen, vocab
    size, heaviest term (largest postings list)."""
    lens = index.doc_lengths.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.min("len").cast("long").alias("min_len"),
        F.max("len").cast("long").alias("max_len"),
    )
    heaviest = (
        index.dictionary.orderBy(F.col("df").desc(), F.col("term"))
        .limit(1)
        .select(
            F.col("term").alias("heaviest_term"),
            F.col("df").alias("heaviest_df"),
        )
    )
    vocab = index.dictionary.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    return lens.crossJoin(vocab).crossJoin(heaviest)


def vocab_diff(dict_a: DataFrame, dict_b: DataFrame) -> DataFrame:
    """T2 (tools/vocab_diff.py:30-88): vocabulary comparison of two
    dictionaries -> (term, df_a, df_b, status) for every discrepancy:
    'only_a' / 'only_b' / 'df_mismatch'. Empty result == same index
    vocabulary (the tool's exit-0 condition)."""
    a = dict_a.select("term", F.col("df").alias("df_a"))
    b = dict_b.select("term", F.col("df").alias("df_b"))
    joined = a.join(b, "term", "full_outer")
    return joined.select(
        "term",
        "df_a",
        "df_b",
        F.when(F.col("df_b").isNull(), F.lit("only_a"))
        .when(F.col("df_a").isNull(), F.lit("only_b"))
        .when(F.col("df_a") != F.col("df_b"), F.lit("df_mismatch"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


def show_document(docs: DataFrame, docno: str) -> DataFrame:
    """T3 (tools/show_document.cpp:25-78): fetch raw document by docno."""
    return docs.filter(F.col("docno") == docno)


def trec_eval_metrics(
    run: DataFrame, qrels: DataFrame, key: str = "docno"
) -> DataFrame:
    """Per-query IR metrics from a TREC run (query_id, <key>, rank, rsv)
    and qrels (query_id, <key>, rel):

      num_ret, num_rel, num_rel_ret, ap (average precision),
      p_at_5, p_at_10 — the headline numbers of the reference's
      evaluation table (README.md:104-133).

    Pure window math: precision@rank over the rank-ordered run, averaged
    at relevant positions.
    """
    rel = qrels.filter(F.col("rel") > 0).select(
        "query_id", key, F.lit(1).alias("is_rel")
    )
    j = run.join(rel, ["query_id", key], "left").withColumn(
        "is_rel", F.coalesce("is_rel", F.lit(0))
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    j = j.withColumn("cum_rel", F.sum("is_rel").over(w)).withColumn(
        "prec_at_rank", F.col("cum_rel") / F.col("rank")
    )
    per_q = j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("num_ret"),
        F.sum("is_rel").cast("long").alias("num_rel_ret"),
        F.sum(F.when(F.col("is_rel") == 1, F.col("prec_at_rank"))).alias("sum_prec"),
        F.sum(F.when((F.col("rank") <= 5) & (F.col("is_rel") == 1), 1).otherwise(0))
        .alias("rel_at_5"),
        F.sum(F.when((F.col("rank") <= 10) & (F.col("is_rel") == 1), 1).otherwise(0))
        .alias("rel_at_10"),
    )
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("num_rel")
    )
    return (
        per_q.join(n_rel, "query_id", "left")
        .select(
            "query_id",
            "num_ret",
            F.coalesce("num_rel", F.lit(0)).alias("num_rel"),
            "num_rel_ret",
            F.round(
                F.when(
                    F.coalesce("num_rel", F.lit(0)) > 0,
                    F.coalesce("sum_prec", F.lit(0.0)) / F.col("num_rel"),
                ).otherwise(0.0),
                4,
            ).alias("ap"),
            F.round(F.col("rel_at_5") / 5.0, 4).alias("p_at_5"),
            F.round(F.col("rel_at_10") / 10.0, 4).alias("p_at_10"),
        )
    )

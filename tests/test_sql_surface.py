"""SQL surface: pure spark.sql BM25 over the registered index views must
equal the DataFrame engine under the driver-contract ranking (rounded
4-dp scores, docid-desc ties)."""

from pyspark.sql import functions as F
from pyspark.sql import Window

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import accumulate, parse_queries, score_postings
from jassjr_spark.sql import bm25_sql, register_index_views


def test_sql_bm25_matches_dataframe_engine(spark):
    raw = synth_docs(300)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    register_index_views(spark, idx, prefix="jr_")

    lines = synth_queries(10)
    q = parse_queries(spark, lines)
    vals = ", ".join(
        f"({r.query_id}, {r.pos}, '{r.term}')" for r in q.collect()
    )
    got = {
        (str(r.query_id), r.docno, r.rank, r.rsv)
        for r in spark.sql(bm25_sql(vals, k=10, prefix="jr_")).collect()
    }

    s = idx.scalar_stats()
    scored = score_postings(q, idx.postings, idx.dictionary,
                            s["n_docs"], s["avgdl"])
    acc = accumulate(scored).withColumn("rsv", F.round("rsv", 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    ranked = (
        acc.filter(F.col("rsv") > 0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .join(idx.docids, "docid")
    )
    want = {
        (str(r.query_id), r.docno, r.rank, r.rsv) for r in ranked.collect()
    }
    assert got == want and len(want) > 0


def test_sql_wildcard_matches_dataframe_engine(spark):
    """wildcard_sql == expand_prefix + the engine's scoring under the
    rounded ranking."""
    from jassjr_spark.operators.fuzzy import expand_prefix
    from jassjr_spark.sql import wildcard_sql

    raw = synth_docs(300)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    register_index_views(spark, idx, prefix="wc_")

    pvals = "(1, 0, 'po'), (1, 1, 'ar'), (2, 0, 'co')"
    got = {
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in spark.sql(wildcard_sql(pvals, k=10, prefix="wc_")).collect()
    }

    q = expand_prefix(idx, [(1, 0, "po"), (1, 1, "ar"), (2, 0, "co")])
    s = idx.scalar_stats()
    scored = score_postings(q, idx.postings, idx.dictionary,
                            s["n_docs"], s["avgdl"])
    acc = accumulate(scored).withColumn("rsv", F.round("rsv", 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    ranked = (
        acc.filter(F.col("rsv") > 0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .join(idx.docids, "docid")
    )
    want = {
        (r.query_id, r.docno, r.rank, r.rsv) for r in ranked.collect()
    }
    assert got == want and len(want) > 0

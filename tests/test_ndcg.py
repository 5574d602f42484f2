"""NDCG@k (operators/tooling.py:ndcg_at)."""

import math

from jassjr_spark.operators.tooling import ndcg_at


def _frames(spark):
    # query 1: relevant docs {10, 20, 30}; run ranks 10 first, 20 third
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 20, 3), (2, 50, 1)],
        "query_id long, docid long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 77)], "query_id long, docid long"
    )
    return run, qrels


def test_ndcg_values(spark):
    run, qrels = _frames(spark)
    out = {r.query_id: r.ndcg for r in ndcg_at(run, qrels, k=10).collect()}
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert out["1"] == round(dcg / idcg, 4)
    # query 2 retrieved nothing relevant -> ndcg 0
    assert out["2"] == 0.0
    # 'all' row = mean of the unrounded per-query values
    assert out["all"] == round((dcg / idcg + 0.0) / 2, 4)


def test_ndcg_perfect_run(spark):
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "query_id long, docid long, rank long"
    )
    qrels = spark.createDataFrame([(1, 10), (1, 20)], "query_id long, docid long")
    out = {r.query_id: r.ndcg for r in ndcg_at(run, qrels, k=10).collect()}
    assert out["1"] == 1.0 and out["all"] == 1.0


def test_ndcg_k_truncation(spark):
    # relevant doc at rank 3 is invisible to ndcg@2
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 20, 3)],
        "query_id long, docid long, rank long",
    )
    qrels = spark.createDataFrame([(1, 20)], "query_id long, docid long")
    out = {r.query_id: r.ndcg for r in ndcg_at(run, qrels, k=2).collect()}
    assert out["1"] == 0.0


def test_ndcg_drops_queries_without_relevants(spark):
    run = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, docid long, rank long"
    )
    qrels = spark.createDataFrame([(2, 10)], "query_id long, docid long")
    rows = ndcg_at(run, qrels, k=10, include_summary=False).collect()
    assert [r.query_id for r in rows] == ["2"]

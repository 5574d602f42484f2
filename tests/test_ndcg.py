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


def test_bpref_hand_computed(spark):
    """bpref on a run small enough to verify by hand, incl. the N>R
    branch, unjudged invisibility, and the N==0 degenerate."""
    from jassjr_spark.operators.tooling import bpref_metric

    # q1: R=2 (d1,d3), N=3 (d2,d4,d5 judged nonrel), run ranks:
    #   1:d1(rel) nr_above=0 -> 1 - 0/min? N>R -> 1 - min(0,2)/2 = 1
    #   2:d2(jnr) 3:d9(unjudged) 4:d3(rel) nr_above=1 -> 1 - 1/2 = 0.5
    # bpref = (1 + 0.5)/2 = 0.75
    run = spark.createDataFrame(
        [(1, 101, 1), (1, 102, 2), (1, 109, 3), (1, 103, 4),
         (2, 201, 1), (2, 202, 2)],
        "query_id long, docid long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 101, 1), (1, 103, 1), (1, 102, 0), (1, 104, 0), (1, 105, 0),
         # q2: R=1, N=0 -> every relevant hit contributes 1
         (2, 202, 1),
         # q3: judged but nothing retrieved for it -> dropped like trec_eval
         (3, 301, 1)],
        "query_id long, docid long, rel int",
    )
    rows = {r.query_id: r for r in bpref_metric(run, qrels).collect()}
    assert rows["1"].bpref == 0.75 and rows["1"].num_rel == 2 \
        and rows["1"].num_jnr == 3
    assert rows["2"].bpref == 1.0 and rows["2"].num_jnr == 0
    assert "3" not in rows
    assert rows["all"].bpref == round((0.75 + 1.0) / 2, 6)

    # N <= R branch: R=2, N=1; relevant at ranks 2 and 3 with the single
    # jnr above both -> each term 1 - 1/1 = 0 -> bpref 0
    run2 = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 3, 3)],
        "query_id long, docid long, rank long",
    )
    qrels2 = spark.createDataFrame(
        [(7, 1, 0), (7, 2, 1), (7, 3, 1)],
        "query_id long, docid long, rel int",
    )
    got = {r.query_id: r.bpref
           for r in bpref_metric(run2, qrels2).collect()}
    assert got["7"] == 0.0

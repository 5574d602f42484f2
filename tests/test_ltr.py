"""LTR feature extraction (operators/ltr.py): rsv identical to the run
line, hand-computed features on an explicit corpus, bag semantics, and
the single-aggregate plan shape."""

import math

from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.ltr import ltr_features
from jassjr_spark.operators.search import parse_queries, search

DOCS = [
    ("d1", "spark join shuffle join"),          # dl 4
    ("d2", "spark merge"),                      # dl 2
    ("d3", "join vector stream merge stream"),  # dl 5
    ("d4", "spark spark spark shuffle"),        # dl 4
]


def _tiny(spark):
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(DOCS)],
        "docid long, docno string, content string",
    )
    return build_index(sdf, prepend_docno=False).cache()


def test_ltr_rsv_matches_run_line_and_hand_features(spark):
    idx = _tiny(spark)
    q = parse_queries(spark, ["1 spark join"])
    feats = {r.docid: r for r in ltr_features(idx, q, k=10).collect()}
    # search() emits docno; DOCS has docid i <-> docno d{i+1}
    run = {int(r.docno[1:]) - 1: (r.rank, r.rsv)
           for r in search(idx, q, k=10).collect()}
    assert set(feats) == set(run)
    for docid, (rank, rsv) in run.items():
        assert feats[docid].rank == rank
        assert abs(feats[docid].rsv - round(rsv, 4)) < 1e-9

    # hand check on d1 (tf: spark 1, join 2; dl 4; N=4, avgdl 15/4)
    N, avgdl = 4, 15 / 4
    idf = {"spark": math.log(N / 3), "join": math.log(N / 2)}
    f1 = feats[0]
    assert f1.n_matched == 2
    assert f1.sum_tf == 3 and f1.max_tf == 2
    assert abs(f1.sum_idf - round(idf["spark"] + idf["join"], 4)) < 1e-9
    assert abs(f1.max_idf - round(idf["join"], 4)) < 1e-9
    assert f1.doc_len == 4
    assert abs(f1.len_ratio - round(4 / avgdl, 4)) < 1e-9
    # d2 matches only 'spark'
    f2 = feats[1]
    assert f2.n_matched == 1 and f2.sum_tf == 1 and f2.doc_len == 2


def test_ltr_bag_semantics(spark):
    """A repeated query term doubles its rsv contribution but leaves the
    match-describing features (n_matched, sum_tf, sum_idf) unchanged."""
    idx = _tiny(spark)
    single = {r.docid: r for r in
              ltr_features(idx, parse_queries(spark, ["merge"])).collect()}
    double = {r.docid: r for r in
              ltr_features(idx, parse_queries(spark, ["merge merge"])).collect()}
    assert set(single) == set(double)
    for d in single:
        assert abs(double[d].rsv - round(2 * single[d].rsv, 4)) < 2e-4
        assert double[d].n_matched == single[d].n_matched == 1
        assert double[d].sum_tf == single[d].sum_tf
        assert double[d].sum_idf == single[d].sum_idf


def test_ltr_plan_broadcast_and_single_agg(spark):
    """Query side broadcasts; features come from ONE hash aggregate over
    (query_id, docid) — no extra shuffle beyond the agg + top-k window."""
    idx = _tiny(spark)
    q = parse_queries(spark, ["1 spark join", "2 stream"])
    plan = ltr_features(idx, q)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # shuffles: the (query_id, docid) aggregate + the per-query window
    # + the query-side qtf aggregate (broadcast side, #query-term rows)
    assert plan.count("Exchange hashpartitioning") <= 3

"""Reciprocal-rank fusion (operators/hybrid.py): hand-computed fusion
values, absence convention, weighting, and tie-breaks."""

import pytest

from jassjr_spark.operators.hybrid import rrf_fuse


def _run(spark, rows):
    return spark.createDataFrame(rows, "query_id long, docid long, rank long")


def test_rrf_hand_computed(spark):
    # run A: d1 rank1, d2 rank2 ; run B: d2 rank1, d3 rank2
    a = _run(spark, [(1, 10, 1), (1, 20, 2)])
    b = _run(spark, [(1, 20, 1), (1, 30, 2)])
    got = {r.docid: (r.rank, r.rrf)
           for r in rrf_fuse([a, b], k=10).collect()}
    # d2 in both: 1/62 + 1/61 beats d1 (1/61) and d3 (1/62)
    assert got[20][0] == 1
    assert got[20][1] == pytest.approx(1 / 62 + 1 / 61, abs=0)
    assert got[10] == (2, 1.0 / 61.0)
    assert got[30] == (3, 1.0 / 62.0)


def test_rrf_tiebreak_docid_desc(spark):
    a = _run(spark, [(1, 10, 1), (1, 99, 2)])
    b = _run(spark, [(1, 99, 1), (1, 10, 2)])
    # both docs score 1/61 + 1/62 -> higher docid first
    rows = rrf_fuse([a, b], k=10).orderBy("rank").collect()
    assert [r.docid for r in rows] == [99, 10]


def test_rrf_weights_and_k(spark):
    a = _run(spark, [(1, 10, 1)])
    b = _run(spark, [(1, 20, 1)])
    rows = rrf_fuse([a, b], k=1, weights=[1.0, 10.0]).collect()
    assert len(rows) == 1 and rows[0].docid == 20
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_multi_query_independence(spark):
    a = _run(spark, [(1, 10, 1), (2, 30, 1)])
    b = _run(spark, [(2, 30, 1)])
    rows = rrf_fuse([a, b], k=5).collect()
    by_q = {(r.query_id, r.docid): r.rrf for r in rows}
    assert by_q[(1, 10)] == 1.0 / 61.0
    assert by_q[(2, 30)] == pytest.approx(2 / 61, abs=0)

"""Percolation (operators/percolate.py): batch semantics + the
streaming alert feed."""

from pyspark.sql import functions as F

from jassjr_spark.operators.percolate import percolate, start_percolate_stream


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "d0", "alpha beta gamma"),
            (1, "d1", "alpha beta"),
            (2, "d2", "beta gamma"),
            (3, "d3", "alpha Alpha ALPHA"),   # dup tf, case folding
        ],
        "docid long, docno string, content string",
    )


def _stored(spark):
    return spark.createDataFrame(
        [(1, "alpha"), (1, "beta"),      # conjunctive pair
         (2, "gamma"),
         (3, "alpha"), (3, "zzz"),       # can never fire
         (4, "alpha"), (4, "alpha")],    # dup terms = one requirement
        "query_id long, term string",
    )


def test_percolate_conjunctive(spark):
    got = {(r.docid, r.query_id)
           for r in percolate(_docs(spark), _stored(spark)).collect()}
    assert got == {
        (0, 1), (1, 1),          # alpha AND beta
        (0, 2), (2, 2),          # gamma
        (0, 4), (1, 4), (3, 4),  # alpha (dup requirement collapses)
    }


def test_percolate_stream_appends_alerts(spark, tmp_path):
    src = tmp_path / "docs_in"
    out = str(tmp_path / "alerts")
    ck = str(tmp_path / "ck")
    src.mkdir()
    _docs(spark).filter(F.col("docid") < 2).write.mode("append") \
        .parquet(str(src))
    stream = spark.readStream.schema(
        "docid long, docno string, content string").parquet(str(src))
    q = start_percolate_stream(spark, stream, _stored(spark), out, ck)
    q.awaitTermination(120)
    first = {(r.docid, r.query_id) for r in spark.read.parquet(out).collect()}
    assert first == {(0, 1), (1, 1), (0, 2), (0, 4), (1, 4)}
    # second batch: only the NEW docs' alerts append
    _docs(spark).filter(F.col("docid") >= 2).write.mode("append") \
        .parquet(str(src))
    q2 = start_percolate_stream(spark, stream, _stored(spark), out, ck)
    q2.awaitTermination(120)
    both = {(r.docid, r.query_id) for r in spark.read.parquet(out).collect()}
    assert both - first == {(2, 2), (3, 4)}


def test_percolate_suppression(spark):
    import pytest as _pt

    stored = spark.createDataFrame(
        [(1, "alpha", False), (1, "gamma", True),   # alpha but NOT gamma
         (2, "beta", False), (2, "zzz", True)],     # OOV suppression: no-op
        "query_id long, term string, negated boolean",
    )
    got = {(r.docid, r.query_id)
           for r in percolate(_docs(spark), stored).collect()}
    assert got == {(1, 1), (3, 1), (0, 2), (1, 2), (2, 2)}
    # pure-negative stored query raises
    bad = spark.createDataFrame(
        [(9, "alpha", True)], "query_id long, term string, negated boolean")
    with _pt.raises(ValueError):
        percolate(_docs(spark), bad)


def test_percolate_stream_keeps_suppressions(spark, tmp_path):
    """The streaming face must carry the negated flag through its
    start-time registry materialization (regression: it was dropped,
    turning suppressions into required terms)."""
    import pytest as _pt

    stored = spark.createDataFrame(
        [(1, "alpha", False), (1, "gamma", True)],
        "query_id long, term string, negated boolean",
    )
    src = tmp_path / "docs_in"; src.mkdir()
    out, ck = str(tmp_path / "alerts"), str(tmp_path / "ck")
    _docs(spark).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(
        "docid long, docno string, content string").parquet(str(src))
    q = start_percolate_stream(spark, stream, stored, out, ck)
    q.awaitTermination(120)
    got = {(r.docid, r.query_id) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 1), (3, 1)}   # alpha-without-gamma docs only
    # pure-negative registration fails at stream START, not per batch
    bad = spark.createDataFrame(
        [(9, "alpha", True)], "query_id long, term string, negated boolean")
    with _pt.raises(ValueError):
        start_percolate_stream(spark, stream, bad, out + "2", ck + "2")

"""Composed curation pipeline (plans/data_pipeline.py)."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.plans.data_pipeline import QualityGates, curate, curate_report

GOOD = (
    "the quick brown fox jumps over the lazy dog while the other animals "
    "watch from the shade of a tall old tree near the quiet river bank"
)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [
            (0, GOOD),                       # survives everything
            (1, GOOD),                       # exact duplicate of 0 -> dropped
            (2, GOOD + " call 555 1234"),    # survives; digits scrubbed
            (3, "word " * 30),               # repetitive -> distinct gate
            (4, "tiny doc"),                 # too short
            (5, "the benchmark sentence that must never leak into training "
                "data because it is the eval set we measure on"),  # leaked
        ],
        "docid long, content string",
    )
    benchmark = spark.createDataFrame(
        [(100, "the benchmark sentence that must never leak into training "
               "data because it is the eval set we measure on")],
        "docid long, content string",
    )
    return docs, benchmark


def test_curate_funnel(spark, frames):
    docs, benchmark = frames
    gates = QualityGates(min_tokens=10, min_stopword_ratio=0.02,
                         min_distinct_ratio=0.35)
    out = curate(docs, benchmark=benchmark, gates=gates,
                 decon_n=5, decon_min_shared=2)
    rows = {r.docid: r for r in out.collect()}
    assert set(rows) == {0, 2}
    # duplicate kept the MIN docid
    assert 1 not in rows
    # the leaked doc is gone
    assert 5 not in rows
    # PII scrubbed in the surviving content
    assert "555" not in rows[2].content and rows[2].n_number == 2
    assert rows[0].n_number == 0
    # identical clean text -> doc 0's sha differs from doc 2's (suffix)
    assert rows[0].clean_sha != rows[2].clean_sha


def test_curate_report_counts(spark, frames):
    docs, benchmark = frames
    gates = QualityGates(min_tokens=10, min_stopword_ratio=0.02,
                         min_distinct_ratio=0.35)
    report = dict(curate_report(docs, benchmark=benchmark, gates=gates,
                                decon_n=5, decon_min_shared=2))
    assert report["input"] == 6
    assert report["dedup"] == 5
    assert report["decontaminate"] == 4
    assert report["quality"] == 2


def test_curate_without_benchmark_or_redaction(spark, frames):
    docs, _ = frames
    gates = QualityGates(min_tokens=10, min_stopword_ratio=0.02,
                         min_distinct_ratio=0.35)
    out = curate(docs, gates=gates, redact_pii=False)
    rows = {r.docid: r for r in out.collect()}
    # no decon stage -> the leaked doc survives on quality alone
    assert 5 in rows
    # content untouched, sha = sha of RAW content
    assert "555" in rows[2].content


def test_curated_corpus_feeds_the_indexer(spark, frames):
    """The pipeline's output shape is a valid indexer input: curate ->
    build_index -> search end-to-end, and the scrubbed text is what got
    indexed (digit runs are gone, mask token is searchable)."""
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import search

    docs, _ = frames
    gates = QualityGates(min_tokens=10, min_stopword_ratio=0.02,
                         min_distinct_ratio=0.35)
    curated = curate(docs, gates=gates).withColumn(
        "docno", F.col("docid").cast("string")
    )
    idx = build_index(
        curated.select("docid", "docno", "content"), prepend_docno=False
    ).cache()
    q = spark.createDataFrame(
        [(1, 0, "555")], "query_id long, pos int, term string"
    )
    assert search(idx, q, k=10).collect() == []  # scrubbed digits unfindable
    q2 = spark.createDataFrame(
        [(1, 0, "quick")], "query_id long, pos int, term string"
    )
    assert search(idx, q2, k=10).count() > 0

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


def test_pack_shards_matches_global_window(spark):
    """The distributed two-pass prefix sum == the single global window
    (which is the DuckDB oracle's formulation), on adversarial sizes."""
    import random

    from jassjr_spark.plans.data_pipeline import pack_shards

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 120)) for i in range(400)]
    df = spark.createDataFrame(rows, "docid long, n long").repartition(7)
    got = {
        r.docid: r.shard
        for r in pack_shards(df, "n", ["docid"], cap=300).collect()
    }
    acc, want = 0, {}
    for i, n in rows:
        want[i] = acc // 300
        acc += n
    assert got == want


def test_pack_shards_semantics(spark):
    """Shard ids are monotone in order, may skip after an oversized doc,
    never split a doc, and each shard's docs start under the cap."""
    from jassjr_spark.plans.data_pipeline import pack_shards

    rows = [(0, 100), (1, 100), (2, 900), (3, 50), (4, 50), (5, 400)]
    out = sorted(
        (r.docid, r.shard)
        for r in pack_shards(
            spark.createDataFrame(rows, "docid long, n long"),
            "n", ["docid"], cap=300,
        ).collect()
    )
    # totals before: 0,100,200,1100,1150,1200 -> shards 0,0,0,3,3,4
    assert out == [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 4)]


def test_pack_shards_no_single_partition_exchange(spark):
    """The 100-TB property: no global-window funnel in the plan."""
    from jassjr_spark.plans.data_pipeline import pack_shards

    df = spark.createDataFrame(
        [(i, 10) for i in range(50)], "docid long, n long"
    )
    plan = (
        pack_shards(df, "n", ["docid"], cap=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
    # the window is PARTITIONED by the staged pid (the range-partition
    # itself is pinned behind the checkpoint's ExistingRDD scan)
    assert "windowspecdefinition(_pid" in plan


def test_pack_shards_rejects_bad_cap(spark):
    from jassjr_spark.plans.data_pipeline import pack_shards

    df = spark.createDataFrame([(1, 1)], "docid long, n long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_shards(df, "n", ["docid"], cap=0)


def test_mix_weights_uniform_and_capped(spark):
    from jassjr_spark.plans.data_pipeline import mix_weights

    docs = spark.createDataFrame(
        [("py", "a b c d e f g h i j k l m n o p q r"),  # 18 tokens
         ("py", "a b c d e f g h i j k l"),               # 12 tokens
         ("go", "x y")],                                  # 2  tokens
        "lang string, content string",
    )
    out = {r.domain: r for r in mix_weights(docs, "lang").collect()}
    assert out["py"].n_docs == 2 and out["py"].n_tokens == 30
    assert out["go"].n_tokens == 2
    assert abs(out["py"].share - 30 / 32) < 1e-6
    # uniform target 0.5; go's raw weight 0.5/(2/32) = 8 -> capped at 3
    assert out["go"].weight == 3.0
    assert abs(out["py"].weight - 0.5 / (30 / 32)) < 1e-6
    assert out["go"].eff_tokens == 6.0


def test_mix_weights_explicit_targets(spark):
    from jassjr_spark.plans.data_pipeline import mix_weights

    docs = spark.createDataFrame(
        [("py", "a b c"), ("go", "x y z"), ("rs", "p q r")],
        "lang string, content string",
    )
    out = {r.domain: r for r in mix_weights(
        docs, "lang", targets={"py": 2.0, "go": 1.0}, max_upsample=10.0
    ).collect()}
    # normalized targets: py 2/3, go 1/3, rs absent -> 0
    assert abs(out["py"].target - 2 / 3) < 1e-6
    assert abs(out["go"].target - 1 / 3) < 1e-6
    assert out["rs"].target == 0.0 and out["rs"].weight == 0.0
    # shares are uniform 1/3 -> weights = target/share
    assert abs(out["py"].weight - 2.0) < 1e-6


def test_mix_weights_rejects_zero_mass(spark):
    import pytest as _pytest

    from jassjr_spark.plans.data_pipeline import mix_weights

    docs = spark.createDataFrame(
        [("py", "a")], "lang string, content string"
    )
    with _pytest.raises(ValueError, match="positive mass"):
        mix_weights(docs, "lang", targets={"py": 0.0})

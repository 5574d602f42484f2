"""Physical-plan quality gates: the optimizations we claim must be visible
in the executed plan, not just intended."""

from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.functions.tokenize import doc_term_frequencies
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import parse_queries, search
from jassjr_spark.sources.index_store import read_index, write_index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=200):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    return spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )


def test_tokenizer_plan_is_map_only(spark):
    """The Arrow tokenize+combine must introduce NO shuffle: at 10^12 docs
    an exchange here is petabytes of network."""
    p = _plan(doc_term_frequencies(_docs(spark)))
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_search_plan_broadcasts_queries_and_pushes_terms(spark, tmp_path):
    idx = build_index(_docs(spark, 300)).cache()
    path = str(tmp_path / "planidx")
    write_index(idx, path)
    on_disk = read_index(spark, path)
    q = parse_queries(spark, ["51 the postings arrow"])
    run = search(on_disk, q, k=10)
    p = _plan(run)
    # query side broadcast, never a sort-merge join against tiny queries
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    # term predicate reaches the parquet scan; bucket partition pruning on
    assert "PushedFilters" in p
    assert "bucket" in p


def test_topk_query_uses_take_ordered(spark):
    """orderBy().limit() on a single ranking must plan TakeOrderedAndProject
    (per-partition top-k + merge), not a global sort."""
    idx = build_index(_docs(spark, 200)).cache()
    top = idx.dictionary.orderBy(F.col("cf").desc(), F.col("term")).limit(5)
    assert "TakeOrderedAndProject" in _plan(top)


def test_dedup_exact_partial_aggregation(spark):
    """The sha groupBy must show two-phase hash aggregation (map-side
    partial combine before the exchange)."""
    from jassjr_spark.operators.dedup import exact_duplicates

    p = _plan(exact_duplicates(_docs(spark, 200).select("docid", "content")))
    assert p.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in p

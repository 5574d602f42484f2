"""Conjunctive (boolean-AND) BM25 mode (operators/search.py:
search_conjunctive): candidate-set semantics, lenient vs strict OOV
handling, and score identity with the disjunctive engine on the
qualifying docs."""

from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import (
    parse_queries, search, search_conjunctive, to_trec_lines,
)


def _idx(spark, n=400):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    return build_index(sdf).cache()


def test_conjunctive_is_disjunctive_restricted(spark):
    """AND top-k == disjunctive ranking restricted to docs that matched
    every scorable term — same scores, same tie-break, re-ranked."""
    idx = _idx(spark)
    s = idx.scalar_stats()
    q = parse_queries(spark, ["51 shuffle postings merge"])
    both = search(idx, q, k=10_000, stats=s).collect()
    # docs matching every SCORABLE term (lenient semantics), computed
    # independently from the raw postings
    n = s["n_docs"]
    terms = [
        r.term for r in idx.dictionary
        .filter(F.col("term").isin(["shuffle", "postings", "merge"]))
        .filter(F.col("df") < n).collect()
    ]
    assert len(terms) >= 2  # the conjunction must actually be a conjunction
    match_all = (
        idx.postings.filter(F.col("term").isin(terms))
        .groupBy("docid").agg(F.countDistinct("term").alias("m"))
        .filter(F.col("m") == len(terms))
    )
    docnos = {
        r.docno for r in match_all.join(idx.docids, "docid").collect()
    }
    expect = [r for r in sorted(both, key=lambda r: r.rank) if r.docno in docnos]
    got = search_conjunctive(idx, q, k=1000, stats=s).orderBy("rank").collect()
    assert [r.docno for r in got] == [r.docno for r in expect]
    assert [r.rsv for r in got] == [r.rsv for r in expect]  # bit-identical
    assert 0 < len(got) < len(both)  # the AND actually constrained


def test_conjunctive_lenient_vs_strict_oov(spark):
    idx = _idx(spark)
    s = idx.scalar_stats()
    q = parse_queries(spark, ["51 shuffle zzznotavocabword"])
    lenient = search_conjunctive(idx, q, k=10, stats=s).collect()
    strict = search_conjunctive(idx, q, k=10, stats=s, strict=True).collect()
    assert len(lenient) > 0      # OOV term dropped from the requirement
    assert strict == []          # unsatisfiable conjunction
    # lenient output == plain single-term search
    single = to_trec_lines(search(idx, parse_queries(spark, ["51 shuffle"]),
                                  k=10, stats=s))
    assert to_trec_lines(
        search_conjunctive(idx, q, k=10, stats=s)
    ) == single


def test_conjunctive_single_term_equals_disjunctive(spark):
    idx = _idx(spark, 200)
    s = idx.scalar_stats()
    q = parse_queries(spark, ["51 spark-graft"])
    assert to_trec_lines(search_conjunctive(idx, q, k=100, stats=s)) == \
        to_trec_lines(search(idx, q, k=100, stats=s))


def test_conjunctive_all_oov_is_empty(spark):
    idx = _idx(spark, 100)
    s = idx.scalar_stats()
    q = parse_queries(spark, ["51 qqq www"])
    assert search_conjunctive(idx, q, k=10, stats=s).collect() == []
    assert search_conjunctive(idx, q, k=10, stats=s, strict=True).collect() == []

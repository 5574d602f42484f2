"""Golden micro-corpus: byte-exact reproduction of the reference test suite
(tests/10_search.bats:3-90) — eleven single-word queries over the 11-doc
corpus of test_documents.xml, asserted including 4-decimal scores."""

from jassjr_spark.fixtures import GOLDEN_EXPECTED, NUMBER_WORDS, golden_docs
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines


def _index(spark):
    docs = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(golden_docs())],
        "docid long, docno string, content string",
    )
    return build_index(docs).cache()


def test_golden_stats(spark):
    """Index-stats assertions verified by executing the reference
    (SURVEY.md §1.4 item 1): N=11, vocab=22, min len 2, max len 11."""
    idx = _index(spark)
    s = idx.scalar_stats()
    assert s["n_docs"] == 11
    assert s["vocab_size"] == 22
    assert s["total_terms"] == 67
    lens = sorted(r.len for r in idx.doc_lengths.collect())
    assert lens[0] == 2 and lens[-1] == 11
    assert abs(s["avgdl"] - 67 / 11) < 1e-12


def test_golden_queries(spark):
    idx = _index(spark)
    stats = idx.scalar_stats()
    words = ["zero"] + NUMBER_WORDS
    got = {w: search_lines(idx, spark, [w], stats=stats) for w in words}
    for w, expected in GOLDEN_EXPECTED.items():
        assert got[w] == expected, f"query {w!r}"
    # full cross-check of the remaining golden blocks via the oracle
    from pathlib import Path

    from jassjr_spark.oracle import run_reference

    ref = run_reference(
        golden_docs(), words, Path("/tmp/jassjr_golden_oracle")
    )
    mine = [ln for w in words for ln in got[w]]
    assert mine == ref

"""Stopword-filtered index derivation (operators/index_build.py:
stopworded_index): identity with an index built from stop-stripped
content, dl recomputation, empty-doc handling, and the derived top-df
stop list."""

from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import (
    build_index, stopworded_index, top_df_stopwords,
)
from jassjr_spark.operators.search import parse_queries, search, to_trec_lines

DOCS = [
    ("a", "the spark engine the joins"),
    ("b", "the the the"),                    # all stopwords -> empty doc
    ("c", "spark shuffle the merge"),
    ("d", "vector merge stream"),
]
STOP = ["the"]


def _idx(spark, docs):
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    return build_index(sdf, prepend_docno=False).cache()


def test_stopworded_equals_index_of_stripped_content(spark):
    """The derived index is BITWISE the index one would have built from
    documents with the stopwords removed — postings, lengths, stats,
    and search output all agree."""
    full = _idx(spark, DOCS)
    derived = stopworded_index(full, STOP)
    stripped = _idx(spark, [
        (d, " ".join(w for w in c.split() if w not in STOP))
        for d, c in DOCS
    ])
    s_d, s_s = derived.scalar_stats(), stripped.scalar_stats()
    assert s_d == s_s
    assert s_d["n_docs"] == 4 and s_d["total_terms"] == 9
    got_dl = {r.docid: r.len for r in derived.doc_lengths.collect()}
    assert got_dl == {0: 3, 1: 0, 2: 3, 3: 3}
    want_p = {(r.term, r.docid, r.tf, r.dl)
              for r in stripped.postings.collect()}
    assert {(r.term, r.docid, r.tf, r.dl)
            for r in derived.postings.collect()} == want_p
    qs = ["1 spark merge", "2 stream", "3 the spark"]
    q = parse_queries(spark, qs)
    assert to_trec_lines(search(derived, q, k=10)) == \
        to_trec_lines(search(stripped, q, k=10))


def test_stoplisted_query_term_is_oov(spark):
    full = _idx(spark, DOCS)
    derived = stopworded_index(full, STOP)
    # a query of ONLY stopwords returns nothing
    assert search(derived, parse_queries(spark, ["1 the"]), k=10) \
        .collect() == []
    # mixed query scores only the surviving term
    single = to_trec_lines(search(
        derived, parse_queries(spark, ["2 shuffle"]), k=10))
    mixed = to_trec_lines(search(
        derived, parse_queries(spark, ["2 the shuffle"]), k=10))
    assert mixed == single and len(single) == 1


def test_top_df_stopwords_deterministic(spark):
    full = _idx(spark, DOCS)
    top = top_df_stopwords(full, 2)
    # 'the' df=3; 'merge' and 'spark' tie at df=2 -> term asc picks merge
    assert top == ["the", "merge"]
    # empty stop list is the identity
    assert stopworded_index(full, []) is full


def test_stopworded_persisted_keeps_bucket_pruning(spark, tmp_path):
    """Deriving the stopworded index from a PERSISTED store must keep
    the bucket column and modulus: filtering rows never moves a term
    between buckets, so the derived index stays bucket-prunable instead
    of scanning every bucket dir per query."""
    from jassjr_spark.sources.index_store import (
        pruned_postings, read_index, write_index,
    )

    full = _idx(spark, DOCS)
    path = str(tmp_path / "idx")
    write_index(full, path, n_buckets=4)
    loaded = read_index(spark, path)
    derived = stopworded_index(loaded, STOP)
    assert derived.n_buckets == loaded.n_buckets == 4
    assert "bucket" in derived.postings.columns
    plan = pruned_postings(derived, ["spark"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "bucket" in plan  # the bucket IN predicate survived
    # and the derived index still answers identically to the in-memory
    # derivation
    q = parse_queries(spark, ["1 spark merge"])
    assert to_trec_lines(search(derived, q, k=10)) == \
        to_trec_lines(search(stopworded_index(full, STOP), q, k=10))

"""Query-time synonym groups (operators/synonyms.py)."""

import pytest

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search
from jassjr_spark.operators.synonyms import synonym_search


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "car travel is fun stuff"),
            (1, "d1", "automobile travel works fine"),
            (2, "d2", "car automobile car dealership opens"),
            (3, "d3", "bicycle travel costs less"),
            (4, "d4", "nothing relevant here at"),
        ],
        "docid long, docno string, content string",
    )
    return build_index(docs, prepend_docno=False).cache()


def _q(spark, terms, qid=1):
    return spark.createDataFrame(
        [(qid, p, t) for p, t in enumerate(terms)],
        "query_id long, pos int, term string",
    )


SYN = {"car": "vehicle", "automobile": "vehicle"}


def test_synonym_group_matches_all_members(spark, corpus):
    rows = synonym_search(corpus, _q(spark, ["car"]), SYN).collect()
    # 'car' finds automobile-only docs too
    assert {r.docno for r in rows} == {"d0", "d1", "d2"}


def test_merged_stats_not_naive_expansion(spark, corpus):
    """d2 has car tf=2 + automobile tf=1 -> merged tf=3 under ONE idf with
    df=3; naive expansion would add two separate idf contributions."""
    rows = {r.docno: r.rsv for r in
            synonym_search(corpus, _q(spark, ["car"]), SYN).collect()}
    import math

    n, avgdl = 5, corpus.scalar_stats()["avgdl"]
    from jassjr_spark.constants import B, K1

    def bm25(tf, dl, df):
        idf = math.log(n / df)
        return idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))

    assert abs(rows["d2"] - bm25(3, 5, 3)) < 1e-12
    assert abs(rows["d1"] - bm25(1, 4, 3)) < 1e-12


def test_non_synonym_terms_pass_through(spark, corpus):
    got = sorted(
        (r.docno, r.rank, r.rsv)
        for r in synonym_search(corpus, _q(spark, ["travel"]), SYN).collect()
    )
    want = sorted(
        (r.docno, r.rank, r.rsv)
        for r in search(corpus, _q(spark, ["travel"])).collect()
    )
    assert got == want and got


def test_two_members_in_one_query_bag_semantics(spark, corpus):
    """'car automobile' = the merged term twice = 2x the single score."""
    single = {r.docno: r.rsv for r in
              synonym_search(corpus, _q(spark, ["car"]), SYN).collect()}
    double = {r.docno: r.rsv for r in
              synonym_search(corpus, _q(spark, ["car", "automobile"]),
                             SYN).collect()}
    for docno, rsv in double.items():
        assert abs(rsv - 2 * single[docno]) < 1e-12


def test_empty_synonyms_is_plain_search(spark, corpus):
    got = sorted(
        (r.docno, r.rank, r.rsv)
        for r in synonym_search(corpus, _q(spark, ["car"]), {}).collect()
    )
    want = sorted(
        (r.docno, r.rank, r.rsv)
        for r in search(corpus, _q(spark, ["car"])).collect()
    )
    assert got == want and got

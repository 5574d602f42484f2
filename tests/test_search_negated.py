"""Boolean NOT search (operators/search.py:search_negated)."""

import pytest

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search, search_negated


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "apple banana common"),
            (1, "d1", "apple cherry common"),
            (2, "d2", "apple banana cherry common"),
            (3, "d3", "apple common"),
            # keeps df(apple)=4 < N=5 so 'apple' stays scorable
            (4, "d4", "durian common"),
        ],
        "docid long, docno string, content string",
    )
    return build_index(docs, prepend_docno=False).cache()


def _q(spark, terms, qid=1):
    return spark.createDataFrame(
        [(qid, p, t) for p, t in enumerate(terms)],
        "query_id long, pos int, term string",
    )


def _neg(spark, terms, qid=1):
    return spark.createDataFrame(
        [(qid, t) for t in terms], "query_id long, term string"
    )


def test_negation_excludes_matching_docs(spark, corpus):
    out = search_negated(corpus, _q(spark, ["apple"]), _neg(spark, ["banana"]))
    docnos = {r.docno for r in out.collect()}
    assert docnos == {"d1", "d3"}


def test_negation_keeps_scores_identical(spark, corpus):
    """Survivors score exactly as in the plain disjunctive run."""
    plain = {
        r.docno: r.rsv for r in search(corpus, _q(spark, ["apple"])).collect()
    }
    negd = {
        r.docno: r.rsv
        for r in search_negated(
            corpus, _q(spark, ["apple"]), _neg(spark, ["cherry"])
        ).collect()
    }
    assert set(negd) == {"d0", "d3"}
    for docno, rsv in negd.items():
        assert rsv == plain[docno]


def test_oov_negation_is_noop(spark, corpus):
    plain = sorted(
        (r.docno, r.rank) for r in search(corpus, _q(spark, ["banana"])).collect()
    )
    negd = sorted(
        (r.docno, r.rank)
        for r in search_negated(
            corpus, _q(spark, ["banana"]), _neg(spark, ["zzznothere"])
        ).collect()
    )
    assert negd == plain


def test_df_equals_n_negation_empties(spark, corpus):
    out = search_negated(corpus, _q(spark, ["apple"]), _neg(spark, ["common"]))
    assert out.collect() == []


def test_pages_stay_full_after_exclusion(spark, corpus):
    # k=2 with one doc excluded: the page refills from below the cut
    out = search_negated(
        corpus, _q(spark, ["apple", "banana"]), _neg(spark, ["cherry"]), k=2
    )
    rows = out.collect()
    assert len(rows) == 2
    assert {r.docno for r in rows} == {"d0", "d3"}
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]


def test_mixed_degenerates_to_search_and_conjunctive(spark, corpus):
    from jassjr_spark.operators.search import search_conjunctive, search_mixed

    q = _q(spark, ["apple", "banana"])
    empty_req = spark.createDataFrame([], "query_id long, term string")
    got = sorted(
        (r.docno, r.rank, r.rsv)
        for r in search_mixed(corpus, q, empty_req).collect()
    )
    want = sorted(
        (r.docno, r.rank, r.rsv) for r in search(corpus, q).collect()
    )
    assert got == want and got

    all_req = _neg(spark, ["apple", "banana"])  # same (query_id, term) shape
    got2 = sorted(
        (r.docno, r.rank, r.rsv)
        for r in search_mixed(corpus, q, all_req).collect()
    )
    want2 = sorted(
        (r.docno, r.rank, r.rsv)
        for r in search_conjunctive(corpus, q).collect()
    )
    assert got2 == want2 and got2


def test_mixed_required_df_equals_n_is_dropped_from_need(spark, corpus):
    from jassjr_spark.operators.search import search_mixed

    # 'common' has df == N: it can't gate (nor score) — requiring it must
    # NOT empty the query
    q = _q(spark, ["apple", "common"])
    req = _neg(spark, ["common"])
    rows = search_mixed(corpus, q, req).collect()
    assert {r.docno for r in rows} == {"d0", "d1", "d2", "d3"}


def test_collapsed_per_group(spark):
    """per_group=2 keeps each group's best TWO; default stays argmax."""
    from jassjr_spark.operators.search import search_collapsed

    docs = spark.createDataFrame(
        [
            (0, "d0", "apple apple apple x1"),   # grp A, strongest
            (1, "d1", "apple apple y1 y2"),      # grp A, middle
            (2, "d2", "apple z1 z2 z3"),         # grp A, weakest
            (3, "d3", "apple w1 w2 w3"),         # grp B
            (4, "d4", "nothing here at all"),
        ],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    groups = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "docid long, grp string",
    )
    q = _q(spark, ["apple"])
    two = search_collapsed(idx, q, groups, per_group=2).collect()
    assert {r.docno for r in two} == {"d0", "d1", "d3"}
    one = search_collapsed(idx, q, groups).collect()
    assert {r.docno for r in one} == {"d0", "d3"}


def test_top_k_offset_pages(spark, corpus):
    from jassjr_spark.operators.search import search

    q = _q(spark, ["apple", "banana"])
    all_rows = {r.rank: r.docno for r in search(corpus, q, k=10).collect()}
    from jassjr_spark.operators.search import (
        accumulate, score_postings, top_k, resolve_docnos,
    )
    s = corpus.scalar_stats()
    acc = accumulate(score_postings(
        q, corpus.postings, corpus.dictionary, s["n_docs"], s["avgdl"]
    ))
    page2 = resolve_docnos(corpus, top_k(acc, k=2, offset=2), s["n_docs"])
    rows = {r.rank: r.docno for r in page2.collect()}
    # global ranks 3..4, matching the full run
    assert rows == {rk: dn for rk, dn in all_rows.items() if rk in (3, 4)}

"""Fuzzy term matching (operators/fuzzy.py) + '~' query syntax."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.fuzzy import expand_fuzzy, search_fuzzy
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.query_language import (
    parse_user_query,
    run_user_query,
)


@pytest.fixture(scope="module")
def engine(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "apple banana orange"),
            (1, "d1", "apple cherry orange"),
            (2, "d2", "apple banana cherry"),
            (3, "d3", "apple orange"),
            (4, "d4", "grape melon kiwi"),
        ],
        "docid long, docno string, content string",
    )
    return build_index(docs, prepend_docno=False).cache()


def test_parse_fuzzy():
    p = parse_user_query("appl~ banana grap~2")
    assert p.positive == ["banana"]
    assert p.fuzzy == [("appl", 1), ("grap", 2)]
    with pytest.raises(ValueError):
        parse_user_query("+appl~")
    with pytest.raises(ValueError):
        parse_user_query("-appl~")
    with pytest.raises(ValueError):
        parse_user_query("appl^2~1")


def test_fuzzy_expands_to_exact_scores(spark, engine):
    # 'appl'~1 expands to exactly {apple} in this vocabulary, so the run
    # is bit-identical to the plain query (IEEE + is commutative, so the
    # expansion's shifted fold position cannot change the sum)
    got = {(r.docno, r.rank, r.rsv)
           for r in run_user_query(engine, "appl~ banana").collect()}
    want = {(r.docno, r.rank, r.rsv)
            for r in run_user_query(engine, "apple banana").collect()}
    assert got == want and got


def test_fuzzy_only_and_oov(spark, engine):
    assert {r.docno for r in run_user_query(engine, "grap~").collect()} \
        == {"d4"}
    assert run_user_query(engine, "zzzzzz~").collect() == []
    # phrase+fuzzy is rejected at dispatch
    with pytest.raises(ValueError):
        run_user_query(engine, '"a phrase" appl~')


def test_expand_fuzzy_cap_and_ranking(spark):
    # vocabulary with four terms within distance 1 of 'ca'; the cap keeps
    # the top-2 by (dist asc, cf desc, term asc)
    docs = spark.createDataFrame(
        [(0, "x0", "cat cat cat cab cab car can")],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    rows = expand_fuzzy(idx, [(7, 0, "ca", 1)], max_expansions=2).collect()
    assert [(r.query_id, r.pos, r.term) for r in sorted(rows, key=lambda r: r.pos)] \
        == [(7, 1001, "cat"), (7, 1002, "cab")]


def test_search_fuzzy_rejects_colliding_plain_positions(spark, engine):
    q = spark.createDataFrame(
        [(0, 1000, "banana")], "query_id long, pos int, term string"
    )
    with pytest.raises(ValueError):
        search_fuzzy(engine, q, [(0, 0, "appl", 1)])


def test_fuzzy_composes_with_boosted_plain(spark, engine):
    boosted = {r.docno: r.rsv
               for r in run_user_query(engine, "banana^2 appl~").collect()}
    b = {r.docno: r.rsv for r in run_user_query(engine, "banana").collect()}
    a = {r.docno: r.rsv for r in run_user_query(engine, "apple").collect()}
    assert set(boosted) == set(b) | set(a)
    for d, rsv in boosted.items():
        assert rsv == pytest.approx(2.0 * b.get(d, 0.0) + a.get(d, 0.0),
                                    abs=1e-12)


def test_parse_wildcard():
    p = parse_user_query("ban* appl~ cherry")
    assert p.prefixes == ["ban"] and p.fuzzy == [("appl", 1)]
    assert p.positive == ["cherry"]
    for bad in ["*ban", "b*an", "+ban*", "-ban*", "ba*n*"]:
        with pytest.raises(ValueError):
            parse_user_query(bad)


def test_wildcard_expands_prefix(spark, engine):
    # 'ban*' -> {banana}; bitwise equal to the plain query
    got = {(r.docno, r.rank, r.rsv)
           for r in run_user_query(engine, "ban* cherry").collect()}
    want = {(r.docno, r.rank, r.rsv)
            for r in run_user_query(engine, "banana cherry").collect()}
    assert got == want and got
    # no dictionary term starts with 'zz'
    assert run_user_query(engine, "zz*").collect() == []


def test_expand_prefix_cap_ranking_and_guard(spark):
    from jassjr_spark.operators.fuzzy import expand_prefix
    from jassjr_spark.operators.index_build import build_index

    docs = spark.createDataFrame(
        [(0, "x0", "cat cat cat cab cab car can dog")],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    rows = expand_prefix(idx, [(3, 0, "ca")], max_expansions=2).collect()
    assert [(r.query_id, r.pos, r.term)
            for r in sorted(rows, key=lambda r: r.pos)] \
        == [(3, 1001, "cat"), (3, 1002, "cab")]
    with pytest.raises(ValueError):
        expand_prefix(idx, [(0, 0, "c")])


def test_wildcard_plan_pushes_prefix(spark, engine):
    from jassjr_spark.operators.fuzzy import expand_prefix

    plan = expand_prefix(engine, [(0, 0, "ba")])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "StartsWith" in plan


def test_parse_regex():
    p = parse_user_query("/ba.*a/ cherry")
    assert p.patterns == ["ba.*a"] and p.positive == ["cherry"]
    for bad in ["/ba", "+/ba/", "-/ba/", "//"]:
        with pytest.raises(ValueError):
            parse_user_query(bad)


def test_regex_full_match_expansion(spark, engine):
    # /ba.*a/ full-matches only 'banana' in this vocabulary
    got = {(r.docno, r.rank, r.rsv)
           for r in run_user_query(engine, "/ba.*a/ cherry").collect()}
    want = {(r.docno, r.rank, r.rsv)
            for r in run_user_query(engine, "banana cherry").collect()}
    assert got == want and got
    # anchored: /ana/ matches nothing (substring must not match)
    assert run_user_query(engine, "/ana/").collect() == []
    # alternation across the vocabulary
    both = {r.docno for r in run_user_query(engine, "/grape|kiwi/").collect()}
    assert both == {"d4"}


def test_autocorrect_selection(spark, engine):
    """expand_fuzzy(max_expansions=1, dist=2) IS the did-you-mean top-1:
    in-vocab terms self-correct at distance 0; hopeless terms vanish."""
    rows = expand_fuzzy(
        engine, [(0, 0, "aple", 2), (0, 1, "banana", 2), (0, 2, "zzzzzzzz", 2)],
        max_expansions=1,
    ).collect()
    got = {r.pos: r.term for r in rows}
    assert got == {1001: "apple", 2001: "banana"}

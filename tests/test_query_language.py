"""Query syntax parsing + dispatch (operators/query_language.py)."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.query_language import (
    parse_user_query,
    run_user_query,
)
from jassjr_spark.operators.search import search


def test_parse_operators():
    p = parse_user_query('+hash table -merge lang:py "exact phrase"')
    assert p.positive == ["hash", "table"]
    assert p.required == ["hash"]
    assert p.negated == ["merge"]
    assert p.filters == {"lang": "py"}
    assert p.phrases == [["exact", "phrase"]]


def test_parse_normalizes_like_the_indexer():
    p = parse_user_query("Hello, WORLD!")
    assert p.positive == ["hello", "world"]
    # a 300-char token truncates to the index's 255-char limit
    p2 = parse_user_query("x" * 300)
    assert len(p2.positive[0]) == 255


@pytest.fixture(scope="module")
def engine(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "apple banana orange", "py"),
            (1, "d1", "apple cherry orange", "py"),
            (2, "d2", "apple banana cherry", "rs"),
            (3, "d3", "apple orange", "rs"),
            (4, "d4", "grape melon kiwi", "py"),
        ],
        "docid long, docno string, content string, lang string",
    )
    idx = build_index(
        docs.select("docid", "docno", "content"), prepend_docno=False
    ).cache()
    meta = docs.select("docid", "lang")
    return docs, idx, meta


def test_plain_query_matches_search(spark, engine):
    _, idx, _ = engine
    got = sorted(
        (r.docno, r.rank, r.rsv)
        for r in run_user_query(idx, "banana cherry").collect()
    )
    q = spark.createDataFrame(
        [(0, 0, "banana"), (0, 1, "cherry")],
        "query_id long, pos int, term string",
    )
    want = sorted((r.docno, r.rank, r.rsv) for r in search(idx, q).collect())
    assert got == want and got


def test_required_term_gates(spark, engine):
    _, idx, _ = engine
    rows = run_user_query(idx, "+banana cherry").collect()
    # only docs WITH banana rank, but cherry still lifts d2 over d0
    assert {r.docno for r in rows} == {"d0", "d2"}
    ranks = {r.docno: r.rank for r in rows}
    assert ranks["d2"] < ranks["d0"]


def test_negated_term_excludes(spark, engine):
    _, idx, _ = engine
    rows = run_user_query(idx, "apple -cherry").collect()
    assert {r.docno for r in rows} == {"d0", "d3"}


def test_required_plus_negated(spark, engine):
    _, idx, _ = engine
    rows = run_user_query(idx, "+banana orange -cherry").collect()
    assert {r.docno for r in rows} == {"d0"}


def test_field_filter_scopes(spark, engine):
    _, idx, meta = engine
    rows = run_user_query(idx, "lang:py apple", metadata=meta).collect()
    assert {r.docno for r in rows} == {"d0", "d1"}


def test_phrase_query(spark, engine):
    docs, idx, _ = engine
    from jassjr_spark.operators.positional import build_positions

    pos = build_positions(docs.select("docid", "content")).cache()
    rows = run_user_query(idx, '"apple banana"', positions=pos).collect()
    assert {r.docno for r in rows} == {"d0", "d2"}


def test_unsupported_combos_raise(spark, engine):
    _, idx, meta = engine
    with pytest.raises(ValueError, match="phrases compose"):
        run_user_query(idx, '"a b" -extra')
    with pytest.raises(ValueError, match="phrases compose"):
        run_user_query(idx, '"a b" lang:py')
    with pytest.raises(ValueError, match="field filters"):
        run_user_query(idx, "lang:py +apple", metadata=meta)
    with pytest.raises(ValueError, match="metadata"):
        run_user_query(idx, "lang:py apple")
    with pytest.raises(ValueError, match="positional"):
        run_user_query(idx, '"apple banana"')


def test_empty_and_oov(spark, engine):
    _, idx, _ = engine
    assert run_user_query(idx, "").collect() == []
    assert run_user_query(idx, "zzznope").collect() == []
    # required OOV term -> unsatisfiable
    assert run_user_query(idx, "+zzznope apple").collect() == []


def test_suggest_rewrite(spark, engine):
    from jassjr_spark.operators.query_language import suggest_rewrite

    _, idx, _ = engine
    # 'aple' -> 'apple'; in-vocab terms and operators untouched
    fixed = suggest_rewrite(idx, "aple -cherry")
    assert fixed == "apple -cherry"
    # nothing OOV -> None (no rewrite needed)
    assert suggest_rewrite(idx, "apple banana") is None
    # hopeless OOV -> None (no suggestion in range)
    assert suggest_rewrite(idx, "zzzzzzzzzzzz") is None
    # the rewritten line executes
    rows = run_user_query(idx, fixed).collect()
    assert {r.docno for r in rows} == {"d0", "d3"}


def test_run_user_queries_batches_plain_lines(spark, engine):
    from jassjr_spark.operators.query_language import run_user_queries

    _, idx, meta = engine
    lines = [
        "banana cherry",          # plain -> batched
        "+banana cherry",         # mixed -> individual
        "apple -cherry",          # negated -> individual
        "lang:py apple",          # scoped -> individual
        "apple orange",           # plain -> batched
        "",                       # empty -> dropped
    ]
    got = sorted(
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in run_user_queries(idx, lines, metadata=meta).collect()
    )
    want = sorted(
        (qid, r.docno, r.rank, r.rsv)
        for qid, line in enumerate(lines)
        if line
        for r in run_user_query(idx, line, metadata=meta,
                                query_id=qid).collect()
    )
    assert got == want and got
    # empty input
    assert run_user_queries(idx, []).collect() == []


def test_parse_boost():
    p = parse_user_query("apple^2 banana cherry^0.5")
    assert p.positive == ["apple", "banana", "cherry"]
    assert p.weights == [2.0, 1.0, 0.5]
    assert p.boosted
    # boost+required and boost-on-negated raise loudly
    with pytest.raises(ValueError):
        parse_user_query("+apple^2 banana")
    with pytest.raises(ValueError):
        parse_user_query("apple -banana^2")


def test_boost_weight_one_is_bitwise_plain(spark, engine):
    _, idx, _ = engine
    got = {(r.docno, r.rank, r.rsv)
           for r in run_user_query(idx, "banana^1 cherry^1.0").collect()}
    want = {(r.docno, r.rank, r.rsv)
            for r in run_user_query(idx, "banana cherry").collect()}
    assert got == want and got


def test_boost_scales_contributions(spark, engine):
    _, idx, _ = engine

    def rsv_map(line):
        return {r.docno: r.rsv for r in run_user_query(idx, line).collect()}

    single_b = rsv_map("banana")
    single_c = rsv_map("cherry")
    boosted = rsv_map("banana^3 cherry^0.25")
    docs = set(single_b) | set(single_c)
    assert set(boosted) == docs
    for d in docs:
        want = 3.0 * single_b.get(d, 0.0) + 0.25 * single_c.get(d, 0.0)
        assert boosted[d] == pytest.approx(want, abs=1e-12)
    # boosting changes the ranking vs unboosted when scores differ
    assert rsv_map("banana cherry") != boosted


def test_boost_composes_with_scope_and_negation(spark, engine):
    _, idx, meta = engine
    scoped = run_user_query(idx, "lang:py banana^4 cherry",
                            metadata=meta).collect()
    assert {r.docno for r in scoped} <= {"d0", "d1", "d4"}
    assert scoped  # banana^4 still matches d0
    negated = run_user_query(idx, "apple^2 -cherry").collect()
    assert {r.docno for r in negated} == {"d0", "d3"}
    plain = {r.docno: r.rsv for r in run_user_query(idx, "apple -cherry").collect()}
    for r in negated:
        assert r.rsv == pytest.approx(2.0 * plain[r.docno], abs=1e-12)


def test_run_user_queries_batches_boosted_plain_lines(spark, engine):
    from jassjr_spark.operators.query_language import run_user_queries

    _, idx, _ = engine
    lines = ["banana^2 cherry", "apple orange^0.5"]
    got = sorted(
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in run_user_queries(idx, lines).collect()
    )
    want = sorted(
        (qid, r.docno, r.rank, r.rsv)
        for qid, line in enumerate(lines)
        for r in run_user_query(idx, line, query_id=qid).collect()
    )
    assert got == want and got


def test_parse_and_dispatch_range_filter(spark, engine):
    from jassjr_spark.operators.query_language import parse_user_query

    p = parse_user_query("apple n_chars:>=19 lang:py size:<2.5")
    assert p.ranges == [("n_chars", ">=", 19.0), ("size", "<", 2.5)]
    assert p.filters == {"lang": "py"}

    docs, idx, _ = engine
    meta = docs.select(
        "docid", "lang", F.length("content").alias("n_chars")
    )
    # d0/d1 have 19-char content; d3 'apple orange' is 12
    got = {r.docno for r in run_user_query(
        idx, "apple n_chars:>=19", metadata=meta).collect()}
    assert got == {"d0", "d1", "d2"}
    # composes with equality filters: lang:rs AND n_chars:>=19 -> d2 only
    got2 = {r.docno for r in run_user_query(
        idx, "apple lang:rs n_chars:>=19", metadata=meta).collect()}
    assert got2 == {"d2"}
    # strict < excludes the boundary
    got3 = {r.docno for r in run_user_query(
        idx, "apple n_chars:<19", metadata=meta).collect()}
    assert got3 == {"d3"}
    # ranges keep the filters-only-with-plain rule
    with pytest.raises(ValueError):
        run_user_query(idx, "+apple n_chars:>5", metadata=meta)
    # scores match the unfiltered run (global stats, the scoped contract)
    plain = {r.docno: r.rsv for r in run_user_query(idx, "apple").collect()}
    for r in run_user_query(idx, "apple n_chars:>=19", metadata=meta).collect():
        assert r.rsv == plain[r.docno]


def test_parser_never_crashes_unexpectedly():
    """Property: parse_user_query on arbitrary printable lines either
    returns a ParsedQuery or raises ValueError (the documented loud
    rejections) — never any other exception. Derandomized so the gate
    stays deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jassjr_spark.operators.query_language import parse_user_query

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    ))
    def check(line):
        try:
            p = parse_user_query(line)
        except ValueError:
            return
        assert len(p.weights) == len(p.positive)
        assert all(w > 0 for w in p.weights)
        assert set(p.required) <= set(p.positive)
        assert all(d >= 0 for _, d in p.fuzzy)
        assert all(len(x) >= 1 for x in p.prefixes)

    check()


def test_parsed_plain_lines_execute(spark, engine):
    """Property: any line that parses to PLAIN terms only dispatches
    identically to search() (the parser cannot invent terms the
    tokenizer wouldn't)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jassjr_spark.operators.query_language import parse_user_query

    _, idx, _ = engine
    word = st.sampled_from(["apple", "banana", "Cherry!", "kiwi", "zz-9"])

    @settings(max_examples=5, deadline=None, derandomize=True)
    @given(st.lists(word, min_size=1, max_size=4))
    def check(words):
        line = " ".join(words)
        p = parse_user_query(line)
        got = sorted((r.docno, r.rank, round(r.rsv, 6))
                     for r in run_user_query(idx, line).collect())
        q = spark.createDataFrame(
            [(0, i, t) for i, t in enumerate(p.positive)],
            "query_id long, pos int, term string",
        )
        want = sorted((r.docno, r.rank, round(r.rsv, 6))
                      for r in search(idx, q).collect())
        assert got == want

    check()


def test_phrase_composes_with_terms(spark, engine):
    """'"apple banana" cherry' == phrase clause + term clause in one
    disjunctive sum: rsv = phrase-only rsv + term-only rsv per doc."""
    docs, idx, _ = engine
    from jassjr_spark.operators.positional import build_positions

    pos = build_positions(docs.select("docid", "content")).cache()
    ph = {r.docno: r.rsv
          for r in run_user_query(idx, '"apple banana"',
                                  positions=pos).collect()}
    tm = {r.docno: r.rsv for r in run_user_query(idx, "cherry").collect()}
    both = {r.docno: r.rsv
            for r in run_user_query(idx, '"apple banana" cherry',
                                    positions=pos).collect()}
    assert set(both) == set(ph) | set(tm)
    for d, rsv in both.items():
        assert rsv == pytest.approx(ph.get(d, 0.0) + tm.get(d, 0.0),
                                    abs=1e-12)
    # two phrases compose too
    two = {r.docno: r.rsv
           for r in run_user_query(idx, '"apple banana" "apple cherry"',
                                   positions=pos).collect()}
    ph2 = {r.docno: r.rsv
           for r in run_user_query(idx, '"apple cherry"',
                                   positions=pos).collect()}
    assert set(two) == set(ph) | set(ph2)
    for d, rsv in two.items():
        assert rsv == pytest.approx(ph.get(d, 0.0) + ph2.get(d, 0.0),
                                    abs=1e-12)
    # pure-phrase result unchanged by the composed path
    assert set(ph) == {"d0", "d2"}
    # boosted terms compose with phrases
    bo = {r.docno: r.rsv
          for r in run_user_query(idx, '"apple banana" cherry^2',
                                  positions=pos).collect()}
    for d, rsv in bo.items():
        assert rsv == pytest.approx(ph.get(d, 0.0) + 2 * tm.get(d, 0.0),
                                    abs=1e-12)


def test_malformed_operators_raise_loudly():
    from jassjr_spark.operators.query_language import parse_user_query

    # fuzzy-then-boost and multi-digit distances must not silently lex
    for bad in ["spark~1^2", "spark~12", "don~t"]:
        with pytest.raises(ValueError, match="fuzzy"):
            parse_user_query(bad)
    # malformed range bounds must not degrade to string equality
    with pytest.raises(ValueError, match="range"):
        parse_user_query("n_chars:>abc data")
    # negative and scientific bounds are valid ranges now
    p = parse_user_query("delta:>=-5 size:<1e5 data")
    assert p.ranges == [("delta", ">=", -5.0), ("size", "<", 1e5)]


def test_run_user_queries_property_mixed_operators(spark, engine):
    """Property (seeded): for random mixes of every operator class the
    batch front end equals per-line dispatch row-for-row."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jassjr_spark.operators.positional import build_positions
    from jassjr_spark.operators.query_language import run_user_queries

    docs, idx, meta = engine
    pos = build_positions(docs.select("docid", "content")).cache()
    line = st.sampled_from([
        "apple banana", "banana^2 cherry", "+banana cherry",
        "apple -cherry", "lang:py apple", "appl~ orange", "ban* apple",
        "/gra.e/", '"apple banana"', "apple n_chars:>=19", "",
    ])

    @settings(max_examples=4, deadline=None, derandomize=True)
    @given(st.lists(line, min_size=1, max_size=5))
    def check(lines):
        m = docs.select("docid", "lang",
                        F.length("content").alias("n_chars"))
        got = sorted(
            (r.query_id, r.docno, r.rank, round(r.rsv, 6))
            for r in run_user_queries(idx, lines, metadata=m,
                                      positions=pos).collect()
        )
        want = sorted(
            (qid, r.docno, r.rank, round(r.rsv, 6))
            for qid, ln in enumerate(lines) if ln
            for r in run_user_query(idx, ln, metadata=m, positions=pos,
                                    query_id=qid).collect()
        )
        assert got == want

    check()


def test_parse_phrase_slop():
    p = parse_user_query('"apple orange"~2 cherry "exact one"')
    assert p.phrases == [["apple", "orange"], ["exact", "one"]]
    assert p.slops == [2, None]
    assert p.positive == ["cherry"]
    # "phrase"~ with no digits leaves a dangling ~ token -> raise-loudly
    with pytest.raises(ValueError):
        parse_user_query('"apple orange"~ cherry')


def test_phrase_slop_executes_span_near(spark, engine):
    docs, idx, _ = engine
    from jassjr_spark.operators.positional import build_positions

    pos = build_positions(docs.select("docid", "content")).cache()
    # exact: only d3 has "apple orange" adjacent
    rows = run_user_query(idx, '"apple orange"', positions=pos).collect()
    assert {r.docno for r in rows} == {"d3"}
    # slop 1 admits one intervening token: d0 (banana), d1 (cherry), d3
    rows = run_user_query(idx, '"apple orange"~1', positions=pos).collect()
    assert {r.docno for r in rows} == {"d0", "d1", "d3"}
    # ordered: reversed phrase matches nothing even with slop
    rows = run_user_query(idx, '"orange apple"~1', positions=pos).collect()
    assert rows == []
    # slop clause composes with a plain term in one disjunctive sum
    rows = run_user_query(idx, '"apple orange"~1 banana',
                          positions=pos).collect()
    by = {r.docno: r.rsv for r in rows}
    assert set(by) == {"d0", "d1", "d2", "d3"} and by["d0"] > by["d1"]

"""KWIC snippet extraction (operators/snippets.py)."""

import pytest

from jassjr_spark.operators.snippets import snippets


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "The Quick brown fox jumps over the lazy dog"),
            (2, "alpha beta gamma delta"),
            (3, "x" * 100 + " needle " + "y" * 100),
            (4, "no terms here at all"),
        ],
        "docid long, content string",
    )
    results = spark.createDataFrame(
        [(10, 1, 1), (10, 2, 2), (10, 3, 3), (10, 4, 4)],
        "query_id long, docid long, rank long",
    )
    queries = spark.createDataFrame(
        [(10, "quick"), (10, "beta"), (10, "needle"), (10, "gamma")],
        "query_id long, term string",
    )
    return docs, results, queries


def test_snippets_basic(frames):
    docs, results, queries = frames
    out = {r.docid: r for r in snippets(results, docs, queries, radius=10).collect()}

    # doc 1: 'quick' matches case-insensitively at pos 5; window clips at
    # the string start; the bracketed span keeps the ORIGINAL case
    r1 = out[1]
    assert (r1.term, r1.pos) == ("quick", 5)
    assert r1.snippet == "The [Quick] brown fox"

    # doc 2: 'beta' (pos 7) beats 'gamma' (pos 12) — earliest wins
    r2 = out[2]
    assert (r2.term, r2.pos) == ("beta", 7)
    assert r2.snippet == "alpha [beta] gamma del"

    # doc 3: interior window, exactly radius chars each side
    r3 = out[3]
    assert r3.pos == 102
    assert r3.snippet == "x" * 9 + " [needle] " + "y" * 9

    # doc 4: no query term occurs in content -> no row at all
    assert 4 not in out
    # pass-through columns survive
    assert r1.rank == 1


def test_snippets_tie_breaks_on_term(spark):
    docs = spark.createDataFrame([(1, "abc and more")], "docid long, content string")
    results = spark.createDataFrame([(7, 1)], "query_id long, docid long")
    queries = spark.createDataFrame(
        [(7, "abc"), (7, "ab")], "query_id long, term string"
    )
    (row,) = snippets(results, docs, queries, radius=5).collect()
    # both terms match at pos 1; 'ab' < 'abc' lexicographically
    assert (row.term, row.pos, row.snippet) == ("ab", 1, "[ab]c and")


def test_snippets_custom_id_col(spark):
    docs = spark.createDataFrame(
        [("d-1", "find the needle here")], "docno string, content string"
    )
    results = spark.createDataFrame([(1, "d-1")], "query_id long, docno string")
    queries = spark.createDataFrame([(1, "needle")], "query_id long, term string")
    (row,) = snippets(results, docs, queries, radius=4, id_col="docno").collect()
    assert row.docno == "d-1" and row.snippet == "the [needle] her"


def test_snippets_multi_fragment(frames):
    docs, results, queries = frames
    rows = [
        r for r in snippets(results, docs, queries, radius=10,
                            fragments=2).collect()
        if r.docid == 2
    ]
    # doc 2 matches 'beta' (pos 7) and 'gamma' (pos 12): two fragments,
    # position order
    assert [(r.fragment, r.term) for r in sorted(rows, key=lambda r: r.fragment)] \
        == [(1, "beta"), (2, "gamma")]
    snips = {r.fragment: r.snippet for r in rows}
    assert snips[1] == "alpha [beta] gamma del"
    assert snips[2] == "lpha beta [gamma] delta"

"""Positional index + phrase search (operators/positional.py): position
extraction vs a Python reference lexer, sliding-window phrase counts
(incl. overlapping and duplicate-slot phrases), elision, and ranking."""

import re

from pyspark.sql import functions as F

from jassjr_spark.operators.positional import (
    build_positions, phrase_occurrences, phrase_search,
)

TOK = "[a-zA-Z0-9][a-zA-Z0-9-]*"


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown quick brown quick"),
        (2, "hash hash hash collision"),
        (3, "empty-of-phrases document text"),
        (4, "the quick Brown FOX"),          # case folding
        (5, ""),                             # empty doc
    ]
    return spark.createDataFrame(rows, "docid long, content string")


def _py_tokens(text):
    return [t[:255] for t in re.findall(TOK, text.lower())]


def _py_phrase_tf(text, phrase):
    toks = _py_tokens(text)
    return sum(
        1 for i in range(len(toks) - len(phrase) + 1)
        if toks[i:i + len(phrase)] == phrase
    )


def test_positions_match_python_lexer(spark):
    docs = _docs(spark)
    got = {
        (r.term, r.docid): (list(r.positions), r.tf)
        for r in build_positions(docs).collect()
    }
    for d in docs.collect():
        toks = _py_tokens(d.content)
        by_term = {}
        for p, t in enumerate(toks):
            by_term.setdefault(t, []).append(p)
        for t, ps in by_term.items():
            assert got[(t, d.docid)] == (ps, len(ps))
    # no rows for the empty doc
    assert not [k for k in got if k[1] == 5]


def test_phrase_tf_sliding_window(spark):
    docs = _docs(spark)
    pos = build_positions(docs).cache()
    for phrase in (["quick", "brown"], ["hash", "hash"],
                   ["the", "quick", "brown"], ["dog"], ["no", "match"]):
        got = {r.docid: r.phrase_tf
               for r in phrase_occurrences(pos, phrase).collect()}
        expect = {
            d.docid: _py_phrase_tf(d.content, phrase)
            for d in docs.collect()
            if _py_phrase_tf(d.content, phrase) > 0
        }
        assert got == expect, phrase
    # the overlapping duplicate-slot case is real: 'hash hash hash' has 2
    assert phrase_occurrences(pos, ["hash", "hash"]).collect()[0].phrase_tf == 2


def test_phrase_search_ranking_and_elision(spark):
    rows = [(i, f"alpha beta {'gamma ' * (i + 1)}x") for i in range(6)]
    docs = spark.createDataFrame(rows, "docid long, content string")
    pos = build_positions(docs).cache()
    dl = (
        docs.select(
            "docid",
            F.size(F.regexp_extract_all(F.lower("content"),
                                        F.lit(TOK), 0)).alias("len"),
        )
    )
    # 'alpha beta' matches EVERY doc -> df == N -> idf 0 -> elided
    out = phrase_search(pos, dl, [(1, ["alpha", "beta"])], k=10)
    assert out.collect() == []
    # 'gamma gamma' matches docs 1..5 with growing tf; shorter docs win
    # on equal tf is irrelevant here — just assert monotone tf ordering
    run = phrase_search(pos, dl, [(2, ["gamma", "gamma"])], k=10).collect()
    assert [r.docid for r in sorted(run, key=lambda r: r.rank)] == [5, 4, 3, 2, 1]
    assert all(r.rsv > 0 for r in run)
    # unmatched phrase contributes nothing alongside a matched one
    both = phrase_search(
        pos, dl, [(2, ["gamma", "gamma"]), (9, ["zz", "qq"])], k=10
    ).collect()
    assert {r.query_id for r in both} == {2}

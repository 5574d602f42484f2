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


def _py_prox_tf(text, terms, window):
    toks = _py_tokens(text)
    anchor = terms[0]
    others = set(terms[1:]) - {anchor}
    pos = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    return sum(
        1 for p in pos.get(anchor, [])
        if all(any(abs(q - p) <= window for q in pos.get(t, []))
               for t in others)
    )


def test_proximity_matches_python_reference(spark):
    from jassjr_spark.operators.positional import proximity_occurrences

    docs = _docs(spark)
    pos = build_positions(docs).cache()
    cases = [
        (["quick", "dog"], 3),     # doc 0: dog at 8, quicks at 1 -> no; window widens below
        (["quick", "dog"], 7),
        (["quick", "brown"], 1),
        (["hash", "collision"], 1),
        (["hash", "hash"], 1),     # duplicate of anchor constrains nothing
        (["fox", "lazy", "dog"], 4),
        (["quick", "zzz"], 5),     # OOV constraint -> nothing
    ]
    for terms, win in cases:
        got = {r.docid: r.prox_tf
               for r in proximity_occurrences(pos, terms, win).collect()}
        expect = {
            d.docid: _py_prox_tf(d.content, terms, win)
            for d in docs.collect()
            if _py_prox_tf(d.content, terms, win) > 0
        }
        assert got == expect, (terms, win)


def test_proximity_window_degenerates_to_membership(spark):
    """A window wider than every document equals boolean AND of the terms
    anchored on the first term's tf."""
    from jassjr_spark.operators.positional import proximity_occurrences

    docs = _docs(spark)
    pos = build_positions(docs).cache()
    got = {r.docid: r.prox_tf
           for r in proximity_occurrences(pos, ["quick", "fox"], 10**6).collect()}
    assert got == {0: 1, 4: 1}  # docs containing both; tf = anchor tf


def test_proximity_search_ranks_by_bm25(spark):
    rows = [(i, "aa bb " + "cc " * i + "aa zz bb") for i in range(1, 5)]
    docs = spark.createDataFrame(rows, "docid long, content string")
    pos = build_positions(docs).cache()
    dl = docs.select(
        "docid",
        F.size(F.regexp_extract_all(F.lower("content"),
                                    F.lit(TOK), 0)).alias("len"),
    )
    # window 1: only the trailing "aa zz bb" pair is ever within reach of
    # bb for large i... every doc still matches via the leading "aa bb"
    run = phrase_search(pos, dl, [(1, ["aa", "bb"])], k=10, window=1)
    assert run.count() == 0  # matches ALL docs -> df == N -> elided
    # tokens: aa(0) bb(1) cc(2..i+1) aa(i+2) zz(i+3) bb(i+4): zz's nearest
    # cc sits exactly 2 away in every doc, so window 1 matches nothing
    assert phrase_search(pos, dl, [(2, ["zz", "cc"])], k=10,
                         window=1).count() == 0
    # window 2 matches all -> df == N -> elided again; make one doc
    # non-matching by querying (zz, dd) where only doc 4 has dd
    docs2 = docs.union(spark.createDataFrame(
        [(9, "zz dd zz dd zz")], "docid long, content string"))
    pos2 = build_positions(docs2).cache()
    dl2 = docs2.select(
        "docid",
        F.size(F.regexp_extract_all(F.lower("content"),
                                    F.lit(TOK), 0)).alias("len"),
    )
    run = phrase_search(pos2, dl2, [(3, ["zz", "dd"])], k=10,
                        window=1).collect()
    assert [r.docid for r in run] == [9] and run[0].rank == 1
    assert run[0].rsv > 0


def _py_span_tf(text, terms, slop):
    """Greedy-minimal ordered-chain reference (== existential: the
    minimal chain has the smallest final position, so it fits iff any
    chain does)."""
    toks = _py_tokens(text)
    by = {}
    for p, t in enumerate(toks):
        by.setdefault(t, []).append(p)
    budget = len(terms) - 1 + slop
    n = 0
    for p0 in by.get(terms[0], []):
        cur, ok = p0, True
        for t in terms[1:]:
            nxt = min((q for q in by.get(t, []) if q > cur), default=None)
            if nxt is None or nxt - p0 > budget:
                ok = False
                break
            cur = nxt
        n += ok
    return n


def test_span_near_slop0_equals_phrase(spark):
    from jassjr_spark.operators.positional import span_near_occurrences

    docs = _docs(spark)
    pos = build_positions(docs).cache()
    for phrase in (["quick", "brown"], ["hash", "hash"],
                   ["the", "quick", "brown"], ["no", "match"]):
        span = {r.docid: r.span_tf
                for r in span_near_occurrences(pos, phrase, 0).collect()}
        ph = {r.docid: r.phrase_tf
              for r in phrase_occurrences(pos, phrase).collect()}
        assert span == ph, phrase


def test_span_near_matches_python_reference(spark):
    from jassjr_spark.operators.positional import span_near_occurrences

    rows = [
        (0, "alpha x beta y gamma"),        # alpha..gamma span 4 (slop 2)
        (1, "alpha beta gamma"),            # exact chain (slop 0)
        (2, "gamma beta alpha"),            # reversed: order must fail
        (3, "alpha x x x beta x x x gamma"),  # span 8 (slop 6)
        (4, "alpha beta alpha beta gamma"),  # multiple anchors
        (5, "alpha alpha beta"),            # duplicate anchor
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    pos = build_positions(docs).cache()
    for terms, slop in (
        (["alpha", "beta"], 0), (["alpha", "beta"], 2),
        (["alpha", "beta", "gamma"], 0), (["alpha", "beta", "gamma"], 2),
        (["alpha", "beta", "gamma"], 6), (["beta", "alpha"], 1),
        (["alpha", "gamma"], 3), (["alpha", "zzz"], 5),
    ):
        got = {r.docid: r.span_tf
               for r in span_near_occurrences(pos, terms, slop).collect()}
        expect = {
            d.docid: _py_span_tf(d.content, terms, slop)
            for d in docs.collect()
            if _py_span_tf(d.content, terms, slop) > 0
        }
        assert got == expect, (terms, slop)


def test_span_near_order_and_boundaries(spark):
    from jassjr_spark.operators.positional import span_near_occurrences

    docs = spark.createDataFrame(
        [(0, "aa x bb"), (1, "bb x aa"), (2, "aa x x bb")],
        "docid long, content string",
    )
    pos = build_positions(docs).cache()
    # slop 1 reaches exactly one intervening token: doc 0 only
    got = {r.docid for r in span_near_occurrences(pos, ["aa", "bb"], 1).collect()}
    assert got == {0}
    # slop 2 admits doc 2's two-token gap as well; doc 1 stays out (order)
    got = {r.docid for r in span_near_occurrences(pos, ["aa", "bb"], 2).collect()}
    assert got == {0, 2}
    # window (unordered) at the same width would admit doc 1 — the
    # operators genuinely differ
    from jassjr_spark.operators.positional import proximity_occurrences
    got = {r.docid for r in proximity_occurrences(pos, ["aa", "bb"], 2).collect()}
    assert got == {0, 1}


def test_span_near_search_scoring(spark):
    rows = [(i, "alpha " + "pad " * 3 + ("alpha beta " * (i + 1)) + "end zzz")
            for i in range(4)] + [(9, "alpha beta only once here")]
    docs = spark.createDataFrame(rows, "docid long, content string")
    pos = build_positions(docs).cache()
    dl = docs.select(
        "docid",
        F.size(F.regexp_extract_all(F.lower("content"),
                                    F.lit(TOK), 0)).alias("len"),
    )
    run = phrase_search(pos, dl, [(1, ["alpha", "beta"])], k=10, slop=0)
    assert run.count() == 0  # every doc matches -> df == N -> elided
    # (alpha, end): only docs 0-3; higher span_tf can't arise but the
    # slop path must still rank by BM25 (shorter doc wins at equal tf)
    run = phrase_search(pos, dl, [(2, ["beta", "end"])], k=10,
                        slop=0).collect()
    assert [r.docid for r in run] == [0, 1, 2, 3]
    # window= and slop= together must refuse
    import pytest as _pytest
    with _pytest.raises(ValueError):
        phrase_search(pos, dl, [(3, ["alpha", "beta"])], window=2, slop=1)


def test_persisted_positions_store(spark, tmp_path):
    from jassjr_spark.operators.positional import (
        phrase_search, span_near_occurrences,
    )
    from jassjr_spark.sources.index_store import (
        pruned_positions, read_positions, term_bucket_py,
        write_positions_store,
    )

    rows = [(i, f"alpha beta w{i} gamma alpha beta " + "pad " * (i % 4))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "docid long, content string")
    pos = build_positions(docs).cache()
    path = str(tmp_path / "posstore")
    write_positions_store(pos, path, n_buckets=8)

    # roundtrip: persisted table == in-memory table
    a = {(r.term, r.docid, tuple(r.positions), r.tf) for r in pos.collect()}
    b = {(r.term, r.docid, tuple(r.positions), r.tf)
         for r in read_positions(spark, path).collect()}
    assert a == b

    # bucket placement honors the portable md5 contract
    placed = read_positions(spark, path).select("term", "bucket").distinct()
    for r in placed.collect():
        assert term_bucket_py(r.term, 8) == r.bucket

    # pruned scan: bucket partition pruning + term pushdown in the plan
    pr = pruned_positions(spark, path, ["alpha", "gamma"])
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:300]
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters", 1)[1][:300]

    # phrase and span results off the pruned persisted scan are
    # bitwise-identical to the in-memory positional table
    dl = docs.select(
        "docid",
        F.size(F.regexp_extract_all(F.lower("content"),
                                    F.lit(TOK), 0)).alias("len"),
    ).cache()
    mem = phrase_search(pos, dl, [(1, ["alpha", "beta"])], k=10).collect()
    store = phrase_search(pruned_positions(spark, path, ["alpha", "beta"]),
                          dl, [(1, ["alpha", "beta"])], k=10).collect()
    assert [(r.docid, r.rank, r.rsv) for r in mem] \
        == [(r.docid, r.rank, r.rsv) for r in store]
    sm = {(r.docid, r.span_tf)
          for r in span_near_occurrences(pos, ["alpha", "gamma"], 2).collect()}
    ss = {(r.docid, r.span_tf)
          for r in span_near_occurrences(
              pruned_positions(spark, path, ["alpha", "gamma"]),
              ["alpha", "gamma"], 2).collect()}
    assert sm == ss and sm


def test_pruned_positions_survives_missing_meta(spark, tmp_path):
    import shutil

    from jassjr_spark.sources.index_store import (
        pruned_positions, write_positions_store,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta")],
        "docid long, content string",
    )
    pos = build_positions(docs)
    path = str(tmp_path / "pos2")
    write_positions_store(pos, path, n_buckets=4)
    shutil.rmtree(f"{path}/_meta")
    got = {(r.term, r.docid)
           for r in pruned_positions(spark, path, ["beta"]).collect()}
    assert got == {("beta", 0), ("beta", 1)}

"""Pluggable similarities + gating/fusion (operators/scoring.py):
LM-Dirichlet and classic TF-IDF hand-verified on an explicit corpus,
minimum-should-match boundary identities with the disjunctive/AND
engines, function_score neutral-element identity and reordering, and
the ERR/RBP evaluation metrics against hand-computed values."""

import math

import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.scoring import (
    function_score, lm_dirichlet_search, search_msm, tfidf_search,
)
from jassjr_spark.operators.search import (
    parse_queries, search, search_conjunctive, to_trec_lines,
)

DOCS = [
    ("d1", "spark join shuffle join"),          # dl 4
    ("d2", "spark merge"),                      # dl 2
    ("d3", "join vector stream merge stream"),  # dl 5
    ("d4", "spark spark spark shuffle"),        # dl 4
]


def _tiny(spark):
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(DOCS)],
        "docid long, docno string, content string",
    )
    return build_index(sdf, prepend_docno=False).cache()


def _hand_index():
    """(tf[term][docid], dl[docid], df, cf, N, C) from DOCS, in Python."""
    tf, dl = {}, {}
    for docid, (_, content) in enumerate(DOCS):
        toks = content.split()
        dl[docid] = len(toks)
        for t in toks:
            tf.setdefault(t, {}).setdefault(docid, 0)
            tf[t][docid] += 1
    df = {t: len(d) for t, d in tf.items()}
    cf = {t: sum(d.values()) for t, d in tf.items()}
    return tf, dl, df, cf, len(DOCS), sum(dl.values())


def test_lmd_hand_computed(spark):
    idx = _tiny(spark)
    tf, dl, df, cf, n, c = _hand_index()
    mu = 2000.0
    q = parse_queries(spark, ["1 spark join"])
    got = {
        r.docno: (r.rank, r.rsv)
        for r in lm_dirichlet_search(idx, q, mu=mu, k=10).collect()
    }
    expect = {}
    for docid in range(n):
        s, matched = 0.0, False
        for t in ("spark", "join"):
            if docid in tf.get(t, {}):
                prior = mu * cf[t] / float(c)
                s += math.log(1.0 + tf[t][docid] / prior) \
                    + math.log(mu / (dl[docid] + mu))
                matched = True
        if matched:
            expect[DOCS[docid][0]] = s
    assert set(got) == set(expect)
    for docno, (_, rsv) in got.items():
        assert rsv == pytest.approx(expect[docno], abs=1e-12)
    # ranking follows the hand scores (desc, docid desc on ties)
    order = sorted(got, key=lambda d: got[d][0])
    assert order == sorted(expect, key=lambda d: -expect[d])


def test_lmd_scores_df_eq_n_terms_and_keeps_negatives(spark):
    """A term in EVERY doc still scores under the LM (no idf elision),
    and a stopword-ish match may score NEGATIVE yet is still ranked."""
    docs = [("a", "the cat"), ("b", "the dog runs"), ("c", "the the the")]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf, prepend_docno=False).cache()
    rows = lm_dirichlet_search(
        idx, parse_queries(spark, ["1 the"]), k=10
    ).collect()
    assert len(rows) == 3                      # df == N, nothing elided
    # low-tf matches of a ubiquitous term score NEGATIVE (the dl norm
    # outweighs the tiny tf lift) and must still be ranked, not cut
    assert min(r.rsv for r in rows) < 0
    # BM25 on the same query returns nothing (df == N elision)
    assert search(idx, parse_queries(spark, ["1 the"]), k=10).collect() == []


def test_tfidf_hand_computed_bitwise(spark):
    idx = _tiny(spark)
    tf, dl, df, cf, n, c = _hand_index()
    q = parse_queries(spark, ["1 spark join stream"])
    got = {r.docno: r.rsv for r in tfidf_search(idx, q, k=10).collect()}
    expect = {}
    for docid in range(n):
        s = 0.0
        for t in ("spark", "join", "stream"):   # query position order
            if docid in tf.get(t, {}):
                idf = 1.0 + math.log(n / (df[t] + 1.0))
                s += math.sqrt(tf[t][docid]) * (idf * idf) \
                    / math.sqrt(dl[docid])
        if s > 0:
            expect[DOCS[docid][0]] = s
    assert got == expect                        # bitwise: IEEE-exact path


def test_msm_boundaries(spark):
    raw = synth_docs(400)
    sdf = spark.createDataFrame(
        [(i, docno_of(r, p, c), t)
         for i, (r, p, c, _, t) in enumerate(raw)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    s = idx.scalar_stats()
    q = parse_queries(spark, ["51 shuffle postings merge"])
    n_scorable = (
        idx.dictionary.filter(F.col("term").isin(
            ["shuffle", "postings", "merge"]))
        .filter(F.col("df") < s["n_docs"]).count()
    )
    assert n_scorable >= 2
    # msm=1 == plain disjunctive
    assert to_trec_lines(search_msm(idx, q, 1, k=50, stats=s)) == \
        to_trec_lines(search(idx, q, k=50, stats=s))
    # msm=#scorable == boolean AND
    assert to_trec_lines(search_msm(idx, q, n_scorable, k=50, stats=s)) == \
        to_trec_lines(search_conjunctive(idx, q, k=50, stats=s))
    # intermediate msm: candidate set sandwiched between the two
    n1 = search_msm(idx, q, 1, k=10_000, stats=s).count()
    n2 = search_msm(idx, q, 2, k=10_000, stats=s).count()
    n3 = search_msm(idx, q, n_scorable, k=10_000, stats=s).count()
    assert n1 >= n2 >= n3 and n1 > n3
    # msm beyond the scorable count: unsatisfiable
    assert search_msm(idx, q, n_scorable + 1, k=10, stats=s).count() == 0
    with pytest.raises(ValueError):
        search_msm(idx, q, 0)


def test_msm_counts_distinct_terms_not_occurrences(spark):
    """A doc with one query term repeated many times must NOT satisfy
    msm=2 — the gate is distinct matched terms."""
    docs = [("a", "alpha alpha alpha alpha"), ("b", "alpha beta"),
            ("c", "gamma")]   # keeps alpha's df < N (else it is elided)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf, prepend_docno=False).cache()
    q = parse_queries(spark, ["1 alpha beta"])
    got = search_msm(idx, q, 2, k=10).collect()
    assert [r.docno for r in got] == ["b"]


def test_function_score_neutral_identity(spark):
    idx = _tiny(spark)
    q = parse_queries(spark, ["1 spark join"])
    plain = to_trec_lines(search(idx, q, k=10))
    empty = spark.createDataFrame([], "docid long, boost double")
    assert to_trec_lines(function_score(idx, q, empty, "multiply", k=10)) \
        == plain
    assert to_trec_lines(function_score(idx, q, empty, "sum", k=10)) == plain
    ones = spark.createDataFrame(
        [(i, 1.0) for i in range(len(DOCS))], "docid long, boost double"
    )
    assert to_trec_lines(function_score(idx, q, ones, "multiply", k=10)) \
        == plain


def test_function_score_reorders_and_scales(spark):
    idx = _tiny(spark)
    q = parse_queries(spark, ["1 spark join"])
    plain = {r.docno: r.rsv
             for r in search(idx, q, k=10).collect()}
    bottom = min(plain, key=plain.get)
    bottom_docid = next(i for i, (d, _) in enumerate(DOCS) if d == bottom)
    boosts = spark.createDataFrame(
        [(bottom_docid, 100.0)], "docid long, boost double"
    )
    got = function_score(idx, q, boosts, "multiply", k=10) \
        .orderBy("rank").collect()
    assert got[0].docno == bottom
    assert got[0].rsv == plain[bottom] * 100.0
    for r in got[1:]:
        assert r.rsv == plain[r.docno]          # neutral boost exact
    with pytest.raises(ValueError):
        function_score(idx, q, boosts, "geometric")


def test_err_hand_computed(spark):
    from jassjr_spark.operators.tooling import err_metric

    run = spark.createDataFrame(
        # q1: rel at ranks 1 and 3; q2: rel at rank 2; q3: no rel retrieved
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2),
         (3, 30, 1)],
        "query_id long, docid long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 1), (1, 99, 0),
         (2, 21, 1), (3, 31, 1)],
        "query_id long, docid long, rel int",
    )
    got = {r.query_id: r.err for r in err_metric(run, qrels, k=10).collect()}
    e1 = 0.5 / 1 + (0.5 / 3) * 0.5          # second rel discounted by first
    e2 = 0.5 / 2
    assert got["1"] == round(e1, 4)
    assert got["2"] == round(e2, 4)
    assert got["3"] == 0.0                   # judged query, nothing found
    assert got["all"] == round((e1 + e2 + 0.0) / 3, 4)


def test_rbp_hand_computed(spark):
    from jassjr_spark.operators.tooling import rbp_metric

    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, docid long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 1), (2, 99, 1)],
        "query_id long, docid long, rel int",
    )
    got = {r.query_id: r.rbp for r in rbp_metric(run, qrels, p=0.8).collect()}
    r1 = 0.2 * (0.8 ** 0 + 0.8 ** 2)
    assert got["1"] == round(r1, 4)
    assert got["2"] == 0.0
    assert got["all"] == round((r1 + 0.0) / 2, 4)
    with pytest.raises(ValueError):
        rbp_metric(run, qrels, p=1.5)


def test_scoring_plans_stay_jvm_side(spark):
    """No Python in any scorer's hot path, and the broadcast query join
    is in the plan — the BM25 plan-shape properties carry over."""
    idx = _tiny(spark)
    q = parse_queries(spark, ["1 spark join"])
    for ranked in (
        lm_dirichlet_search(idx, q, k=10, resolve=False),
        tfidf_search(idx, q, k=10, resolve=False),
        search_msm(idx, q, 1, k=10, resolve=False),
    ):
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Broadcast" in plan

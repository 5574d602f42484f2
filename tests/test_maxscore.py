"""MaxScore (term-granular dynamic pruning) — rank/score identity vs the
naive engine and evidence that the essential/non-essential split really
prunes (operators/maxscore.py)."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.functions.compression import build_blocks
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.maxscore import maxscore_search, term_upper_bounds
from jassjr_spark.operators.search import parse_queries, search, to_trec_lines
from jassjr_spark.operators.wand import impact_bound_expr


def _synth_index(spark, n=600):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    return build_index(sdf)


@pytest.mark.parametrize("k", [3, 10])
def test_maxscore_rank_identity(spark, k):
    """Byte-identical to the naive engine over the mixed synthetic
    workload (duplicate terms, OOV terms, id-less line included)."""
    idx = _synth_index(spark, 800).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    queries = parse_queries(spark, synth_queries(20))
    naive = to_trec_lines(search(idx, queries, k=k, stats=s))
    got = to_trec_lines(maxscore_search(idx, blocks, queries, k=k, stats=s))
    assert got == naive


def test_maxscore_demotes_the_stopword(spark):
    """A high-df low-idf term in a query with two selective terms must be
    demoted to non-essential, and candidate filtering must cut the rows
    scored from its list — with output still byte-identical."""
    # every doc has 'common' (df = N-1: one doc misses it so idf > 0);
    # 'raregold'/'rareiron' pick out tiny doc sets
    docs = []
    for i in range(400):
        toks = ["common"] * 3 if i != 7 else ["filler"]
        if i % 97 == 0:
            toks += ["raregold"]
        if i % 89 == 0:
            toks += ["rareiron"]
        toks += [f"pad{i % 13}"]
        docs.append((i, f"D{i}", " ".join(toks)))
    idx = build_index(_df(spark, docs)).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=32).cache()
    q = parse_queries(spark, ["51 raregold rareiron common"])
    path, info = [], {}
    got = to_trec_lines(
        maxscore_search(idx, blocks, q, k=3, stats=s, path_out=path,
                        info_out=info)
    )
    naive = to_trec_lines(search(idx, q, k=3, stats=s))
    assert got == naive
    assert path == ["maxscore"]
    assert info["51"]["non_essential"] >= 1 and info["51"]["theta"] > 0.0


def _df(spark, docs):
    return spark.createDataFrame(docs, "docid long, docno string, content string")


def test_maxscore_large_k_falls_back(spark):
    idx = _synth_index(spark, 300).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    queries = parse_queries(spark, synth_queries(5))
    path = []
    got = to_trec_lines(
        maxscore_search(idx, blocks, queries, k=1000, stats=s, path_out=path)
    )
    assert path == ["postings"]
    assert got == to_trec_lines(search(idx, queries, k=1000, stats=s))


def test_maxscore_underfilled_topk_is_exhaustive(spark):
    """k larger than any query's match count -> θ stays 0, nothing is
    demoted, output identical (the safety gate, not the fast path)."""
    idx = _synth_index(spark, 120).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    q = parse_queries(spark, ["51 shuffle postings"])
    path, info = [], {}
    got = to_trec_lines(
        maxscore_search(idx, blocks, q, k=100, stats=s, path_out=path,
                        info_out=info)
    )
    assert got == to_trec_lines(search(idx, q, k=100, stats=s))
    for qinfo in info.values():
        assert qinfo["non_essential"] == 0


def test_term_upper_bounds_bound_every_posting(spark):
    """The per-term MaxScore bound must dominate every actual per-posting
    impact in that term's list (the rank-safety precondition)."""
    idx = _synth_index(spark, 400).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    terms = [r.term for r in idx.dictionary.limit(40).collect()]
    ubs = term_upper_bounds(idx, blocks, terms, s["avgdl"])
    k1, b = 0.9, 0.4
    actual = (
        idx.postings.filter(F.col("term").isin(terms))
        .withColumn(
            "imp",
            (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / s["avgdl"]))),
        )
        .groupBy("term").agg(F.max("imp").alias("m"))
        .collect()
    )
    for r in actual:
        assert ubs[r.term] >= r.m - 1e-12


def test_maxscore_local_bounds_identity_and_safety(spark):
    """With block_stats resident, the bound phase runs driver-side
    (term_upper_bounds_local) — output must stay byte-identical, the
    local bounds must dominate the Spark bounds (true upper bounds), and
    pruning must still engage on the stopword query."""
    from jassjr_spark.functions.compression import (
        build_block_stats, collect_block_stats,
    )
    from jassjr_spark.operators.maxscore import term_upper_bounds_local

    idx = _synth_index(spark, 800).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    bstats = collect_block_stats(build_block_stats(blocks))
    queries = parse_queries(spark, synth_queries(20))
    naive = to_trec_lines(search(idx, queries, k=10, stats=s))
    got = to_trec_lines(
        maxscore_search(idx, blocks, queries, k=10, stats=s,
                        block_stats=bstats))
    assert got == naive

    qterms = sorted({r.term for r in queries.select("term").distinct()
                     .collect()} & set(bstats["terms"]))
    spark_ubs = term_upper_bounds(idx, blocks, qterms, s["avgdl"])
    local_ubs = term_upper_bounds_local(bstats, qterms, s["avgdl"])
    for t in qterms:
        assert local_ubs[t] >= spark_ubs[t] - 1e-12, t

    # drifted avgdl: the scaled local bound still dominates the
    # drift-safe Spark bound (rank safety under corpus growth)
    grown = s["avgdl"] * 1.5
    spark_d = term_upper_bounds(idx, blocks, qterms, grown)
    local_d = term_upper_bounds_local(bstats, qterms, grown)
    for t in qterms:
        assert local_d[t] >= spark_d[t] - 1e-12, t

    # floored term -> k1+1 ceiling, still an upper bound
    from jassjr_spark.constants import K1
    floored = {"avgdl0": bstats["avgdl0"], "exact_max": True,
               "terms": {t: v for t, v in bstats["terms"].items()
                         if t != qterms[0]}}
    lf = term_upper_bounds_local(floored, qterms, s["avgdl"])
    assert lf[qterms[0]] == K1 + 1.0
    assert lf[qterms[0]] >= spark_ubs[qterms[0]]

    # pre-imp_max table (sketch top only): refuse, caller uses Spark
    legacy = dict(bstats, exact_max=False)
    assert term_upper_bounds_local(legacy, qterms, s["avgdl"]) is None


def test_maxscore_local_bounds_still_prune(spark):
    """The stopword-demotion behavior survives the driver-side bound
    phase: same split, same candidate cut, identical output."""
    from jassjr_spark.functions.compression import (
        build_block_stats, collect_block_stats,
    )

    docs = []
    for i in range(400):
        toks = ["common"] * 3 if i != 7 else ["filler"]
        if i % 97 == 0:
            toks += ["raregold"]
        if i % 89 == 0:
            toks += ["rareiron"]
        toks += [f"pad{i % 13}"]
        docs.append((i, f"D{i}", " ".join(toks)))
    idx = build_index(_df(spark, docs)).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=32).cache()
    bstats = collect_block_stats(build_block_stats(blocks))
    q = parse_queries(spark, ["51 raregold rareiron common"])
    naive = to_trec_lines(search(idx, q, k=3, stats=s))
    path, info = [], {}
    got = to_trec_lines(
        maxscore_search(idx, blocks, q, k=3, stats=s, path_out=path,
                        info_out=info, block_stats=bstats))
    assert got == naive
    assert path == ["maxscore"]
    assert info["51"]["non_essential"] >= 1


def test_maxscore_local_bounds_multi_epoch_store(spark):
    """Blocks baked under DIFFERENT avgdl0s (an LSM store whose epochs
    were refreshed at different corpus sizes): the driver-resident bound
    must equal the exact per-block maximum max_b[imp_b*max(1,a/a0_b)]
    (never the single-collapsed-avgdl0 scaling, which can undershoot),
    and a legacy stats table lacking imp_per_avgdl0 over such a store
    must refuse so the caller uses the drift-safe Spark scan."""
    from jassjr_spark.functions.compression import (
        build_block_stats, collect_block_stats,
    )
    from jassjr_spark.operators.maxscore import term_upper_bounds_local

    idx = _synth_index(spark, 600).cache()
    s = idx.scalar_stats()
    # epoch 1: first half of the docid space baked under a SMALL avgdl0;
    # epoch 2: second half baked under the current avgdl — exactly what
    # streaming/incremental.py:refresh_blocks produces across refreshes
    half = s["n_docs"] // 2
    a_old = s["avgdl"] / 2.0
    blocks = build_blocks(
        idx.postings.filter(F.col("docid") < half), a_old, block_span=64,
    ).unionByName(build_blocks(
        idx.postings.filter(F.col("docid") >= half), s["avgdl"],
        block_span=64,
    )).cache()
    bstats = collect_block_stats(build_block_stats(blocks))
    assert bstats["avgdl0"] is None          # mixed: no single bake avgdl
    lo, hi = bstats["avgdl0_range"]
    assert lo == pytest.approx(a_old) and hi == pytest.approx(s["avgdl"])

    qterms = sorted(bstats["terms"])[:25]
    for avgdl_now in (s["avgdl"], s["avgdl"] * 1.4):
        local = term_upper_bounds_local(bstats, qterms, avgdl_now)
        exact = {
            r["term"]: r["ub"]
            for r in blocks.groupBy("term").agg(F.max(
                F.col("max_impact")
                * F.greatest(F.lit(1.0), F.lit(avgdl_now) / F.col("avgdl0"))
            ).alias("ub")).collect()
        }
        for t in qterms:
            assert local[t] == pytest.approx(exact[t], rel=1e-12), (
                t, avgdl_now)

    # legacy stats shape (no per-term ratio) over the same mixed store:
    # scaling by any ONE avgdl0 could undershoot an epoch-1 block, so
    # the local path must hand back None
    legacy_terms = {t: v[:3] + (None,) for t, v in bstats["terms"].items()}
    legacy = dict(bstats, terms=legacy_terms)
    assert term_upper_bounds_local(legacy, qterms, s["avgdl"]) is None

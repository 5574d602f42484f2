"""Driver-local adaptive-WAND gate (operators/wand.py:_driver_frac_prunable
over functions/compression.py:build_block_stats): the physical-plan choice
must run without Spark jobs when per-term impact summaries are resident,
agree with the exact Spark probe on clear corpora, defer on drifted or
low-information inputs, and NEVER change query output."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.functions.compression import (
    BLOCK_STATS_FRACTIONS,
    build_block_stats,
    build_blocks,
    collect_block_stats,
)
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import parse_queries, search, to_trec_lines
from jassjr_spark.operators.wand import _driver_frac_prunable, wand_search


def _flat_index(spark, n=600):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    return build_index(sdf)


def _skewed_index(spark, n=1536, rare_docs=8):
    """A corpus where block-max pruning PAYS, via idf dispersion (tf alone
    can't disperse UBs much — BM25's tf factor saturates at k1+1): 'rare'
    (df=8, idf≈5.3) lives only in block 0 at span=64; 'common' (df=n/2,
    idf≈0.7) is everywhere. For the query 'rare common', 23 of 24 block
    UBs carry only the weak term, and θ seeded from block 0's rare docs
    prunes them all."""
    rows = []
    for i in range(n):
        toks = ["filler", f"pad{i % 7}"]
        if i < rare_docs:
            toks += ["rare"] * 3
        if i % 2 == 0:
            toks.append("common")
        rows.append((i, f"D{i:06d}", " ".join(toks)))
    sdf = spark.createDataFrame(
        rows, "docid long, docno string, content string"
    )
    return build_index(sdf)


def _stats_dict(blocks):
    return collect_block_stats(build_block_stats(blocks))


def test_gate_flat_corpus_chooses_postings_identically(spark):
    idx = _flat_index(spark, 600).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    bs = _stats_dict(blocks)
    queries = parse_queries(spark, synth_queries(10))
    p_with, p_wo = [], []
    with_stats = to_trec_lines(
        wand_search(idx, blocks, queries, k=10, stats=s, block_span=64,
                    path_out=p_with, block_stats=bs))
    without = to_trec_lines(
        wand_search(idx, blocks, queries, k=10, stats=s, block_span=64,
                    path_out=p_wo))
    assert p_with == ["postings"] and p_wo == ["postings"]
    assert with_stats == without
    assert with_stats == to_trec_lines(search(idx, queries, k=10, stats=s))


def test_gate_skewed_corpus_chooses_blocks_identically(spark):
    # blocks_min_postings=0: this tiny corpus sits far under the
    # absolute workload floor, and the test exercises the PRUNABILITY
    # gate, not the floor (which has its own test below)
    idx = _skewed_index(spark).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    bs = _stats_dict(blocks)
    queries = parse_queries(spark, ["1 rare common"])
    p_with, p_wo = [], []
    with_stats = to_trec_lines(
        wand_search(idx, blocks, queries, k=5, stats=s, block_span=64,
                    path_out=p_with, block_stats=bs,
                    blocks_min_postings=0))
    without = to_trec_lines(
        wand_search(idx, blocks, queries, k=5, stats=s, block_span=64,
                    path_out=p_wo, blocks_min_postings=0))
    assert p_with == ["blocks"], p_with
    assert p_wo == ["blocks"], p_wo
    assert with_stats == without
    assert with_stats == to_trec_lines(search(idx, queries, k=5, stats=s))


def test_workload_floor_routes_small_queries_to_postings(spark):
    """The absolute workload floor (blocks_min_postings, the default
    path): a prunable corpus whose per-query candidate postings sit
    under the floor routes to the single-scan kernel BEFORE any
    prunability probe — block machinery cannot repay its extra stages
    on sub-10^5-posting queries (measured: 173k-doc Zipf, naive
    122 ms/query vs gated-blocks 223 ms/query). Output identical on
    every path, floor on or off."""
    idx = _skewed_index(spark).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    bs = _stats_dict(blocks)
    queries = parse_queries(spark, ["1 rare common"])
    naive = to_trec_lines(search(idx, queries, k=5, stats=s))
    # default floor (100k) dwarfs this corpus: postings, no probe jobs
    for kwargs in ({}, {"block_stats": bs}):
        p: list = []
        got = to_trec_lines(
            wand_search(idx, blocks, queries, k=5, stats=s, block_span=64,
                        path_out=p, **kwargs))
        assert p == ["postings"], (p, kwargs)
        assert got == naive
    # an explicit tiny floor lets the prunability gate run again
    p2: list = []
    got2 = to_trec_lines(
        wand_search(idx, blocks, queries, k=5, stats=s, block_span=64,
                    path_out=p2, block_stats=bs, blocks_min_postings=1))
    assert p2 == ["blocks"], p2
    assert got2 == naive


def test_gate_estimate_directions(spark):
    """The numpy estimate itself: low on the flat corpus, high on the
    skewed one — on the same queries the exact probe would call the same
    way."""
    flat = _flat_index(spark, 600).cache()
    s_f = flat.scalar_stats()
    bs_f = _stats_dict(build_blocks(flat.postings, s_f["avgdl"], block_span=64))
    q = parse_queries(spark, synth_queries(6))
    qrows = q.select("query_id", "term").collect()
    terms = sorted({r.term for r in qrows})
    ld_f = {r.term: r.df for r in flat.dictionary
            .filter(F.col("term").isin(terms)).collect()}
    est_f = _driver_frac_prunable(qrows, ld_f, bs_f, s_f["n_docs"],
                                  s_f["avgdl"], 64)
    assert est_f is not None and est_f < 0.4, est_f

    skew = _skewed_index(spark).cache()
    s_k = skew.scalar_stats()
    bs_k = _stats_dict(build_blocks(skew.postings, s_k["avgdl"], block_span=64))
    qk = parse_queries(spark, ["1 rare common"])
    qrows_k = qk.select("query_id", "term").collect()
    ld_k = {r.term: r.df for r in skew.dictionary
            .filter(F.col("term").isin(["rare", "common"])).collect()}
    est_k = _driver_frac_prunable(qrows_k, ld_k, bs_k, s_k["n_docs"],
                                  s_k["avgdl"], 64)
    assert est_k is not None and est_k > 0.6, est_k


def test_gate_defers_on_avgdl_drift(spark):
    """A store whose baked avgdl0 drifted >10% from the live avgdl must
    return None: only the Spark probe applies the drift-safe bounds."""
    idx = _flat_index(spark, 300).cache()
    s = idx.scalar_stats()
    bs = _stats_dict(build_blocks(idx.postings, s["avgdl"], block_span=64))
    q = parse_queries(spark, synth_queries(4))
    qrows = q.select("query_id", "term").collect()
    terms = sorted({r.term for r in qrows})
    ld = {r.term: r.df for r in idx.dictionary
          .filter(F.col("term").isin(terms)).collect()}
    a0 = s["avgdl"] / 1.2
    drifted = dict(bs, avgdl0=a0, avgdl0_range=(a0, a0))
    assert _driver_frac_prunable(qrows, ld, drifted, s["n_docs"],
                                 s["avgdl"], 64) is None
    # multi-epoch store where only ONE epoch's bake avgdl drifted: the
    # range check must refuse on either end
    mixed = dict(bs, avgdl0=None, avgdl0_range=(a0, s["avgdl"]))
    assert _driver_frac_prunable(qrows, ld, mixed, s["n_docs"],
                                 s["avgdl"], 64) is None
    # undrifted: decides
    assert _driver_frac_prunable(qrows, ld, bs, s["n_docs"],
                                 s["avgdl"], 64) is not None


def test_gate_missing_term_model(spark):
    """Terms absent from the stats table (below a deployment's min_blocks
    floor) are modeled from df with the k1+1 impact ceiling — the gate
    still decides rather than deferring."""
    idx = _skewed_index(spark).cache()
    s = idx.scalar_stats()
    bs = _stats_dict(build_blocks(idx.postings, s["avgdl"], block_span=64))
    bs_floor = {"avgdl0": bs["avgdl0"],
                "terms": {t: v for t, v in bs["terms"].items() if t != "rare"}}
    q = parse_queries(spark, ["1 rare common"])
    qrows = q.select("query_id", "term").collect()
    ld = {r.term: r.df for r in idx.dictionary
          .filter(F.col("term").isin(["rare", "common"])).collect()}
    est = _driver_frac_prunable(qrows, ld, bs_floor, s["n_docs"],
                                s["avgdl"], 64)
    assert est is not None
    # 'rare' below the floor is modeled from df=8: expected-blocks-hit
    # ≈ 7 of 24 with the k1+1 impact ceiling — presence is overestimated
    # but the dispersion (and so the verdict) stands
    assert est > 0.5, est


def test_gate_oov_only_query_defers(spark):
    idx = _flat_index(spark, 300).cache()
    s = idx.scalar_stats()
    bs = _stats_dict(build_blocks(idx.postings, s["avgdl"], block_span=64))
    q = parse_queries(spark, ["zzzznotaword"])
    qrows = q.select("query_id", "term").collect()
    assert _driver_frac_prunable(qrows, {}, bs, s["n_docs"],
                                 s["avgdl"], 64) is None


def test_block_stats_quantiles_and_floor(spark):
    idx = _skewed_index(spark).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    stats_df = build_block_stats(blocks)
    row = stats_df.filter(F.col("term") == "common").first()
    n_blocks_true = blocks.filter(F.col("term") == "common").count()
    assert row["n_blocks"] == n_blocks_true
    assert len(row["imp_q"]) == len(BLOCK_STATS_FRACTIONS)
    qs = np.asarray(row["imp_q"])
    assert (np.diff(qs) >= -1e-12).all()  # nondecreasing CDF
    true_max = blocks.filter(F.col("term") == "common").agg(
        F.max("max_impact")).first()[0]
    assert qs[-1] == pytest.approx(true_max)
    # floor drops single-block terms
    floored = build_block_stats(blocks, min_blocks=2)
    assert floored.agg(F.min("n_blocks")).first()[0] >= 2


def test_block_stats_persisted_roundtrip(spark, tmp_path):
    from jassjr_spark.plans.build_job import (
        build_persisted_index, load_block_stats,
    )

    raw = synth_docs(200)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    docs = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    path = str(tmp_path / "idx")
    build_persisted_index(spark, docs, path, n_buckets=4, block_span=64)
    loaded = load_block_stats(spark, path)
    assert loaded is not None
    mem = collect_block_stats(
        build_block_stats(spark.read.parquet(f"{path}/blocks")))
    assert set(loaded["terms"]) == set(mem["terms"])
    assert loaded["exact_max"] and mem["exact_max"]
    assert loaded["avgdl0_range"] == mem["avgdl0_range"]
    for t, (nb, qs, mx, ratio) in mem["terms"].items():
        lb, lqs, lmx, lratio = loaded["terms"][t]
        assert lb == nb and lmx == mx and lratio == ratio
        assert ratio is not None  # freshly-built stores bake the scalar
        assert np.allclose(lqs, qs)
    # a store without the stage: loader returns None, gate stays exact
    assert load_block_stats(spark, str(tmp_path / "nope")) is None

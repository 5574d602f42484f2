"""Persisted index store (pushdown + bucket pruning), varbyte round-trip,
and block-max WAND rank/score-identity vs the naive path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, golden_docs, synth_docs, synth_queries
from jassjr_spark.functions.compression import (
    build_blocks,
    decode_blocks,
    encode_block,
    decode_block,
    vb_decode,
    vb_encode,
)
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import parse_queries, search, search_lines, to_trec_lines
from jassjr_spark.operators.wand import wand_search
from jassjr_spark.sources.index_store import (
    read_index,
    term_bucket_col,
    term_bucket_py,
    write_index,
)


def _synth_index(spark, n=600):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    return build_index(sdf)


def test_vb_roundtrip():
    for arr in ([0], [1], [127, 128, 129], [0, 5, 300, 2**31, 2**40],
                list(range(200)), []):
        a = np.asarray(arr, dtype=np.int64)
        assert (vb_decode(vb_encode(a)) == a).all()
    # byte-format pin: little-endian 7-bit groups, high bit on final byte
    assert vb_encode(np.asarray([0], dtype=np.int64)) == b"\x80"
    assert vb_encode(np.asarray([127], dtype=np.int64)) == b"\xff"
    assert vb_encode(np.asarray([128], dtype=np.int64)) == b"\x00\x81"
    d = np.asarray([1000, 1003, 1500], dtype=np.int64)
    t = np.asarray([1, 7, 2], dtype=np.int64)
    l = np.asarray([30, 12, 255], dtype=np.int64)
    dd, tt, ll = decode_block(encode_block(d, t, l, 1000), 1000)
    assert (dd == d).all() and (tt == t).all() and (ll == l).all()


def test_bucket_function_parity(spark):
    """Driver-side md5 bucket == engine-side Column bucket for every term."""
    idx = _synth_index(spark, 200)
    terms = idx.dictionary.select(
        "term", term_bucket_col(F.col("term"), 32).alias("b")
    ).collect()
    for r in terms:
        assert term_bucket_py(r.term, 32) == r.b


def test_persisted_index_roundtrip(spark, tmp_path):
    idx = _synth_index(spark, 400).cache()
    path = str(tmp_path / "index")
    write_index(idx, path)
    idx2 = read_index(spark, path)
    queries = synth_queries(15)
    assert search_lines(idx, spark, queries) == search_lines(idx2, spark, queries)
    # pruning shows up in the physical plan: bucket partition filter +
    # term pushed filter on the parquet scan
    q = parse_queries(spark, ["51 spark-graft the postings"])
    run = search(idx2, q)
    plan = run._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "term" in plan


def test_blocks_roundtrip(spark):
    idx = _synth_index(spark, 500).cache()
    avgdl = idx.scalar_stats()["avgdl"]
    blocks = build_blocks(idx.postings, avgdl, block_span=64)
    decoded = decode_blocks(blocks, block_span=64)
    a = {(r.term, r.docid, r.tf, r.dl) for r in idx.postings.collect()}
    b = {(r.term, r.docid, r.tf, r.dl) for r in decoded.collect()}
    assert a == b
    # block metadata invariants: max_impact bounds every member's impact
    k1, b_ = 0.9, 0.4
    joined = (
        idx.postings.withColumn("block_id", (F.col("docid") / 64).cast("long"))
        .withColumn(
            "imp",
            (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b_ + b_ * (F.col("dl") / avgdl))),
        )
        .groupBy("term", "block_id")
        .agg(F.max("imp").alias("true_max"))
        .join(blocks, ["term", "block_id"])
    )
    bad = joined.filter(F.col("max_impact") < F.col("true_max")).count()
    assert bad == 0


@pytest.mark.parametrize("k", [3, 10, 1000])
def test_wand_rank_identity(spark, k):
    """WAND output must be byte-identical to the naive engine (which is
    itself oracle-identical to the reference)."""
    idx = _synth_index(spark, 800).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=64).cache()
    queries = parse_queries(spark, synth_queries(20))
    naive = to_trec_lines(search(idx, queries, k=k, stats=s))
    # both physical choices must be byte-identical: forced blocks path
    # (decode kept payloads) and forced postings fallback
    for frac in (1.0, 0.0):
        wand = to_trec_lines(
            wand_search(idx, blocks, queries, k=k, stats=s, block_span=64,
                        fallback_keep_frac=frac)
        )
        assert wand == naive, f"fallback_keep_frac={frac}"


def test_wand_golden(spark):
    docs = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(golden_docs())],
        "docid long, docno string, content string",
    )
    idx = build_index(docs).cache()
    s = idx.scalar_stats()
    blocks = build_blocks(idx.postings, s["avgdl"], block_span=4).cache()
    q = parse_queries(spark, ["ten"])
    got = to_trec_lines(wand_search(idx, blocks, q, k=1000, stats=s, block_span=4,
                                    fallback_keep_frac=1.0))
    from jassjr_spark.fixtures import GOLDEN_EXPECTED

    assert got == GOLDEN_EXPECTED["ten"]

"""Impact-ordered segments + SAAT: determinism gate, quantization quality,
anytime degradation."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.impact import (
    build_impact_segments,
    quantized_referee,
    saat_search,
)
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import parse_queries, search


@pytest.fixture(scope="module")
def setup(spark):
    raw = synth_docs(700)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    stats = idx.scalar_stats()
    segments, params = build_impact_segments(idx, stats, seg_span=256)
    q = parse_queries(spark, synth_queries(15)).cache()
    return idx, stats, segments.cache(), q


def _runs(df):
    return {
        qid: [r.docid for r in sorted(rows, key=lambda r: r.rank)]
        for qid, rows in _group(df.collect()).items()
    }


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, []).append(r)
    return out


def test_saat_full_budget_equals_referee(setup):
    idx, stats, segments, q = setup
    saat = saat_search(segments, q, k=50, rho=None)
    ref = quantized_referee(idx, q, k=50, stats=stats)
    a = {(r.query_id, r.rank): (r.docid, r.rsv_q) for r in saat.collect()}
    b = {(r.query_id, r.rank): (r.docid, r.rsv_q) for r in ref.collect()}
    assert a == b  # integer scores: exact equality, no float tolerance


def test_quantized_close_to_exact_bm25(setup):
    idx, stats, segments, q = setup
    saat = _runs(saat_search(segments, q, k=10, rho=None))
    exact = _runs(
        search(idx, q, k=10, stats=stats)
        .join(idx.docids, "docno")
        .select("query_id", "rank", "docid")
    )
    overlaps = []
    for qid, docs in exact.items():
        got = saat.get(qid, [])
        overlaps.append(len(set(docs) & set(got)) / max(len(docs), 1))
    assert sum(overlaps) / len(overlaps) >= 0.9  # 9-bit quantization error


def test_anytime_budget_degrades_gracefully(setup):
    idx, stats, segments, q = setup
    full = _runs(saat_search(segments, q, k=10, rho=None))

    def overlap(run):
        vals = []
        for qid, docs in full.items():
            got = run.get(qid, [])
            vals.append(len(set(docs) & set(got)) / max(len(docs), 1))
        return sum(vals) / len(vals)

    small = overlap(_runs(saat_search(segments, q, k=10, rho=500)))
    big = overlap(_runs(saat_search(segments, q, k=10, rho=5000)))
    assert big >= small  # more budget, no worse
    assert big >= 0.6    # generous budget recovers most of the ranking
    # tiny budget still returns *something* for matched queries
    tiny = saat_search(segments, q, k=10, rho=50).count()
    assert tiny > 0


def test_segments_bounded_and_sorted(setup):
    idx, stats, segments, q = setup
    r = segments.agg(F.max(F.size("docids")).alias("mx")).first()
    assert r.mx <= 256  # seg_span bounds every segment array
    one = segments.limit(5).collect()
    for row in one:
        assert row.docids == sorted(row.docids)

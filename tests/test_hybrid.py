"""Reciprocal-rank fusion (operators/hybrid.py): hand-computed fusion
values, absence convention, weighting, and tie-breaks."""

import pytest

from jassjr_spark.operators.hybrid import rrf_fuse


def _run(spark, rows):
    return spark.createDataFrame(rows, "query_id long, docid long, rank long")


def test_rrf_hand_computed(spark):
    # run A: d1 rank1, d2 rank2 ; run B: d2 rank1, d3 rank2
    a = _run(spark, [(1, 10, 1), (1, 20, 2)])
    b = _run(spark, [(1, 20, 1), (1, 30, 2)])
    got = {r.docid: (r.rank, r.rrf)
           for r in rrf_fuse([a, b], k=10).collect()}
    # d2 in both: 1/62 + 1/61 beats d1 (1/61) and d3 (1/62)
    assert got[20][0] == 1
    assert got[20][1] == pytest.approx(1 / 62 + 1 / 61, abs=0)
    assert got[10] == (2, 1.0 / 61.0)
    assert got[30] == (3, 1.0 / 62.0)


def test_rrf_tiebreak_docid_desc(spark):
    a = _run(spark, [(1, 10, 1), (1, 99, 2)])
    b = _run(spark, [(1, 99, 1), (1, 10, 2)])
    # both docs score 1/61 + 1/62 -> higher docid first
    rows = rrf_fuse([a, b], k=10).orderBy("rank").collect()
    assert [r.docid for r in rows] == [99, 10]


def test_rrf_weights_and_k(spark):
    a = _run(spark, [(1, 10, 1)])
    b = _run(spark, [(1, 20, 1)])
    rows = rrf_fuse([a, b], k=1, weights=[1.0, 10.0]).collect()
    assert len(rows) == 1 and rows[0].docid == 20
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_multi_query_independence(spark):
    a = _run(spark, [(1, 10, 1), (2, 30, 1)])
    b = _run(spark, [(2, 30, 1)])
    rows = rrf_fuse([a, b], k=5).collect()
    by_q = {(r.query_id, r.docid): r.rrf for r in rows}
    assert by_q[(1, 10)] == 1.0 / 61.0
    assert by_q[(2, 30)] == pytest.approx(2 / 61, abs=0)


def test_rescore_by_vector(spark):
    """Phase 2 touches only phase-1 candidates: a lexically-unmatched doc
    never appears however similar its vector; ranks follow cosine."""
    import numpy as np

    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.similarity import rescore_by_vector

    docs = spark.createDataFrame(
        [
            (0, "d0", "apple banana"),
            (1, "d1", "apple cherry"),
            (2, "d2", "apple banana apple"),
            (3, "d3", "unrelated words"),     # never matches 'apple'
        ],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    # vectors: d3 identical to the query vector, others varied
    vecs = [
        (0, [1.0, 0.0, 1.0]),
        (1, [0.9, 0.1, 0.2]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 2.0, 3.0]),   # == qvec but lexically unmatched
    ]
    vectors = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qvecs = spark.createDataFrame([(7, [1.0, 2.0, 3.0])],
                                  "query_id long, qvec array<double>")
    q = spark.createDataFrame([(7, 0, "apple")],
                              "query_id long, pos int, term string")
    got = rescore_by_vector(idx, q, vectors, qvecs, n=10, k=10).collect()
    assert {r.docno for r in got} == {"d0", "d1", "d2"}  # d3 excluded
    by_rank = [r.docno for r in sorted(got, key=lambda r: r.rank)]
    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    want = sorted(
        ((cos(v, [1.0, 2.0, 3.0]), i) for i, v in vecs if i != 3),
        key=lambda t: (-t[0], -t[1]),
    )
    assert by_rank == [f"d{i}" for _, i in want]
    # n=1 cuts phase 1 to the single best lexical candidate (d2: tf=2)
    one = rescore_by_vector(idx, q, vectors, qvecs, n=1, k=10).collect()
    assert [r.docno for r in one] == ["d2"]


def test_mmr_rerank():
    """Hand-verifiable greedy: with lambda=0.5, the second pick prefers
    a moderately-relevant orthogonal vector over a near-duplicate of the
    first pick; lambda=1 degenerates to pure relevance order."""
    from jassjr_spark.operators.similarity import mmr_rerank

    qvec = [1.0, 0.2]
    cands = [
        (1, [1.0, 0.19]),    # best relevance
        (2, [1.0, 0.25]),    # near-duplicate of 1, second-best relevance
        (3, [0.2, 1.0]),     # diverse, low relevance
    ]
    picks = mmr_rerank(cands, qvec, k=3, lam=0.5)
    assert [v for v, _ in picks] == [1, 3, 2]
    # pure-relevance degenerate
    rel_only = mmr_rerank(cands, qvec, k=3, lam=1.0)
    assert [v for v, _ in rel_only] == [1, 2, 3]
    # first pick is pure relevance in both; k caps the pick set
    assert picks[0][1] == rel_only[0][1]
    assert len(mmr_rerank(cands, qvec, k=2, lam=0.5)) == 2
    # tie-break: identical vectors pick the smaller vec_id first
    tie = mmr_rerank([(9, [1.0, 0.0]), (4, [1.0, 0.0])], qvec, k=1)
    assert tie[0][0] == 4


def _srun(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, docid long, score double"
    )


def test_linear_fuse_hand_computed(spark):
    from jassjr_spark.operators.hybrid import linear_fuse

    # run A scores: d1=10, d2=6, d3=2 -> norms 1.0, 0.5, 0.0
    a = _srun(spark, [(1, 10, 10.0), (1, 20, 6.0), (1, 30, 2.0)])
    # run B scores: d2=0.9, d4=0.1 -> norms 1.0, 0.0
    b = _srun(spark, [(1, 20, 0.9), (1, 40, 0.1)])
    got = {r.docid: (r.rank, r.fused)
           for r in linear_fuse([a, b], k=10,
                                weights=[0.6, 0.4]).collect()}
    assert got[20] == (1, 0.6 * 0.5 + 0.4 * 1.0)   # mid lex + top vec
    assert got[10] == (2, 0.6 * 1.0)
    assert got[30][1] == 0.0 and got[40][1] == 0.0
    # zero-fused ties break docid-desc
    assert got[40][0] == 3 and got[30][0] == 4


def test_linear_fuse_degenerate_run_normalizes_to_one(spark):
    from jassjr_spark.operators.hybrid import linear_fuse

    # single-result run (max == min): its doc gets norm 1.0, not NaN
    a = _srun(spark, [(1, 10, 5.0)])
    b = _srun(spark, [(1, 10, 0.3), (1, 20, 0.1)])
    got = {r.docid: r.fused for r in linear_fuse([a, b], k=10).collect()}
    assert got[10] == 1.0 + 1.0
    assert got[20] == 0.0


def test_linear_fuse_scale_invariance(spark):
    """Min-max normalization makes the fusion invariant to affine
    rescaling of either run's scores — the property that motivates it
    over raw-score addition."""
    from jassjr_spark.operators.hybrid import linear_fuse

    a1 = _srun(spark, [(1, 10, 10.0), (1, 20, 6.0), (1, 30, 2.0)])
    a2 = _srun(spark, [(1, 10, 1000.0), (1, 20, 600.0), (1, 30, 200.0)])
    b = _srun(spark, [(1, 20, 0.9), (1, 40, 0.1)])
    r1 = [(r.docid, r.rank, r.fused)
          for r in linear_fuse([a1, b], k=10).orderBy("rank").collect()]
    r2 = [(r.docid, r.rank, r.fused)
          for r in linear_fuse([a2, b], k=10).orderBy("rank").collect()]
    assert r1 == r2


def test_facet_percentiles_hand_computed(spark):
    """Exact interpolated percentiles over the match set, per facet."""
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import facet_percentiles, parse_queries

    docs = [("a", "alpha x"), ("b", "alpha y"), ("c", "alpha z"),
            ("d", "alpha w"), ("e", "beta only")]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf, prepend_docno=False).cache()
    facets = spark.createDataFrame(
        [(0, "py", 10.0), (1, "py", 20.0), (2, "py", 30.0),
         (3, "go", 100.0), (4, "py", 999.0)],  # doc 4 never matches
        "docid long, facet string, val double",
    )
    q = parse_queries(spark, ["1 alpha"])
    got = {r.facet: (r.n_docs, r.p_50, r.p_90)
           for r in facet_percentiles(idx, q, facets).collect()}
    # py match vals [10, 20, 30]: p50 = 20, p90 = 28 (interpolated)
    assert got["py"] == (3, 20.0, 28.0)
    assert got["go"] == (1, 100.0, 100.0)

"""Workload-floor gated batch BM25 (driver_queries.q_ft_bm25_gated_top10 +
InteractiveSearcher.batch_matches): below the floor the batch scores on the
resident driver-local numpy kernel; above it the distributed plan runs
unchanged. Identity between the two physical paths must be EXACT — same
rows, same raw float64 scores — because the gated entry shares the
ft_bm25_top10 DuckDB oracle."""

import pytest

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import InteractiveSearcher


def _docs_df(spark, n_docs):
    raw = synth_docs(n_docs)
    rows = [
        (i, docno_of(r, p, c), content)
        for i, (r, p, c, _, content) in enumerate(raw)
    ]
    return spark.createDataFrame(rows, "docid long, docno string, content string")


def _distributed_matches(idx, spark, lines, s):
    """All (query_id, docid, raw rsv) triples through the distributed
    kernel — search()'s scoring WITHOUT top-k, mirroring batch_matches'
    contract."""
    from jassjr_spark.operators.search import (
        accumulate, parse_queries, score_postings,
    )

    q = parse_queries(spark, lines)
    scored = score_postings(q, idx.postings, idx.dictionary,
                            s["n_docs"], s["avgdl"])
    acc = accumulate(scored).filter("rsv > 0.0")
    return sorted(
        (int(r.query_id), int(r.docid), float(r.rsv)) for r in acc.collect()
    )


def test_batch_matches_bit_identical_to_distributed(spark):
    """Raw float64 scores from the resident numpy fold equal the Spark
    kernel's bit-for-bit (same contribution tree, same CPython-log idf,
    same position-ordered fold) over a corpus with engineered score ties
    (duplicate documents) and bag-semantics/OOV/stopword query shapes."""
    sdf = _docs_df(spark, 300)
    idx = build_index(sdf).cache()
    idx.postings.count()
    s = idx.scalar_stats()

    it = InteractiveSearcher(idx)
    assert it.resident, "300-doc index must fit the default driver budget"

    lines = synth_queries(8) + ["7 ten ten", "8 zzzmissing ten", "9 a the"]
    got = it.batch_matches(lines)
    assert got is not None
    assert sorted(got) == _distributed_matches(idx, spark, lines, s)
    it.close()


def test_batch_matches_refuses_above_floor(spark):
    """Above the workload floor (budget smaller than the index) the
    searcher is NOT resident and batch_matches returns None — the caller
    must take the distributed plan; a zero budget behaves the same."""
    sdf = _docs_df(spark, 120)
    idx = build_index(sdf).cache()
    idx.postings.count()

    total = sum(r.df for r in idx.dictionary.select("df").collect())
    for budget in (0, max(1, total // 2)):
        it = InteractiveSearcher(idx, local_postings_budget=budget)
        assert not it.resident
        assert it.batch_matches(["1 ten nine"]) is None
        it.close()


def test_gated_entry_identical_to_flagship(spark, tmp_path):
    """q_ft_bm25_gated_top10 == q_ft_bm25_top10 row-for-row (values AND
    schema) on a parquet corpus laid out like the driver's sf dirs, at
    k=10 and k=1000."""
    import pandas as pd

    from jassjr_spark import driver_queries as dq

    raw = synth_docs(250)
    pd.DataFrame({
        "doc_id": range(len(raw)),
        "lang": [r[3] for r in raw],
        "text": [r[4] for r in raw],
    }).to_parquet(tmp_path / "documents.parquet")
    sf = str(tmp_path)

    for k in (10, 1000):
        a = dq.q_ft_bm25_top10(spark, sf, k=k)
        b = dq.q_ft_bm25_gated_top10(spark, sf, k=k)
        # names + dtypes (the driver contract's schema compare);
        # nullability legitimately differs across createDataFrame vs plan
        assert [(f.name, f.dataType) for f in a.schema.fields] \
            == [(f.name, f.dataType) for f in b.schema.fields]
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # the gate actually fired: the memoized searcher went resident
    it = dq._resident_searcher(spark, sf)
    assert it.resident and it.batch_matches(["1 ten"]) is not None


def test_gated_entry_ties_rank_by_rounded_score(spark, tmp_path):
    """Engineered rounded-score ties (duplicate documents): the gated
    path's Spark-side rounding + docid-desc window must order them
    identically to the flagship — the boundary the raw-match handoff
    exists to protect (a driver-side pre-round top-k could drop a tied
    boundary doc)."""
    import pandas as pd

    from jassjr_spark import driver_queries as dq

    # 8 duplicate docs matching flagship query 1 ("spark join") with
    # identical lengths -> equal rsv -> rank is pure docid-desc tiebreak;
    # filler docs keep df < N so idf elision doesn't drop the terms
    texts = ["spark join data extra"] * 8 + [
        "window merge sort other",
        "filler one two three",
        "filler four five six",
    ]
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "lang": ["en"] * len(texts),
        "text": texts,
    }).to_parquet(tmp_path / "documents.parquet")
    sf = str(tmp_path)

    a = dq.q_ft_bm25_top10(spark, sf, k=10)
    b = dq.q_ft_bm25_gated_top10(spark, sf, k=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

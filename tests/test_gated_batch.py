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
        (str(r.query_id), int(r.docid), float(r.rsv)) for r in acc.collect()
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

    lines = synth_queries(8) + ["7 ten ten", "8 zzzmissing ten", "9 a the",
                                "½ postings"]  # isnumeric-but-not-int qid
    got = it.batch_matches(lines)
    assert got is not None
    assert sorted(got) == _distributed_matches(idx, spark, lines, s)
    assert any(q == "½" for q, _, _ in got)  # peeled as a STRING qid
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


def test_round4_half_up_matches_spark_round(spark):
    """_round4_half_up must equal Spark's round(double, 4) digit-for-digit
    on adversarial values: exact .00005 decimal boundaries (where numpy's
    half-to-even differs), short reprs, negatives, and BM25-magnitude
    noise. This is the parity claim the gated path's driver-side rounding
    rests on."""
    from pyspark.sql import functions as F

    from jassjr_spark.driver_queries import _round4_half_up

    vals = [0.00005, 0.00015, 0.12345, 0.12355, 2.99995, 0.1, 0.10005,
            13.999949999, 0.000049999, 7.0, 0.33333333, -0.12345,
            1e-9, 123.45675, 0.99995]
    import random

    rng = random.Random(99)
    vals += [rng.uniform(0, 20) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(F.round("x", 4).alias("y")).collect()]
    want = [_round4_half_up(v) for v in vals]
    assert got == want


def test_gated_entry_randomized_identity(spark, tmp_path):
    """Randomized corpora sweep: gated == flagship row-for-row at several
    k, catching band-selection or rounding drift the engineered-tie test
    might miss (duplicated docs guarantee some exact rounded ties)."""
    import random

    import pandas as pd

    from jassjr_spark import driver_queries as dq

    rng = random.Random(17)
    vocab = [t for _, terms in dq.BM25_QUERIES for t in terms] + [
        f"w{i}" for i in range(30)
    ]
    texts = []
    for _ in range(90):
        texts.append(" ".join(rng.choices(vocab, k=rng.randint(2, 12))))
    texts += texts[:15]  # exact duplicates -> engineered rsv ties
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "lang": ["en"] * len(texts),
        "text": texts,
    }).to_parquet(tmp_path / "documents.parquet")
    sf = str(tmp_path)

    for k in (3, 10, 50):
        a = dq.q_ft_bm25_top10(spark, sf, k=k)
        b = dq.q_ft_bm25_gated_top10(spark, sf, k=k)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())), k


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

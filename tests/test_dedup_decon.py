"""Test-set decontamination (operators/dedup.py:decontaminate)."""

import pytest

from jassjr_spark.operators.dedup import decontaminate


@pytest.fixture(scope="module")
def frames(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "docid long, content string",
    )
    corpus = spark.createDataFrame(
        [
            # quotes an 8-token span of the benchmark verbatim
            (0, "he wrote that the quick brown fox jumps over the lazy cat"),
            # shares only a 4-gram -> below an n=5 shingle
            (1, "the quick brown fox ran away"),
            (2, "completely different text with no overlap at all"),
        ],
        "docid long, content string",
    )
    return corpus, bench


def test_decontaminate_flags_quotes(spark, frames):
    corpus, bench = frames
    rows = decontaminate(corpus, bench, n=5, min_shared=1).collect()
    got = {(r.docid, r.bench_id): r.n_shared for r in rows}
    # doc 0 shares the 5-gram windows inside "the quick brown fox jumps
    # over the lazy": positions give 4 shared distinct 5-grams
    assert (0, 100) in got and got[(0, 100)] >= 3
    assert (1, 100) not in got
    assert (2, 100) not in got


def test_decontaminate_min_shared(spark, frames):
    corpus, bench = frames
    high = decontaminate(corpus, bench, n=5, min_shared=100).collect()
    assert high == []


def test_decontaminate_shuffle_fallback_matches(spark, frames):
    corpus, bench = frames
    a = sorted(
        (r.docid, r.bench_id, r.n_shared)
        for r in decontaminate(corpus, bench, n=5).collect()
    )
    b = sorted(
        (r.docid, r.bench_id, r.n_shared)
        for r in decontaminate(
            corpus, bench, n=5, broadcast_benchmark=False
        ).collect()
    )
    assert a == b and a

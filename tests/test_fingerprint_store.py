"""Persisted fingerprint store: incremental dedup of a new batch against
an existing corpus (sources/fingerprint_store.py)."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.dedup import lsh_candidate_pairs
from jassjr_spark.sources.fingerprint_store import (
    dedup_against_store,
    read_fp_meta,
    write_fingerprint_store,
)

BASE = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "pack my box with five dozen liquor jugs right now"),
    (2, "sphinx of black quartz judge my vow immediately please"),
    (3, "completely unrelated text about spark shuffle partitions"),
]
NEW = [
    # near-dup of 0 (one word changed)
    (100, "the quick brown fox jumps over the lazy cat tonight"),
    # exact dup of 1
    (101, "pack my box with five dozen liquor jugs right now"),
    # fresh content
    (102, "nothing here resembles anything stored in the corpus"),
]


@pytest.fixture()
def store(spark, tmp_path):
    docs = spark.createDataFrame(BASE, "docid long, content string")
    path = str(tmp_path / "fp_store")
    write_fingerprint_store(docs, path, n=3, num_hashes=16, bands=4)
    return path


def test_probe_finds_exact_and_near(spark, store):
    new = spark.createDataFrame(NEW, "docid long, content string")
    out = dedup_against_store(new, spark, store, est_threshold=0.25)
    rows = {(r.docid, r.match_docid): r for r in out.collect()}
    assert (101, 1) in rows and rows[(101, 1)].exact
    assert rows[(101, 1)].est_jaccard == 1.0
    assert (100, 0) in rows and not rows[(100, 0)].exact
    assert 0.25 <= rows[(100, 0)].est_jaccard < 1.0
    assert not any(d == 102 for d, _ in rows)


def test_probe_matches_self_join_semantics(spark, store):
    """A batch probed against the store finds the same near-dup pairs the
    batch-mode LSH finds over the union (restricted to cross pairs that
    pass the estimate threshold with threshold 0)."""
    new = spark.createDataFrame(NEW, "docid long, content string")
    both = spark.createDataFrame(
        BASE + NEW, "docid long, content string"
    )
    batch_pairs = {
        (b, a)
        for a, b in (
            (r.docid_a, r.docid_b)
            for r in lsh_candidate_pairs(
                both, n=3, num_hashes=16, bands=4
            ).collect()
        )
        if a < 100 and b >= 100  # cross pairs only
    }
    store_pairs = {
        (r.docid, r.match_docid)
        for r in dedup_against_store(
            new, spark, store, est_threshold=0.0
        ).collect()
    }
    assert batch_pairs == store_pairs


def test_append_extends_store(spark, store, tmp_path):
    more = spark.createDataFrame(
        [(50, "the quick brown fox jumps over the lazy dog tonight")],
        "docid long, content string",
    )
    write_fingerprint_store(more, store, mode="append")
    probe = spark.createDataFrame(
        [(200, "the quick brown fox jumps over the lazy dog tonight")],
        "docid long, content string",
    )
    out = dedup_against_store(probe, spark, store)
    matches = {r.match_docid: r for r in out.collect()}
    assert 0 in matches and 50 in matches
    assert matches[50].exact and matches[0].exact


def test_append_refuses_param_mismatch(spark, store):
    more = spark.createDataFrame([(60, "x y z")], "docid long, content string")
    with pytest.raises(ValueError, match="append params"):
        write_fingerprint_store(more, store, bands=8, mode="append")


def test_probe_prunes_store_partitions(spark, store):
    """The store-side scan must carry the bh_bucket partition filter."""
    new = spark.createDataFrame(NEW[:1], "docid long, content string")
    plan = dedup_against_store(new, spark, store)._jdf.queryExecution().executedPlan().toString()
    assert "bh_bucket" in plan


def test_meta_roundtrip(spark, store):
    meta = read_fp_meta(spark, store)
    assert meta == {"n": 3, "num_hashes": 16, "bands": 4, "n_buckets": 16}

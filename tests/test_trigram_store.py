"""Persisted trigram store: roundtrip identity, bucket-directory pruning
reaching the physical scan, gram pushdown, and grep_persisted == the
brute-force scan."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.grep import (
    build_trigram_index,
    match_count_col,
    needle_grams,
)
from jassjr_spark.sources.index_store import term_bucket_py
from jassjr_spark.sources.trigram_store import (
    grep_persisted,
    probe_gram_dfs,
    pruned_grams,
    read_trigram_store,
    write_trigram_store,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("docid"),
                F.col("text").alias("content"))
        .cache()
    )


@pytest.fixture(scope="module")
def store(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tri") / "store")
    write_trigram_store(build_trigram_index(docs), path, n_buckets=16)
    return read_trigram_store(spark, path)


def test_roundtrip_preserves_grams(docs, store):
    tri = build_trigram_index(docs).select("gram", "docid")
    back = store.grams.select("gram", "docid")
    assert store.n_buckets == 16
    assert back.exceptAll(tri).count() == 0
    assert tri.exceptAll(back).count() == 0


def test_bucket_placement_matches_driver_hash(store):
    rows = store.grams.select("gram", "bucket").distinct().limit(200).collect()
    assert rows
    assert all(r.bucket == term_bucket_py(r.gram, 16) for r in rows)


def test_pruned_scan_plan(store):
    grams = needle_grams("merge batch")
    plan = (
        pruned_grams(store, grams)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:300]
    assert "PushedFilters" in plan
    assert "gram" in plan.split("PushedFilters", 1)[1][:300]


@pytest.mark.parametrize("needle", ["merge batch", "zzznotthere", "ta"])
def test_grep_persisted_is_exact(docs, store, needle):
    got = sorted(
        (r.docid, r.n_matches)
        for r in grep_persisted(docs, needle, store).collect()
    )
    want = sorted(
        (r.docid, r.n_matches)
        for r in docs.filter(F.instr("content", needle) > 0)
        .withColumn("n_matches", match_count_col("content", needle))
        .collect()
    )
    assert got == want


def test_probe_is_tiny_and_correct(docs, store):
    dfs = probe_gram_dfs(store, "merge batch")
    grams = needle_grams("merge batch")
    assert set(dfs) <= set(grams)
    # spot-check one df against a direct count
    g = grams[0]
    direct = (
        build_trigram_index(docs).filter(F.col("gram") == g).count()
    )
    assert dfs[g] == direct

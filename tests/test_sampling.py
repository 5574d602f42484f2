"""Deterministic sampling (operators/sampling.py): layout independence,
monotone growth, stratified thresholds, quota windows."""

import hashlib

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.sampling import (
    deterministic_sample, quota_topk, sample_hash_col, stratified_sample,
)


def _docs(spark, n=500):
    rows = [(i, ["en", "de", "fr"][i % 3], f"doc {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _u(key, seed=42):
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16) / 2 ** 32


def test_hash_col_matches_driver_formula(spark):
    df = _docs(spark, 50).select(
        "doc_id", sample_hash_col(F.col("doc_id"), 7).alias("u")
    )
    for r in df.collect():
        assert r.u == _u(r.doc_id, 7)


def test_sample_is_layout_independent(spark):
    df = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(df.repartition(13), "doc_id", 0.3).collect()
    }
    c = {
        r.doc_id
        for r in deterministic_sample(
            df.repartition(1).sortWithinPartitions(F.desc("doc_id")),
            "doc_id", 0.3,
        ).collect()
    }
    assert a == b == c
    assert 0.2 < len(a) / 500 < 0.4  # roughly the asked fraction


def test_sample_grows_monotonically(spark):
    df = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.3).collect()}
    assert small <= big


def test_stratified_thresholds(spark):
    df = _docs(spark, 300)
    got = stratified_sample(
        df, "lang", {"en": 1.0, "de": 0.0}, key_col="doc_id",
        default_fraction=0.5,
    ).collect()
    langs = {r.lang for r in got}
    en = [r for r in got if r.lang == "en"]
    assert len(en) == 100          # fraction 1.0 keeps every 'en' row
    assert "de" not in langs       # fraction 0.0 keeps none
    fr = [r for r in got if r.lang == "fr"]
    assert all(_u(r.doc_id) < 0.5 for r in fr)
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5}, key_col="doc_id")


def test_quota_topk(spark):
    rows = [(i, "g" + str(i % 2), float(i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string, score double")
    got = quota_topk(df, "g", "score", 3, tie_col="id").collect()
    assert len(got) == 6
    for g in ("g0", "g1"):
        grp = sorted([r for r in got if r.g == g], key=lambda r: r.qrank)
        assert [r.qrank for r in grp] == [1, 2, 3]
        expect = sorted(
            [(i, s) for i, gg, s in rows if gg == g],
            key=lambda t: (-t[1], -t[0]),
        )[:3]
        assert [(r.id, r.score) for r in grp] == expect

"""Streaming incremental dedup over the persisted fingerprint store
(streaming/dedup_stream.py): duplicates reported per micro-batch, novel
docs grow the store so later batches dedup against earlier ones."""

import time

from jassjr_spark.sources.fingerprint_store import (
    dedup_against_store,
    write_fingerprint_store,
)
from jassjr_spark.streaming.dedup_stream import start_dedup_stream

SEED = "alpha beta gamma delta epsilon zeta eta theta"
NOVEL1 = "one two three four five six seven eight nine"
NOVEL2 = "completely different content about query planning"
NOVEL3 = "yet another brand new document body entirely"


def test_dedup_stream_grows_store_across_batches(spark, tmp_path):
    store = str(tmp_path / "store")
    write_fingerprint_store(
        spark.createDataFrame([(0, SEED)], "docid long, content string"),
        store,
    )
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: one exact dup of the seeded doc, one novel doc
    spark.createDataFrame(
        [(10, SEED), (11, NOVEL1)], "docid long, content string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # file-source ordering is mtime-based
    # batch 2: a dup of the doc batch 1 admitted + another novel doc
    spark.createDataFrame(
        [(20, NOVEL1), (21, NOVEL2)], "docid long, content string"
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("docid long, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    report = str(tmp_path / "report")
    survivors = str(tmp_path / "survivors")
    q = start_dedup_stream(
        spark, stream, store, report, str(tmp_path / "ckpt"),
        survivors_path=survivors,
    )
    q.awaitTermination(180)

    hits = {
        (r.docid, r.match_docid): r
        for r in spark.read.parquet(report).collect()
    }
    # batch-1 dup found against the seed corpus
    assert (10, 0) in hits and hits[(10, 0)].exact
    # batch-2 dup found against a doc ADMITTED BY BATCH 1 -> store grew
    assert (20, 11) in hits and hits[(20, 11)].exact
    assert all(d in (10, 20) for d, _ in hits)

    surv = {r.docid for r in spark.read.parquet(survivors).collect()}
    assert surv == {11, 21}

    # the persisted store now answers batch-mode probes for stream docs
    probe = spark.createDataFrame(
        [(30, NOVEL2)], "docid long, content string"
    )
    out = dedup_against_store(probe, spark, store).collect()
    assert {(r.docid, r.match_docid) for r in out} == {(30, 21)}


def test_dedup_stream_report_only_mode(spark, tmp_path):
    """grow_store=False: duplicates in ONE batch against the seed corpus
    are reported, but the store is left untouched."""
    store = str(tmp_path / "store")
    write_fingerprint_store(
        spark.createDataFrame([(0, SEED)], "docid long, content string"),
        store,
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(10, SEED), (11, NOVEL3)], "docid long, content string"
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema("docid long, content string").parquet(
        str(src) + "/*"
    )
    report = str(tmp_path / "report")
    q = start_dedup_stream(
        spark, stream, store, report, str(tmp_path / "ckpt"),
        grow_store=False,
    )
    q.awaitTermination(180)

    assert {
        (r.docid, r.match_docid)
        for r in spark.read.parquet(report).collect()
    } == {(10, 0)}
    # store unchanged: re-probing the novel doc still finds nothing
    again = dedup_against_store(
        spark.createDataFrame([(99, NOVEL3)], "docid long, content string"),
        spark, store,
    )
    assert again.count() == 0


def test_dedup_stream_within_batch_duplicates(spark, tmp_path):
    """Duplicates arriving TOGETHER in one micro-batch are caught even
    though the store contains neither yet: only the min-docid member is
    admitted, the other is reported with the in-batch winner as its
    match."""
    store = str(tmp_path / "store")
    write_fingerprint_store(
        spark.createDataFrame([(0, SEED)], "docid long, content string"),
        store,
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(40, NOVEL1), (41, NOVEL1), (42, NOVEL3)],
        "docid long, content string",
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema("docid long, content string")
        .parquet(str(src) + "/*")
    )
    report = str(tmp_path / "report")
    survivors = str(tmp_path / "survivors")
    q = start_dedup_stream(
        spark, stream, store, report, str(tmp_path / "ckpt"),
        survivors_path=survivors,
    )
    q.awaitTermination(180)

    hits = {(r.docid, r.match_docid): r
            for r in spark.read.parquet(report).collect()}
    assert (41, 40) in hits and hits[(41, 40)].exact
    assert all(d != 40 for d, _ in hits)  # the winner is not a loser
    surv = {r.docid for r in spark.read.parquet(survivors).collect()}
    assert surv == {40, 42}
    # the store admitted exactly one copy: a later probe of the same
    # content matches only docid 40
    out = dedup_against_store(
        spark.createDataFrame([(50, NOVEL1)], "docid long, content string"),
        spark, store,
    ).collect()
    assert {(r.docid, r.match_docid) for r in out} == {(50, 40)}


def test_probe_exact_path_runs_for_tokenless_docs(spark, tmp_path):
    """A batch whose docs have no TOKEN_RE tokens produces no minhash
    signatures, but the sha short-circuit must still fire: byte-identical
    copies of a stored token-less doc are exact duplicates."""
    store = str(tmp_path / "store")
    tokenless = "!!! ??? ... ---"
    write_fingerprint_store(
        spark.createDataFrame(
            [(0, SEED), (1, tokenless)], "docid long, content string"
        ),
        store,
    )
    out = dedup_against_store(
        spark.createDataFrame(
            [(10, tokenless)], "docid long, content string"
        ),
        spark, store,
    ).collect()
    assert {(r.docid, r.match_docid, r.exact) for r in out} == {(10, 1, True)}


def test_probe_is_idempotent_under_replay(spark, tmp_path):
    """Probing a store that already absorbed the batch (a foreachBatch
    replay after the store append committed) reports no self-pairs."""
    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(0, SEED), (1, NOVEL1), (2, NOVEL2)], "docid long, content string"
    )
    write_fingerprint_store(batch, store)
    out = dedup_against_store(batch, spark, store).collect()
    assert out == []
    # within-batch mode too: the replayed batch's docs match only their
    # own store copies, all self-pairs, all filtered
    out2 = dedup_against_store(
        batch, spark, store, include_batch_pairs=True
    ).collect()
    assert out2 == []

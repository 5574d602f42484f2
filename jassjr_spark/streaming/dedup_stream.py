"""Streaming incremental dedup: the crawl-pipeline loop over a persisted
fingerprint store.

Each micro-batch of incoming documents is probed against the store
(sources/fingerprint_store.py); duplicate hits are appended to a report
sink, and — when ``grow_store`` is on — the batch's NOVEL documents are
fingerprinted INTO the store, so later batches dedup against everything
the stream has already admitted. That self-maintaining loop is exactly
how a 100-TB crawl keeps itself duplicate-free: the store is the state,
bounded by the unique corpus, partition-pruned per probe; Spark's own
streaming state holds nothing (foreachBatch + idempotent appends).

Exactly-once caveat (documented, standard for foreachBatch side
effects): a batch replayed after a crash between the two appends can
re-append one of them; both sinks are keyed (docid, match_docid) /
docid, so downstream readers dedup on key — the usual idempotent-sink
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.sources.fingerprint_store import (
    dedup_against_store,
    read_fp_meta,
    write_fingerprint_store,
)


def start_dedup_stream(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    report_path: str,
    checkpoint: str,
    *,
    est_threshold: float = 0.5,
    grow_store: bool = True,
    survivors_path: str | None = None,
    trigger_available_now: bool = True,
):
    """docs: streaming DataFrame with (docid long, content string).

    Appends duplicate pairs (docid, match_docid, n_bands, est_jaccard,
    exact) to ``report_path``; novel docs are appended to the store
    (``grow_store``) and, if ``survivors_path`` is given, their
    (docid, content) rows are appended there — the deduped output feed.

    The probe runs with ``include_batch_pairs=True``, so duplicates that
    arrive TOGETHER in one micro-batch are caught too (the store alone
    can't see them — it contains neither yet): within-batch pairs are
    oriented docid > match_docid, so the anti-join admits only the
    min-docid member of each duplicated group (for a near-dup chain
    A<B<C every non-minimal member carries at least one report row, so
    only A is admitted — conservative, matching the streaming exact
    dedup's min-docid-wins rule).
    """
    # bind the store's own parameters once; appends then always match
    meta = read_fp_meta(spark, store_path)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        b = batch.select("docid", "content")
        if not b.take(1):
            return
        # batch-sized; reused by the report write and the novelty anti-join
        b = b.localCheckpoint(eager=True)
        hits = dedup_against_store(
            b, spark, store_path, est_threshold=est_threshold,
            include_batch_pairs=True,
        ).localCheckpoint(eager=True)
        hits.write.mode("append").parquet(report_path)
        if grow_store or survivors_path:
            novel = b.join(
                hits.select("docid").distinct(), "docid", "left_anti"
            )
            if grow_store:
                novel = novel.localCheckpoint(eager=True)
            if survivors_path:
                novel.write.mode("append").parquet(survivors_path)
            if grow_store:
                write_fingerprint_store(
                    novel, store_path, mode="append",
                    n=meta["n"], num_hashes=meta["num_hashes"],
                    bands=meta["bands"], n_buckets=meta["n_buckets"],
                )

    writer = docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Incremental (streaming) index maintenance.

The reference is strictly batch (SURVEY.md §2.4: no streaming anywhere), so
this is an additive capability: keep the persisted index current as new
documents arrive, without rebuilding.

Design — LSM-style segment append under the same on-disk contract as the
batch store (sources/index_store.py):

* a Structured Streaming query over the incoming documents feeds
  ``foreachBatch``; each micro-batch (epoch) runs the SAME Arrow
  tokenize+combine kernel as the batch build and APPENDS bucket-partitioned
  postings / doc_lengths / docids segment files. Parquet append per
  partition directory is the segment write; epochs are serialized by the
  streaming engine, so docid assignment (a per-epoch row_number offset by
  the persisted high-water mark) is race-free.
* ``docid`` high-water mark lives in ``{path}/_watermark`` and is advanced
  atomically per epoch AFTER the segment lands — an epoch that crashes
  mid-write is re-run by the engine with the same input (foreachBatch
  replay) and simply overwrites its segment (epoch-id-named files), giving
  effectively-once semantics.
* ``dictionary`` and ``stats`` are derived tables; appends invalidate
  them. ``refresh_derived`` recomputes both from the postings union (the
  compaction step). Searches between refreshes can either call it or
  accept the staleness — rank math only needs N/avgdl/df, so staleness is
  a recall question for NEW docs, never wrong scores for old ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.functions.tokenize import doc_term_frequencies
from jassjr_spark.operators.index_build import assign_docids
from jassjr_spark.sources.index_store import (
    DEFAULT_BUCKETS,
    read_meta,
    term_bucket_col,
    write_meta,
)


def _read_watermark(spark: SparkSession, path: str) -> tuple[int, int | None]:
    """-> (next_docid high-water mark, max applied epoch id or None).

    Tolerates pre-epoch watermark files (no epoch_id column) WITHOUT
    resetting the high-water mark — a blanket except here would assign
    duplicate docids to the next append."""
    try:
        wm = spark.read.parquet(f"{path}/_watermark")
    except Exception:
        return 0, None  # no watermark yet: a fresh index
    aggs = [F.max("next_docid")]
    if "epoch_id" in wm.columns:
        aggs.append(F.max("epoch_id"))
    row = wm.agg(*aggs).first()
    return row[0] or 0, (row[1] if len(row) > 1 else None)


def _write_watermark(
    spark: SparkSession, path: str, next_docid: int, epoch_id: int | None
) -> None:
    spark.createDataFrame(
        [(next_docid, epoch_id)], "next_docid long, epoch_id long"
    ).coalesce(1).write.mode("append").parquet(f"{path}/_watermark")


def append_documents(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    prepend_docno: bool = True,
    n_buckets: int | None = None,
    epoch_id: int | None = None,
) -> int:
    """Append one batch of (docno, content) documents to the index at
    ``path``; returns the number of docs appended. This is the foreachBatch
    body — also usable directly for batch increments (epoch_id=None).

    Effectively-once: with an ``epoch_id``, segment data lands in
    epoch-named directories written with mode("overwrite") — a foreachBatch
    replay of a crashed epoch re-derives the SAME docid base (the watermark,
    written last, never advanced) and overwrites its own partial segment.
    A replay of a *completed* epoch is skipped via the applied-epoch mark in
    ``_watermark``. Do not mix epoch-ful and epoch-less appends in one
    index: partition discovery needs a consistent directory depth.
    """
    if n_buckets is None:
        n_buckets = read_meta(spark, path)["n_buckets"] or DEFAULT_BUCKETS
    base, last_epoch = _read_watermark(spark, path)
    if epoch_id is not None and last_epoch is not None and epoch_id <= last_epoch:
        return 0  # replay of an already-applied epoch
    seg = f"/epoch={epoch_id}" if epoch_id is not None else ""
    mode = "overwrite" if epoch_id is not None else "append"
    staged: list = []
    batch = assign_docids(batch, ["docno"], base=base, cleanup=staged).cache()
    n = batch.count()
    if n == 0:
        for df in staged:
            df.unpersist()
        batch.unpersist()
        return 0

    postings = doc_term_frequencies(batch, prepend_docno=prepend_docno)
    (
        postings.withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "docid")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{path}/postings{seg}")
    )
    (
        batch.select("docid")
        .join(postings.groupBy("docid").agg(F.min("dl").alias("len")),
              "docid", "left")
        .select("docid", F.coalesce("len", F.lit(0)).alias("len"))
        .write.mode(mode).parquet(f"{path}/doc_lengths{seg}")
    )
    batch.select("docid", "docno").write.mode(mode).parquet(f"{path}/docids{seg}")
    # watermark last: its presence certifies every segment above landed
    _write_watermark(spark, path, base + n, epoch_id)
    # release the per-batch caches: a long-running stream must not pin
    # one batch-sized cache entry per epoch
    for df in staged:
        df.unpersist()
    batch.unpersist()
    return n


def refresh_derived(spark: SparkSession, path: str,
                    incremental: bool = True) -> None:
    """Recompute dictionary + stats (the compaction step after appends).

    Incremental mode (epoch-named segment layout only): the dictionary
    delta aggregates ONLY epochs newer than the last refresh (marker in
    ``_refreshed``) and full-outer-merges into the existing dictionary —
    at 10^12 postings a full re-aggregation per compaction is a full-index
    scan; the delta is proportional to what arrived. Falls back to the
    full recompute when there is no epoch column or no prior dictionary.
    Stats stay a full pass over doc_lengths (one small int per doc)."""
    postings = spark.read.parquet(f"{path}/postings")
    dl = spark.read.parquet(f"{path}/doc_lengths")

    last = _read_refresh_marker(spark, path)
    can_increment = (
        incremental and "epoch" in postings.columns
        and _exists(spark, f"{path}/dictionary") and last is not None
    )
    if can_increment:
        delta = (
            postings.filter(F.col("epoch") > last)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("d_df"),
                 F.sum("tf").cast("long").alias("d_cf"))
        )
        old = spark.read.parquet(f"{path}/dictionary")
        dictionary = (
            old.join(delta, "term", "full_outer")
            .select(
                "term",
                (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0)))
                .alias("df"),
                (F.coalesce("cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0)))
                .cast("long").alias("cf"),
            )
        )
        # the old dictionary is an input of the overwrite target: stage
        # through a swap directory so the read completes before the delete
        dictionary.write.mode("overwrite").parquet(f"{path}/dictionary_next")
        spark.read.parquet(f"{path}/dictionary_next").write.mode(
            "overwrite"
        ).parquet(f"{path}/dictionary")
    else:
        dictionary = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cf")
        )
        # overwrite via temp-and-swap semantics: parquet overwrite is
        # atomic enough here because readers re-list files per query
        dictionary.write.mode("overwrite").parquet(f"{path}/dictionary")
    if "epoch" in postings.columns:
        hi = postings.agg(F.max("epoch")).first()[0]
        if hi is not None:
            _write_refresh_marker(spark, path, int(hi))

    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.sum("len").cast("long").alias("total_terms"),
    ).crossJoin(
        spark.read.parquet(f"{path}/dictionary").agg(
            F.count(F.lit(1)).alias("vocab_size")
        )
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def _exists(spark: SparkSession, p: str) -> bool:
    try:
        spark.read.parquet(p).schema
        return True
    except Exception:
        return False


def _read_refresh_marker(spark: SparkSession, path: str) -> int | None:
    try:
        return spark.read.parquet(f"{path}/_refreshed").agg(
            F.max("epoch_id")
        ).first()[0]
    except Exception:
        return None


def _write_refresh_marker(spark: SparkSession, path: str, epoch_id: int) -> None:
    spark.createDataFrame([(epoch_id,)], "epoch_id long").coalesce(1).write.mode(
        "append"
    ).parquet(f"{path}/_refreshed")


def start_indexing_stream(
    spark: SparkSession,
    stream: DataFrame,
    path: str,
    checkpoint: str,
    prepend_docno: bool = True,
    n_buckets: int = DEFAULT_BUCKETS,
    trigger_available_now: bool = True,
):
    """Attach the incremental indexer to a streaming documents source
    (columns docno, content). Returns the StreamingQuery."""
    write_meta(spark, path, n_buckets)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        append_documents(
            spark, batch.select("docno", "content"), path,
            prepend_docno=prepend_docno, n_buckets=n_buckets,
            epoch_id=epoch_id,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

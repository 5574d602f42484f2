"""Checkpoint-resumable index build (SURVEY.md §7 stage 4; north-rule
"resumable from checkpoint with per-partition lineage + metrics tables").

The build is a DAG of stages, each materializing one artifact:

    docids -> postings -> doc_lengths -> dictionary -> stats -> blocks

Each stage, on completion, appends to two Parquet tables under the index
root:

* ``_lineage``  (stage, status, input_fingerprint, rows_out, duration_s,
  finished_at) — one row per completed stage run. A stage is SKIPPED on
  re-run when a lineage row with the same input fingerprint exists AND its
  output directory has a _SUCCESS marker; a crashed run (no marker / no
  row) re-executes just that stage. Within a stage, Spark's own task
  retry + atomic _SUCCESS commit give partition-level exactly-once.
* ``_metrics``  (stage, partition_key, rows) — per-partition row counts:
  per term-bucket for postings/blocks (proves the skew story: no bucket
  should dwarf the others), plus headline aggregates (max df per bucket —
  the stopword watermark of SURVEY.md §7 hard-part 5).

The input fingerprint is order-insensitive (count + xor/sum of per-row
crc32 of docno) so a byte-identical corpus resumes regardless of
partitioning, while any changed/added document invalidates downstream
stages.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.functions.compression import DEFAULT_BLOCK_SPAN, build_blocks
from jassjr_spark.operators.index_build import Index, assign_docids, build_index
from jassjr_spark.sources.index_store import (
    DEFAULT_BUCKETS,
    read_index,
    read_meta,
    term_bucket_col,
    write_meta,
)

LINEAGE_SCHEMA = (
    "stage string, status string, input_fingerprint string, rows_out long, "
    "duration_s double, finished_at string"
)
METRICS_SCHEMA = "stage string, partition_key string, rows long"


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def input_fingerprint(docs: DataFrame) -> str:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("docno"))).alias("s"),
        F.sum(F.crc32(F.col("content"))).alias("c"),
    ).first()
    return f"{row.n}:{row.s}:{row.c}"


@dataclass
class BuildReport:
    executed: list[str]
    skipped: list[str]
    fingerprint: str


def _append(spark: SparkSession, path: str, rows: list, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def build_persisted_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    order_cols: list[str] | None = None,
    prepend_docno: bool = True,
    n_buckets: int = DEFAULT_BUCKETS,
    block_span: int = DEFAULT_BLOCK_SPAN,
    include_impact: bool = False,
    fail_after_stage: str | None = None,  # test hook: simulate a crash
) -> BuildReport:
    """Build (or resume building) a persisted index at ``path``."""
    if order_cols is not None:
        docs = assign_docids(docs, order_cols)
    fp = input_fingerprint(docs)

    done: set[str] = set()
    lineage_path = f"{path}/_lineage"
    if _exists(spark, lineage_path):
        for r in spark.read.parquet(lineage_path).collect():
            if (
                r.status == "ok"
                and r.input_fingerprint == fp
                and _exists(spark, f"{path}/{r.stage}/_SUCCESS")
            ):
                done.add(r.stage)

    idx = build_index(docs, prepend_docno=prepend_docno)
    executed, skipped = [], []

    def run_stage(stage: str, writer, metrics=None) -> None:
        if stage in done:
            skipped.append(stage)
            return
        t0 = time.perf_counter()
        rows_out = writer()
        dt = time.perf_counter() - t0
        if metrics is not None:
            _append(spark, f"{path}/_metrics", metrics(), METRICS_SCHEMA)
        _append(
            spark,
            lineage_path,
            [(stage, "ok", fp, rows_out, round(dt, 3),
              time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))],
            LINEAGE_SCHEMA,
        )
        executed.append(stage)
        if fail_after_stage == stage:
            raise RuntimeError(f"injected failure after stage {stage}")

    def write_df(df: DataFrame, sub: str) -> int:
        df.write.mode("overwrite").parquet(f"{path}/{sub}")
        return spark.read.parquet(f"{path}/{sub}").count()

    run_stage("docids", lambda: write_df(idx.docids, "docids"))

    def write_postings() -> int:
        (
            idx.postings.withColumn(
                "bucket", term_bucket_col(F.col("term"), n_buckets)
            )
            .repartition(n_buckets, "bucket")
            .sortWithinPartitions("term", "docid")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/postings")
        )
        return spark.read.parquet(f"{path}/postings").count()

    def postings_metrics() -> list:
        written = spark.read.parquet(f"{path}/postings")
        per_bucket = [
            ("postings", f"bucket={r.bucket}", r.n)
            for r in written.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        heavy = (
            written.groupBy("bucket", "term").agg(F.count(F.lit(1)).alias("df"))
            .groupBy("bucket").agg(F.max("df").alias("max_df")).collect()
        )
        per_bucket += [("postings_max_df", f"bucket={r.bucket}", r.max_df) for r in heavy]
        return per_bucket

    run_stage("postings", write_postings, postings_metrics)

    # downstream stages read the materialized postings (checkpoint cut: the
    # tokenizer never re-runs once postings are on disk)
    postings_on_disk = spark.read.parquet(f"{path}/postings")

    run_stage(
        "doc_lengths",
        lambda: write_df(
            idx.docids.select("docid")
            .join(
                postings_on_disk.groupBy("docid").agg(F.min("dl").alias("len")),
                "docid", "left",
            )
            .select("docid", F.coalesce("len", F.lit(0)).alias("len")),
            "doc_lengths",
        ),
    )
    run_stage(
        "dictionary",
        lambda: write_df(
            postings_on_disk.groupBy("term").agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("tf").cast("long").alias("cf"),
            ),
            "dictionary",
        ),
    )

    def write_stats() -> int:
        dl = spark.read.parquet(f"{path}/doc_lengths")
        dc = spark.read.parquet(f"{path}/dictionary")
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("len").alias("avgdl"),
            F.sum("len").cast("long").alias("total_terms"),
        ).crossJoin(dc.agg(F.count(F.lit(1)).alias("vocab_size")))
        return write_df(stats, "stats")

    run_stage("stats", write_stats)

    def write_blocks() -> int:
        avgdl = spark.read.parquet(f"{path}/stats").first()["avgdl"]
        blocks = build_blocks(postings_on_disk, avgdl, block_span)
        (
            blocks.withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
            .repartition(n_buckets, "bucket")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/blocks")
        )
        return spark.read.parquet(f"{path}/blocks").count()

    def blocks_metrics() -> list:
        written = spark.read.parquet(f"{path}/blocks")
        return [
            ("blocks", f"bucket={r.bucket}", r.n)
            for r in written.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        ]

    run_stage("blocks", write_blocks, blocks_metrics)

    def write_block_stats() -> int:
        from jassjr_spark.functions.compression import build_block_stats

        stats_df = build_block_stats(spark.read.parquet(f"{path}/blocks"))
        # one tiny row per term: coalesce so the startup load is one read
        stats_df.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/block_stats"
        )
        return spark.read.parquet(f"{path}/block_stats").count()

    run_stage("block_stats", write_block_stats)

    if include_impact:
        def write_impact() -> int:
            from jassjr_spark.operators.impact import build_impact_segments
            from jassjr_spark.operators.index_build import Index as _Index

            stats_row = spark.read.parquet(f"{path}/stats").first()
            tmp_index = _Index(
                postings=postings_on_disk,
                dictionary=spark.read.parquet(f"{path}/dictionary"),
                doc_lengths=spark.read.parquet(f"{path}/doc_lengths"),
                docids=spark.read.parquet(f"{path}/docids"),
                stats=spark.read.parquet(f"{path}/stats"),
            )
            segments, _ = build_impact_segments(
                tmp_index,
                {"n_docs": stats_row["n_docs"], "avgdl": stats_row["avgdl"]},
            )
            (
                segments.withColumn(
                    "bucket", term_bucket_col(F.col("term"), n_buckets)
                )
                .repartition(n_buckets, "bucket")
                .sortWithinPartitions("term", F.col("impact").desc())
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{path}/impact_segments")
            )
            return spark.read.parquet(f"{path}/impact_segments").count()

        run_stage("impact_segments", write_impact)

    write_meta(spark, path, n_buckets, block_span)
    return BuildReport(executed=executed, skipped=skipped, fingerprint=fp)


def load_persisted(spark: SparkSession, path: str) -> tuple[Index, DataFrame]:
    """-> (Index, blocks) from a completed persisted build. Refuses a
    blocks table whose recorded payload format differs from the decoder's
    (clear 'rebuild blocks' error instead of a mid-query decode failure),
    and refuses pending delete tombstones: the compressed blocks payloads
    bake docids in, so the row-table masking read_index applies cannot
    reach them — a WAND query would resurrect deleted docs."""
    from jassjr_spark.sources.index_store import (
        check_blocks_format,
        read_meta,
        tombstones_df,
    )

    check_blocks_format(read_meta(spark, path), path)
    if tombstones_df(spark, path) is not None:
        raise ValueError(
            f"index at {path!r} has pending delete tombstones; compressed "
            "blocks cannot be masked. Compact (streaming.incremental."
            "compact_segments) and rebuild the blocks stage, or query "
            "without --wand."
        )
    return read_index(spark, path), spark.read.parquet(f"{path}/blocks")


def load_block_stats(spark: SparkSession, path: str) -> dict | None:
    """Driver-resident per-term impact summary for the adaptive WAND
    gate, from a persisted build's ``block_stats`` stage. None when the
    store predates the stage (the gate then uses the exact Spark
    probe).

    Freshness contract: the WAND gate tolerates stale stats (a wrong
    PLAN, never a wrong answer), but handing these to maxscore_search's
    ``block_stats`` makes imp_max a pruning SAFETY bound — if blocks
    were appended/rebuilt after the stats stage ran, re-run the stage
    (or verify with ``index_job --fsck``, whose block_stats audit
    catches exactly this) before serving MaxScore from them."""
    from jassjr_spark.functions.compression import collect_block_stats

    if not _exists(spark, f"{path}/block_stats"):
        return None
    return collect_block_stats(spark.read.parquet(f"{path}/block_stats"))

"""Streaming search: a stream of query lines evaluated continuously
against a (periodically refreshed) index.

The reference REPL reads stdin line-by-line (JASSjr_search.cpp:168); the
streaming analogue consumes query lines from any Structured Streaming
source and emits TREC-format result rows per micro-batch via
``foreachBatch`` — each batch is one batched `search()` call, so the
engine's batch-amortized latency applies, and the index handle (cached
DataFrames + broadcast stats + optional driver dictionary snapshot) is
reused across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import parse_queries, search, terms_of


def start_search_stream(
    spark: SparkSession,
    query_lines: DataFrame,
    index: Index,
    output_path: str,
    checkpoint: str,
    k: int = 1000,
    stats: dict | None = None,
    local_dict: dict | None = None,
    trigger_available_now: bool = True,
):
    """query_lines: streaming DataFrame with a single ``line`` string
    column. Appends (query_id, docno, rank, rsv) parquet per batch."""
    s = stats or index.scalar_stats()

    def handle(batch: DataFrame, epoch_id: int) -> None:
        lines = [r.line for r in batch.collect() if r.line and r.line.strip()]
        if not lines:
            return
        q = parse_queries(spark, lines)
        # terms_of applies the whole-token numeric TREC-id peel — the first
        # token of an id-less line is a SEARCH TERM and must stay in the
        # postings prune / idf probe (round-1 confirmed bug: [1:] dropped it).
        qterms = terms_of(lines)
        run = search(index, q, k=k, stats=s, qterms=qterms,
                     local_dict=local_dict)
        run.write.mode("append").parquet(output_path)

    writer = query_lines.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

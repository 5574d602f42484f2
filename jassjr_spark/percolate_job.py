"""spark-submit entry point: percolation (saved-search alerting).

    # continuous: watch a directory of document parquet, append alerts
    spark-submit --py-files jassjr_spark.zip jassjr_spark/percolate_job.py \
        --stored /alerts/registry.parquet \
        --docs /ingest/documents \
        --output /alerts/feed --checkpoint /alerts/_ck

    # one-shot: percolate an existing document table and exit
    ... --batch

``--stored`` is a parquet table (query_id, term[, negated]) — the
registered conjunctive queries, optional suppression terms. The
continuous mode uses Structured Streaming with ``availableNow`` unless
``--follow`` keeps it running; alerts append as (docid, query_id)
parquet. The registry is materialized once at start (see
operators/percolate.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stored", required=True,
                    help="parquet registry: query_id, term[, negated]")
    ap.add_argument("--docs", required=True,
                    help="documents parquet path (watched dir in stream mode)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", help="required unless --batch")
    ap.add_argument("--batch", action="store_true",
                    help="one-shot over the current table, no streaming")
    ap.add_argument("--follow", action="store_true",
                    help="keep the stream running (default: availableNow)")
    args = ap.parse_args()

    from jassjr_spark.operators.percolate import (
        percolate,
        start_percolate_stream,
    )
    from jassjr_spark.session import get_spark

    spark = get_spark("jassjr_percolate")
    stored = spark.read.parquet(args.stored)

    if args.batch:
        percolate(spark.read.parquet(args.docs), stored) \
            .write.mode("append").parquet(args.output)
        hits = spark.read.parquet(args.output).count()
        print(f"percolated: {hits} alerts in {args.output}")
        return

    if not args.checkpoint:
        ap.error("--checkpoint is required in streaming mode")
    schema = spark.read.parquet(args.docs).schema
    stream = spark.readStream.schema(schema).parquet(args.docs)
    q = start_percolate_stream(
        spark, stream, stored, args.output, args.checkpoint,
        trigger_available_now=not args.follow,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()

"""spark-submit entry point: training-data curation pipeline.

    # one-shot: curate a document table into a deduped, decontaminated,
    # quality-gated, redacted export with a stage funnel report
    spark-submit --py-files jassjr_spark.zip jassjr_spark/pipeline_job.py \
        --input  /corpus/documents.parquet \
        --output /exports/run1 \
        [--benchmark /eval/benchmark.parquet] \
        [--min-tokens 20] [--min-stopword-ratio 0.02] \
        [--min-distinct-ratio 0.35] \
        [--mix-by lang] [--shard-cap 200000] [--report]

    # continuous: dedup a watched ingest directory against a persisted
    # fingerprint store (duplicates reported, survivors exported, store
    # grows with every admitted batch)
    ... --stream --store /state/fp_store --checkpoint /state/_ck

Input tables need (docid long, content string); ``--mix-by`` additionally
reads that column for the mixing-weight table. Batch mode writes:

    {output}/documents/   curated (docid, clean content) parquet,
                          sharded by --shard-cap tokens when given
    {output}/report.json  stage funnel + optional mixing weights

Stream mode appends {output}/dups and {output}/documents per batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark",
                    help="parquet of benchmark docs to decontaminate against")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.02)
    ap.add_argument("--min-distinct-ratio", type=float, default=0.35)
    ap.add_argument("--mix-by",
                    help="domain column for the mixing-weight table")
    ap.add_argument("--shard-cap", type=int,
                    help="pack exports into ~N-token shards")
    ap.add_argument("--report", action="store_true",
                    help="also compute the per-stage survivor funnel")
    ap.add_argument("--stream", action="store_true",
                    help="streaming dedup mode (requires --store)")
    ap.add_argument("--store", help="fingerprint store path (stream mode)")
    ap.add_argument("--checkpoint", help="required with --stream")
    ap.add_argument("--follow", action="store_true",
                    help="keep the stream running (default: availableNow)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jassjr_spark.session import get_spark

    spark = get_spark("jassjr_pipeline")

    if args.stream:
        if not (args.store and args.checkpoint):
            ap.error("--stream requires --store and --checkpoint")
        from jassjr_spark.streaming.dedup_stream import start_dedup_stream

        docs = spark.readStream.schema("docid long, content string").parquet(
            args.input
        )
        q = start_dedup_stream(
            spark, docs, args.store,
            f"{args.output}/dups", args.checkpoint,
            survivors_path=f"{args.output}/documents",
            trigger_available_now=not args.follow,
        )
        q.awaitTermination()
        return

    from jassjr_spark.operators.textstats import token_counts
    from jassjr_spark.plans.data_pipeline import (
        QualityGates,
        curate,
        curate_report,
        mix_weights,
        pack_shards,
    )

    docs = spark.read.parquet(args.input)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    gates = QualityGates(
        min_tokens=args.min_tokens,
        min_stopword_ratio=args.min_stopword_ratio,
        min_distinct_ratio=args.min_distinct_ratio,
    )
    curated = curate(docs.select("docid", "content"), benchmark, gates)

    report: dict = {}
    if args.report:
        report["funnel"] = curate_report(
            docs.select("docid", "content"), benchmark, gates
        )
    if args.mix_by:
        report["mix_weights"] = [
            r.asDict()
            for r in mix_weights(
                docs.select(F.col(args.mix_by), "content"),
                domain_col=args.mix_by,
            ).collect()
        ]

    out_docs = f"{args.output}/documents"
    if args.shard_cap:
        sized = curated.join(
            token_counts(curated).select("docid", "n_tokens"), "docid"
        )
        packed = pack_shards(sized, "n_tokens", ["docid"], args.shard_cap)
        packed.drop("n_tokens").write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(out_docs)
    else:
        curated.write.mode("overwrite").parquet(out_docs)

    n_out = spark.read.parquet(out_docs).count()
    report["rows_out"] = n_out
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/report.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"rows_out": n_out, "output": args.output}))


if __name__ == "__main__":
    main()

"""spark-submit entry point: build a persisted index.

    spark-submit --py-files jassjr_spark.zip jassjr_spark/index_job.py \
        --input /data/corpus.xml            # TREC XML file/dir, or
        --input-parquet /data/documents     # (docno, content) or input_hint shape
        --output /indexes/corpus \
        [--buckets 32] [--block-span 1024] [--no-docno-term]

Prints the reference-compatible progress lines ("<n> documents indexed",
"Indexed <N> documents. Serialising..." — JASSjr_index.py:40-41,79) so
existing tooling that scrapes indexer stdout keeps working.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running as a bare script (spark-submit --py-files puts the package
# on the path already; this covers `python jassjr_spark/index_job.py`)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="TREC-XML file or directory")
    ap.add_argument("--input-parquet", help="parquet documents table")
    ap.add_argument("--input-jsonl",
                    help="JSONL documents dir/file with (docno, content) "
                         "objects; malformed lines are counted and skipped")
    ap.add_argument("--output")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--block-span", type=int, default=1024)
    ap.add_argument("--no-docno-term", action="store_true",
                    help="do not index the DOCNO token (non-TREC semantics)")
    ap.add_argument("--impact", action="store_true",
                    help="also build impact-ordered segments (SAAT path)")
    ap.add_argument("--fsck", metavar="INDEX_PATH",
                    help="audit an existing index's cross-table invariants "
                         "and exit (no build; --output ignored)")
    args = ap.parse_args()

    if args.fsck:
        from jassjr_spark.session import get_spark
        from jassjr_spark.sources.index_store import fsck_index

        spark = get_spark("jassjr_fsck")
        report = fsck_index(spark, args.fsck)
        for r in report:
            print(f"{'ok ' if r['ok'] else 'BAD'} {r['check']:18s} {r['detail']}")
        bad = [r for r in report if not r["ok"]]
        print(f"fsck: {len(report) - len(bad)}/{len(report)} checks passed")
        sys.exit(1 if bad else 0)

    from jassjr_spark.plans.build_job import build_persisted_index
    from jassjr_spark.session import get_spark
    from jassjr_spark.sources.trec import read_trec

    spark = get_spark("jassjr_index")
    if args.input:
        docs = read_trec(spark, args.input)
        order_cols = None
    elif args.input_parquet:
        docs = spark.read.parquet(args.input_parquet)
        if "docid" not in docs.columns:
            if "repo" in docs.columns:  # BASELINE.json input_hint shape
                docs = docs.select(
                    F.concat_ws("-", "repo", "path", "commit").alias("docno"),
                    F.col("content"),
                    "repo", "path", "commit",
                )
                order_cols = ["repo", "path", "commit"]
            else:
                order_cols = ["docno"]
        else:
            order_cols = None
    elif args.input_jsonl:
        from pyspark.sql import types as T

        from jassjr_spark.sources.jsonl import read_jsonl_docs

        schema = T.StructType([
            T.StructField("docno", T.StringType()),
            T.StructField("content", T.StringType()),
        ])
        parsed, bad = read_jsonl_docs(spark, args.input_jsonl, schema=schema)
        # a well-formed JSON object can still be missing docno/content
        # ({} or wrong keys parses to an all-NULL row); those must not
        # reach the build as NULL-docno documents — count and drop them
        # under the same skipped-lines contract as unparseable lines.
        # The build makes several passes over docs (count, docid staging,
        # postings); caching the PARSED rows (pre-filter) means the JSONL
        # text is scanned and JSON-parsed exactly once for all of them
        # AND for the incomplete-row count — no second text scan. The
        # quarantine count is one additional text scan, unavoidable
        # without materializing rejects.
        incomplete = F.col("docno").isNull() | F.col("content").isNull()
        parsed = parsed.cache()
        docs = parsed.filter(~incomplete)
        n_bad = bad.count()
        n_incomplete = parsed.filter(incomplete).count()
        if n_bad or n_incomplete:
            print(f"{n_bad} malformed lines skipped; "
                  f"{n_incomplete} parsed lines missing docno/content "
                  "skipped", file=sys.stderr)
        order_cols = ["docno"]
    else:
        ap.error("one of --input / --input-parquet / --input-jsonl "
                 "is required")
    if not args.output:
        ap.error("--output is required when building")

    n = docs.count()
    for i in range(0, n, 1000):
        print(f"{i} documents indexed")
    report = build_persisted_index(
        spark, docs, args.output,
        order_cols=order_cols,
        prepend_docno=not args.no_docno_term,
        n_buckets=args.buckets, block_span=args.block_span,
        include_impact=args.impact,
    )
    print(f"Indexed {n} documents. Serialising...")
    print(f"stages executed={report.executed} skipped={report.skipped} "
          f"fingerprint={report.fingerprint}")
    print(f"master={spark.sparkContext.master}")


if __name__ == "__main__":
    main()

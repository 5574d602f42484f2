"""One scaling measurement: run the index build and/or the query workload
at a given parallelism on a given corpus; print one JSON line.

Run in a FRESH process per parallelism level (a JVM's master is fixed at
session creation):

    python BENCH/scaling_job.py --cores 8 --corpus /tmp/corpus.parquet \
        --iters 3 --mode both

Timing discipline mirrors tools/benchmark.sh of the reference (1 warmup,
median of N) but excludes JVM/session startup — the quantity under test is
job throughput, which is what scales with executors.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--mode",
                    choices=["index", "search", "both", "grep", "percolate"],
                    default="both")
    ap.add_argument("--master", default=None,
                    help="override the master URL (e.g. "
                         "local-cluster[4,4,8192] for multi-JVM executors "
                         "— VERDICT r5 Next #5; --cores must still name "
                         "the TOTAL core count for repartition sizing)")
    args = ap.parse_args()

    from jassjr_spark.fixtures import synth_queries
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import parse_queries, search
    from jassjr_spark.session import get_spark

    if args.master and args.master.startswith("local-cluster"):
        # multi-JVM executors: real serde + shuffle transport + per-
        # executor memory limits. Worker memory rides in the master
        # string; executor Python workers need the repo on their path.
        from pyspark.sql import SparkSession

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        mem_mb = args.master.rstrip("]").rsplit(",", 1)[-1]
        spark = (
            SparkSession.builder.appName(f"scaling_lc_{args.cores}")
            .master(args.master)
            .config("spark.executor.memory", f"{mem_mb}m")
            .config("spark.executorEnv.PYTHONPATH", repo)
            .config("spark.sql.shuffle.partitions", str(args.cores))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "24g"))
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark(
            f"scaling_{args.cores}",
            master=args.master or f"local[{args.cores}]",
            shuffle_partitions=args.cores,
        )
    # A ~100 MB corpus coalesces into very few scan partitions
    # (spark.sql.files.maxPartitionBytes), which would starve 32 cores and
    # corrupt the scaling measurement; 2 partitions/core is the standard
    # cluster sizing for a CPU-bound map stage.
    docs = spark.read.parquet(args.corpus).repartition(args.cores * 2)
    n_docs = docs.count()
    docs = docs.cache()
    docs.count()  # warm the cache so we measure compute, not disk

    out = {"cores": args.cores, "n_docs": n_docs}

    def median_time(fn, iters):
        fn()  # warmup
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    if args.mode in ("index", "both"):
        # One action materializing the postings artifact — the dominant
        # cost. In the persisted build (plans/build_job.py) dictionary /
        # lengths / stats are downstream aggregations of the postings
        # already on disk, so timing them here would double-count the
        # tokenizer.
        def build():
            idx = build_index(docs)
            idx.postings.write.mode("overwrite").format("noop").save()

        t = median_time(build, args.iters)
        out["index_sec"] = round(t, 3)
        out["index_docs_per_sec"] = round(n_docs / t, 1)

    if args.mode in ("search", "both"):
        idx = build_index(docs).cache()
        stats = idx.scalar_stats()
        lines = synth_queries(args.queries)
        q = parse_queries(spark, lines)
        qterms = sorted(
            {t for ln in lines for t in ln.split()[1:] or ln.split()}
        )

        def run_search():
            search(idx, q, k=1000, stats=stats, qterms=qterms).count()

        t = median_time(run_search, args.iters)
        out["search_sec"] = round(t, 3)
        out["queries_per_sec"] = round(args.queries / t, 2)

    if args.mode == "grep":
        # trigram-prefiltered substring search: index once (cached — the
        # persisted-store analogue), then time candidate+verify for a
        # mixed needle set (selective multi-word + hot single-token)
        from jassjr_spark.operators.grep import (
            build_trigram_index,
            grep_many,
            trigram_df,
        )

        tri = build_trigram_index(docs).cache()
        tri.count()
        dfs = {r.gram: r.df for r in trigram_df(tri).collect()}
        needles = ["shuffle postings", "varbyte wand", "checkpoint",
                   "index", "couch-2-5k"]

        def run_grep():
            # batched: all needles in ONE plan (grep_many) — per-needle
            # sequential jobs measured 0.54 efficiency 4->16 from pure
            # job-scheduling overhead
            grep_many(docs, needles, index=tri, gram_dfs=dfs).count()

        t = median_time(run_grep, args.iters)
        out["grep_sec"] = round(t, 3)
        out["grep_needles_per_sec"] = round(len(needles) / t, 2)

    if args.mode == "percolate":
        # alerting throughput: a 200-query conjunctive registry matched
        # against the whole corpus batch — the per-micro-batch work of
        # start_percolate_stream, measured at batch size = corpus
        from jassjr_spark.operators.percolate import percolate

        lines = synth_queries(200)
        stored_rows = [
            (qid, t)
            for qid, ln in enumerate(lines)
            for t in (ln.split()[1:] if ln.split()[0].isnumeric()
                      else ln.split())
        ]
        stored = spark.createDataFrame(
            stored_rows, "query_id long, term string"
        )
        dd = docs.selectExpr("docid", "cast(docid as string) as docno",
                             "content")

        def run_percolate():
            percolate(dd, stored).count()

        t = median_time(run_percolate, args.iters)
        out["percolate_sec"] = round(t, 3)
        out["percolate_docs_per_sec"] = round(n_docs / t, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

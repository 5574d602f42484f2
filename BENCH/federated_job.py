"""Scatter-gather overhead measurement: the SAME query batch against one
index over a corpus vs N shard indexes federated at query time
(operators/federated.py). Prints one JSON line.

    python BENCH/federated_job.py --corpus /tmp/corpus.parquet \
        --cores 16 --shards 4 --queries 20 --iters 3

Timing includes the per-call globalization probes (stats sum + one
union-job df probe) — the price a live multi-shard deployment actually
pays per batch.
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
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jassjr_spark.fixtures import synth_queries
    from jassjr_spark.operators.federated import federated_search
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import search
    from jassjr_spark.session import get_spark

    spark = get_spark(
        "federated_bench", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    docs = spark.read.parquet(args.corpus).repartition(args.cores * 2).cache()
    n_docs = docs.count()

    single = build_index(docs, prepend_docno=False).cache()
    single.postings.count()
    shards = [
        build_index(
            docs.filter(F.col("docid") % args.shards == m),
            prepend_docno=False,
        ).cache()
        for m in range(args.shards)
    ]
    for sh in shards:
        sh.postings.count()

    lines = synth_queries(args.queries)
    qrows = [
        (qid, pos, t)
        for qid, line in enumerate(lines)
        for pos, t in enumerate(line.split())
    ]
    queries = spark.createDataFrame(qrows, "query_id long, pos int, term string")

    def median_time(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    t_single = median_time(lambda: search(single, queries, k=args.k).count())
    t_fed = median_time(
        lambda: federated_search(shards, queries, k=args.k).count()
    )

    # sanity: identical hit sets (the rank-identity contract)
    a = {(r.query_id, r.docno)
         for r in search(single, queries, k=args.k).collect()}
    b = {(r.query_id, r.docno)
         for r in federated_search(shards, queries, k=args.k).collect()}

    print(json.dumps({
        "cores": args.cores, "n_docs": n_docs, "shards": args.shards,
        "n_queries": args.queries, "k": args.k,
        "single_sec": round(t_single, 3),
        "federated_sec": round(t_fed, 3),
        "overhead_x": round(t_fed / t_single, 3),
        "hitsets_identical": a == b,
    }))


if __name__ == "__main__":
    main()

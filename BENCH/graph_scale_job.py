"""Graph-op scaling measurement: PageRank and connected components on a
synthetic power-law-ish graph at a given parallelism; one JSON line out.

Run in a FRESH process per parallelism level (the JVM master is fixed at
session creation):

    python BENCH/graph_scale_job.py --cores 8 --nodes 2000000 --iters 3

Graph: each node u gets 3 deterministic out-edges ((a*u+c) mod N for three
mixing constants), so degree is regular out but skewed in — enough hub
contention to exercise the groupBy without manufacturing a pathological
key. PageRank times the full 5-iteration lazy plan through a noop sink;
CC runs its own per-round actions (that IS the operator's shape).
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
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--mode", choices=["pagerank", "cc", "both"],
                    default="both")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jassjr_spark.operators.graph import connected_components, pagerank
    from jassjr_spark.session import get_spark

    spark = get_spark(
        f"graph_scaling_{args.cores}", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    n = args.nodes
    base = spark.range(n).withColumnRenamed("id", "src")
    edges = None
    for a, c in ((7, 1), (13, 5), (101, 17)):
        e = base.select("src", ((F.col("src") * a + c) % n).alias("dst"))
        edges = e if edges is None else edges.unionByName(e)
    edges = edges.repartition(args.cores * 2).cache()
    n_edges = edges.count()  # warm cache: measure compute, not synth

    out = {"cores": args.cores, "nodes": n, "edges": n_edges}

    def median_time(fn, iters):
        fn()  # warmup
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    if args.mode in ("pagerank", "both"):
        def run_pr():
            pagerank(edges, n_iter=5).write.mode("overwrite").format(
                "noop").save()

        t = median_time(run_pr, args.iters)
        out["pagerank_sec"] = round(t, 3)
        out["pagerank_edge_iters_per_sec"] = round(n_edges * 5 / t, 1)

    if args.mode in ("cc", "both"):
        def run_cc():
            connected_components(edges).write.mode("overwrite").format(
                "noop").save()

        t = median_time(run_cc, args.iters)
        out["cc_sec"] = round(t, 3)
        out["cc_edges_per_sec"] = round(n_edges / t, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

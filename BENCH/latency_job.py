"""Query latency distribution: p50/p99 at k=10 and k=1000.

Two regimes, both reported (the reference REPL is a single-query loop;
Spark's unit of efficiency is the batch):

* single  — one search() call per query line, wall time per call
            (includes Spark job scheduling: this is the interactive
            lower bound, dominated by fixed job overhead);
* batch   — one search() call for all Q queries; per-query latency =
            wall / Q (the throughput regime the engine is designed for).

    python BENCH/latency_job.py --corpus /tmp/jassjr_bench_corpus_600000.parquet \
        --cores 32 --queries 50
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(xs, p):
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(p / 100 * (len(xs) - 1)))))
    return xs[i]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--queries", type=int, default=50)
    args = ap.parse_args()

    from jassjr_spark.fixtures import synth_queries
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import (
        InteractiveSearcher, local_dictionary, parse_queries, search, terms_of,
    )
    from jassjr_spark.session import get_spark

    spark = get_spark(
        f"latency{args.cores}", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    docs = spark.read.parquet(args.corpus).repartition(args.cores * 2).cache()
    n_docs = docs.count()
    idx = build_index(docs).cache()
    stats = idx.scalar_stats()
    idx.postings.count()  # warm cache
    ld = local_dictionary(idx)  # interactive config: no per-call probe job
    lines = synth_queries(args.queries)

    out = {"cores": args.cores, "n_docs": n_docs, "n_queries": len(lines)}
    for k in (10, 1000):
        # warmup
        q0 = parse_queries(spark, lines[:1])
        search(idx, q0, k=k, stats=stats,
               qterms=terms_of(lines[:1])).count()
        singles = []
        for line in lines:
            qterms = terms_of([line])
            q = parse_queries(spark, [line])
            t0 = time.perf_counter()
            search(idx, q, k=k, stats=stats, qterms=qterms,
                   local_dict=ld).count()
            singles.append(time.perf_counter() - t0)
        qall = parse_queries(spark, lines)
        allterms = terms_of(lines)
        t0 = time.perf_counter()
        search(idx, qall, k=k, stats=stats, qterms=allterms).count()
        batch_wall = time.perf_counter() - t0
        # interactive regime: driver-side dict+docno snapshots, one Spark
        # action per query line (operators/search.py InteractiveSearcher).
        # Pass 1 is COLD (each new term's posting list is collected once);
        # pass 2 is CACHED — the driver-local numpy fast path, zero Spark
        # jobs per query (the reference's 80 ms single-query regime).
        # this synthetic corpus is ~480 terms ALL stopword-class (df up
        # to 0.9N): a query's lists alone are millions of entries, so the
        # budget is sized to hold the full workload's lists (~1 GB driver
        # memory at 600k docs) — the "snapshot-sized index" regime the
        # fast path targets; real Zipf text needs far less
        it = InteractiveSearcher(idx, stats=stats,
                                 local_postings_budget=40_000_000,
                                 warm_ahead=False)
        it.search_line(lines[0], k=k)  # warmup
        inter, cached, n_local = [], [], 0
        for line in lines:
            t0 = time.perf_counter()
            it.search_line(line, k=k)
            inter.append(time.perf_counter() - t0)
        for line in lines:
            t0 = time.perf_counter()
            it.search_line(line, k=k)
            cached.append(time.perf_counter() - t0)
            n_local += it.last_path == "local"
        # warm-ahead regime: construction prefetches the heaviest lists
        # (one Arrow job), so FIRST-sighting queries hit the numpy path —
        # the r4 cold regime (329 ms p50 / 1.86 s p99) measured exactly
        # this first fetch
        t0 = time.perf_counter()
        itw = InteractiveSearcher(idx, stats=stats,
                                  local_postings_budget=40_000_000)
        warm_build_s = time.perf_counter() - t0
        warm, n_warm_local = [], 0
        for line in lines:
            t0 = time.perf_counter()
            itw.search_line(line, k=k)
            warm.append(time.perf_counter() - t0)
            n_warm_local += itw.last_path == "local"
        itw.close()
        out[f"k{k}"] = {
            "single_p50_ms": round(pct(singles, 50) * 1000, 1),
            "single_p99_ms": round(pct(singles, 99) * 1000, 1),
            # batch-amortized figure for the warm resident regime: the
            # reference's own batch mode also answers queries serially
            # from startup-loaded state (JASSjr_search.py reads the whole
            # index before the first query; its reported per-query number
            # excludes that load, as warm_build_s is excluded here)
            "warm_batch_per_query_ms": round(
                sum(warm) / len(warm) * 1000, 2),
            "interactive_p50_ms": round(pct(inter, 50) * 1000, 1),
            "interactive_p99_ms": round(pct(inter, 99) * 1000, 1),
            "interactive_warm_p50_ms": round(pct(warm, 50) * 1000, 2),
            "interactive_warm_p99_ms": round(pct(warm, 99) * 1000, 2),
            "warm_local_fraction": round(n_warm_local / len(lines), 3),
            "warm_build_s": round(warm_build_s, 2),
            "warmed_terms": itw.warmed_terms,
            "interactive_cached_p50_ms": round(pct(cached, 50) * 1000, 2),
            "interactive_cached_p99_ms": round(pct(cached, 99) * 1000, 2),
            "cached_local_fraction": round(n_local / len(lines), 3),
            "batch_total_s": round(batch_wall, 3),
            "batch_per_query_ms": round(batch_wall / len(lines) * 1000, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

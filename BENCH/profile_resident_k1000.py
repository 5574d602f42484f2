"""Profile the resident interactive kernel at the reference's corpus
scale (173k docs, Zipf text, k=1000) — finds where the 9.5 ms/query goes.

    python BENCH/profile_resident_k1000.py [--docs 173000]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from suite600k_job import ensure_zipf_corpus, zipf_queries  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=173_000)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--index-dir", default="/tmp/jassjr_prof173_index")
    args = ap.parse_args()

    from jassjr_spark.operators.search import InteractiveSearcher
    from jassjr_spark.plans.build_job import build_persisted_index, load_persisted
    from jassjr_spark.session import get_spark

    corpus = f"/tmp/jassjr_bench_zipf_{args.docs}.parquet"
    ensure_zipf_corpus(corpus, args.docs)
    spark = get_spark("prof173", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(corpus).repartition(64).cache()
    docs.count()
    if not os.path.exists(f"{args.index_dir}/_meta"):
        build_persisted_index(spark, docs, args.index_dir, block_span=256)
    idx, _ = load_persisted(spark, args.index_dir)
    idx = idx.cache()
    s = idx.scalar_stats()
    idx.postings.count()

    t0 = time.perf_counter()
    it = InteractiveSearcher(idx, stats=s, local_postings_budget=64_000_000)
    print("warm", round(time.perf_counter() - t0, 1), "s; resident", it.resident)
    lines = zipf_queries(args.queries)
    it.search_line(lines[0], k=1000)

    for k in (10, 1000):
        ts = []
        for ln in lines:
            t0 = time.perf_counter()
            it.search_line(ln, k=k)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"k={k}: mean {sum(ts)/len(ts)*1000:.2f} ms  "
              f"p50 {ts[len(ts)//2]*1000:.2f} ms")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(5):
        for ln in lines:
            it.search_line(ln, k=1000)
    pr.disable()
    buf = io.StringIO()
    pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(25)
    print(buf.getvalue())


if __name__ == "__main__":
    main()

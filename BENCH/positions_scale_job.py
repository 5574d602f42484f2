"""Positional-store scaling measurement: build the term-bucketed
positions store over a corpus and probe it with phrase/span queries at a
given parallelism. Run in a FRESH process per level:

    python BENCH/positions_scale_job.py --cores 4 \
        --corpus /tmp/jassjr_bench_corpus_600000.parquet

The store build (tokenize + per-(term,doc) groupBy + bucketed write) is
the index-time cost; the probes (pruned bucket scan -> position-list
joins -> BM25 rank) are the per-query cost a phrase workload pays
forever. Both are timed; probes as median of --iters.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ("phrase2", ["varbyte", "arrow"], None, None),
    ("span2_s3", ["varbyte", "arrow"], None, 3),
    ("span2_s8", ["lineage", "query-plan"], None, 8),
    ("span3_s8", ["sym0010", "sym0020", "sym0030"], None, 8),
    ("prox2_w5", ["varbyte", "arrow"], 5, None),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jassjr_spark.operators.positional import phrase_search
    from jassjr_spark.session import get_spark
    from jassjr_spark.sources.index_store import (
        pruned_positions, write_positions_store,
    )
    from jassjr_spark.operators.positional import build_positions

    spark = get_spark(
        f"pos_scaling_{args.cores}", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    docs = (
        spark.read.parquet(args.corpus)
        .select("docid", "content")
        .repartition(args.cores * 2)
        .cache()
    )
    n_docs = docs.count()
    out = {"cores": args.cores, "n_docs": n_docs}

    store = f"/tmp/jassjr_pos_scale_store_{args.cores}"
    shutil.rmtree(store, ignore_errors=True)
    t0 = time.perf_counter()
    write_positions_store(build_positions(docs), store)
    out["store_build_s"] = round(time.perf_counter() - t0, 3)

    # doc lengths + stats are index-time artifacts: setup, not probe cost
    from jassjr_spark.constants import TOKEN_RE
    dl = docs.select(
        "docid",
        F.size(F.regexp_extract_all(F.lower("content"),
                                    F.lit(TOKEN_RE), 0)).alias("len"),
    ).cache()
    row = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("len").alias("a")).first()
    stats = {"n_docs": row.n, "avgdl": row.a}
    docs.unpersist()

    probes = {}
    rows_out = {}
    for name, terms, window, slop in QUERIES:
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            n = phrase_search(
                pruned_positions(spark, store, terms), dl,
                [(1, terms)], k=10, stats=stats, window=window, slop=slop,
            ).count()
            times.append(time.perf_counter() - t0)
        probes[name] = round(statistics.median(times), 3)
        rows_out[name] = n
    out["probe_median_s"] = {k: v for k, v in probes.items()}
    out["probe_total_s"] = round(sum(probes.values()), 3)
    out["probe_rows"] = rows_out
    shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

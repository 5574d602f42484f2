"""Fingerprint-store scaling measurement: probe a new-crawl batch against
a persisted corpus fingerprint store at a given parallelism.

Run in a FRESH process per parallelism level:

    python BENCH/fp_scale_job.py --cores 4 --corpus /tmp/..._600000.parquet

Setup (store write over the even-docid half) happens once per corpus and
is reported separately; the timed operation is the incremental-dedup
probe of a batch (deterministic slice of odd docids, default 30k = a 5%
crawl increment) — the per-batch cost a crawl pipeline pays forever.
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
    ap.add_argument("--batch-docs", type=int, default=30_000)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jassjr_spark.session import get_spark
    from jassjr_spark.sources.fingerprint_store import (
        dedup_against_store,
        write_fingerprint_store,
    )

    spark = get_spark(
        f"fp_scaling_{args.cores}", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    docs = (
        spark.read.parquet(args.corpus)
        .repartition(args.cores * 2)
        .cache()
    )
    n_docs = docs.count()

    store = args.corpus.rstrip("/") + f".fp_store"
    out = {"cores": args.cores, "n_docs": n_docs,
           "batch_docs": args.batch_docs}
    if not os.path.exists(store):
        t0 = time.perf_counter()
        write_fingerprint_store(
            docs.filter(F.col("docid") % 2 == 0), store
        )
        out["store_write_sec"] = round(time.perf_counter() - t0, 3)

    batch = (
        docs.filter(
            (F.col("docid") % 2 == 1)
            & (F.col("docid") < 2 * args.batch_docs)
        )
        .cache()
    )
    batch.count()

    def probe() -> int:
        return dedup_against_store(
            batch, spark, store, est_threshold=0.5
        ).count()

    n_hits = probe()  # warmup
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        probe()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    out["probe_sec"] = round(med, 3)
    out["probe_docs_per_sec"] = round(args.batch_docs / med, 1)
    out["n_hits"] = n_hits
    print(json.dumps(out))


if __name__ == "__main__":
    main()

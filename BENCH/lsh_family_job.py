"""A/B the two MinHash-LSH hash families at scale: ``md5`` (the
cross-engine-oracled default — 16 md5s per shingle, 32-char hex
registers) vs ``xxhash64`` (the Spark-only fast path — one seeded
xxhash64 per register, 8-byte longs, ~4x smaller shuffle payload).

Interleaved repeats (each family inside every repeat round, so host
drift hits both legs equally); per-family MEDIAN and MIN recorded.
Quality is checked semantically, not bit-wise: the two families draw
different random hash functions so their CANDIDATE sets legitimately
differ, but after Jaccard verification (ngram_jaccard_pairs over each
candidate set) the VERIFIED near-dup pairs should agree — the job
records both verified sets' agreement (skipped above --verify-max docs,
where the shingle re-join for verification dwarfs the timing legs).

    python BENCH/lsh_family_job.py [--docs 600000] [--cores 16]
        [--repeats 3] [--threshold 0.5] [--out lsh_family_600k.json]
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
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--verify-max", type=int, default=1_000_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    import run_scaling

    run_scaling.CORPUS = f"/tmp/jassjr_bench_corpus_{args.docs}.parquet"
    run_scaling.ensure_corpus(args.docs)

    from pyspark.sql import SparkSession

    from jassjr_spark.operators.dedup import (
        lsh_candidate_pairs, ngram_jaccard_pairs,
    )

    spark = (
        SparkSession.builder.appName(f"lsh_family_{args.docs}")
        .master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(run_scaling.CORPUS)  # uncached: scan path

    out: dict = {
        "n_docs": args.docs,
        "cores": args.cores,
        "repeats": args.repeats,
        "host_load_1m_at_start": round(os.getloadavg()[0], 2),
        "families": {},
    }
    walls: dict[str, list] = {"md5": [], "xxhash64": []}
    pairs_n: dict[str, int] = {}
    for _ in range(args.repeats):
        for fam in ("md5", "xxhash64"):
            t0 = time.perf_counter()
            pairs_n[fam] = lsh_candidate_pairs(docs, hash_family=fam).count()
            walls[fam].append(time.perf_counter() - t0)
    for fam in ("md5", "xxhash64"):
        out["families"][fam] = {
            "median_s": round(statistics.median(walls[fam]), 2),
            "min_s": round(min(walls[fam]), 2),
            "runs_s": [round(w, 2) for w in walls[fam]],
            "candidate_pairs": pairs_n[fam],
        }
    out["speedup_median"] = round(
        out["families"]["md5"]["median_s"]
        / out["families"]["xxhash64"]["median_s"], 2,
    )

    if args.docs <= args.verify_max:
        verified = {}
        for fam in ("md5", "xxhash64"):
            cands = lsh_candidate_pairs(docs, hash_family=fam)
            verified[fam] = {
                (r.docid_a, r.docid_b)
                for r in ngram_jaccard_pairs(
                    docs, threshold=args.threshold, candidates=cands
                ).collect()
            }
        both = verified["md5"] & verified["xxhash64"]
        union = verified["md5"] | verified["xxhash64"]
        out["verified"] = {
            "threshold": args.threshold,
            "md5_pairs": len(verified["md5"]),
            "xxhash64_pairs": len(verified["xxhash64"]),
            "agreement": round(len(both) / max(len(union), 1), 4),
        }

    out["host_load_1m_at_end"] = round(os.getloadavg()[0], 2)
    out["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out_name = args.out or f"lsh_family_{args.docs}.json"
    with open(os.path.join(here, out_name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

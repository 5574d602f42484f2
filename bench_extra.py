"""Round-6 auxiliary benchmarks (bench.py is FROZEN for driver
measurement, so everything beyond its 11 rows lives here — guide §1.4).

Three row families, one JSON line out:

* ``noop``    — each headline query isolated through the no-op sink
                (``df.write.format("noop")``), timing the computation
                without collect/count shortcuts (guide §1.4).
* ``bm25_top10_distributed`` / ``bm25_top1000_distributed`` — the
  r4-comparable DISTRIBUTED batch-BM25 plan (q_ft_bm25_top10), so
  round-over-round tables never again compare the gated driver-local
  path against the distributed one under the same label (VERDICT r5
  What's-wrong #1 / Next #2).
* ``dedup_minhash_pairs_xxhash`` — the fast Spark-only LSH family
  (8-byte registers, xxhash64 band keys) next to the md5-oracled
  default, per VERDICT r5 Next #3.

Same contract as bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS,
median + min over ITERS iterations after a warmup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jassjr_spark import driver_queries as dq
from jassjr_spark.operators import dedup
from jassjr_spark.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ITERS = max(5, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5")))


def main() -> None:
    load_at_start = round(os.getloadavg()[0], 2)
    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = dq.load_documents(spark, SF_DIR)
    n_docs = docs.count()
    dq.q_ft_bm25_top10(spark, SF_DIR, k=1).collect()          # warm session
    dq.q_ft_bm25_wand_adaptive(spark, SF_DIR, k=1).collect()  # warm blocks
    dq.q_code_grep_persisted(spark, SF_DIR).count()           # warm store

    queries: dict[str, float] = {}
    queries_min: dict[str, float] = {}

    def run(name, fn):
        secs = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn()
            secs.append(time.perf_counter() - t0)
        secs.sort()
        queries[name] = round(statistics.median(secs), 4)
        queries_min[name] = round(secs[0], 4)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext

    # --- the r4-comparable distributed batch plan (VERDICT r5 Next #2)
    sc.setJobDescription("bm25_top10_distributed")
    run("bm25_top10_distributed",
        lambda: dq.q_ft_bm25_top10(spark, SF_DIR, k=10).collect())
    sc.setJobDescription("bm25_top1000_distributed")
    run("bm25_top1000_distributed",
        lambda: dq.q_ft_bm25_top10(spark, SF_DIR, k=1000).collect())

    # --- the fast LSH family next to the md5-oracled default (Next #3)
    d = dq.load_documents(spark, SF_DIR).filter(
        F.col("docid") < dq.NEARDUP_MAX_DOCID
    )
    sc.setJobDescription("dedup_minhash_pairs_xxhash")
    run("dedup_minhash_pairs_xxhash",
        lambda: dedup.lsh_candidate_pairs(
            d, n=3, num_hashes=16, bands=4, hash_family="xxhash64"
        ).count())
    sc.setJobDescription("dedup_minhash_pairs_md5")
    run("dedup_minhash_pairs_md5",
        lambda: dq.q_dedup_minhash_pairs(spark, SF_DIR).count())

    # --- noop-sink isolation of the headline computations (guide §1.4)
    sc.setJobDescription("noop isolation")
    run("noop_bm25_wand_top10",
        lambda: noop(dq.q_ft_bm25_wand_adaptive(spark, SF_DIR, k=10)))
    run("noop_sim_cosine_top5", lambda: noop(dq.q_sim_cosine_top5(spark, SF_DIR)))
    run("noop_dedup_minhash_pairs",
        lambda: noop(dq.q_dedup_minhash_pairs(spark, SF_DIR)))
    run("noop_grep_indexed", lambda: noop(dq.q_code_grep_persisted(spark, SF_DIR)))
    run("noop_dedup_exact", lambda: noop(dq.q_dedup_exact(spark, SF_DIR)))
    run("noop_text_quality", lambda: noop(dq.q_text_quality(spark, SF_DIR)))
    sc.setJobDescription(None)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "jassjr_spark auxiliary suite (distributed bm25 + lsh family + noop isolation)",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": queries,
        "queries_min": queries_min,
        "iters": ITERS,
        "sf": float(sf),
        "n_docs": n_docs,
        "cpus": CPUS,
        "host_load_1m_at_start": load_at_start,
        "host_load_1m_at_end": round(os.getloadavg()[0], 2),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }))


if __name__ == "__main__":
    main()

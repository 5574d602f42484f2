"""100x-rehearsal: the full pipeline at 20M+ docs (10x the largest prior
sweep) on local[16] — index-build -> persisted store -> BM25 + WAND +
dedup — recording docs/s, peak JVM memory, shuffle bytes, per-stage
lineage durations, and any cliff (docid widths, vocab size vs the
driver-snapshot refusal bound, term-bucket skew).

Rationale (VERDICT r4 Next #4): the 2.4M-doc sweeps verify the plan
SHAPES; this run verifies nothing non-linear appears one decade up —
the regime where a 100 TB deployment's per-executor share lives
(20M docs / 16 threads ≈ 1.3M docs/thread ≈ a 1000-executor cluster's
per-core share of ~20B docs).

Fresh process; the Spark UI is enabled (this script only) so shuffle
bytes and peak executor memory come from the status REST API instead of
guesswork:

    SPARK_DRIVER_MEM=60g python BENCH/scale_20m_job.py \
        [--docs 20000000] [--cores 16] [--queries 50] [--out scale_20m.json]

The persisted build is checkpoint-resumable (plans/build_job.py), so a
crashed run re-executes only the failed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4049


def rest(app_path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def ui_metrics(app_id: str) -> dict:
    """Total shuffle read/write + input bytes across all stages, and the
    driver's peak JVM heap/off-heap (local mode: driver == executor)."""
    stages = rest(f"/{app_id}/stages")
    execs = rest(f"/{app_id}/executors")
    peak = {}
    for e in execs:
        for k, v in (e.get("peakMemoryMetrics") or {}).items():
            peak[k] = max(peak.get(k, 0), v)
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        "peak_jvm_heap_bytes": peak.get("JVMHeapMemory", 0),
        "peak_jvm_offheap_bytes": peak.get("JVMOffHeapMemory", 0),
        "peak_execution_mem_bytes": peak.get("OnHeapExecutionMemory", 0),
        "n_stages": len(stages),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--out", default="scale_20m.json")
    args = ap.parse_args()

    corpus = f"/tmp/jassjr_bench_corpus_{args.docs}.parquet"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import run_scaling

    run_scaling.CORPUS = corpus
    t0 = time.perf_counter()
    run_scaling.ensure_corpus(args.docs)  # deterministic, seeded per docid
    corpus_gen_s = round(time.perf_counter() - t0, 1)

    from pyspark.sql import SparkSession

    from jassjr_spark.fixtures import synth_queries
    from jassjr_spark.operators.dedup import dedup_exact, lsh_candidate_pairs
    from jassjr_spark.operators.search import parse_queries, search, terms_of
    from jassjr_spark.operators.wand import wand_search
    from jassjr_spark.plans.build_job import build_persisted_index, load_persisted

    spark = (
        SparkSession.builder.appName(f"scale20m_{args.cores}")
        .master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "60g"))
        .config("spark.ui.enabled", "true")  # metrics source for this job
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    docs = spark.read.parquet(corpus)  # deliberately NOT cached: a 100 TB
    # corpus never fits in memory, so the rehearsal measures the scan path
    n_docs = docs.count()
    out: dict = {
        "n_docs": n_docs,
        "cores": args.cores,
        "corpus_gen_s": corpus_gen_s,
        "host_load_1m_at_start": round(os.getloadavg()[0], 2),
    }

    # ---- build -> persist (resumable; per-stage timings land in _lineage)
    idx_path = f"/tmp/jassjr_idx_{args.docs}"
    t0 = time.perf_counter()
    report = build_persisted_index(spark, docs, idx_path)
    build_wall = time.perf_counter() - t0
    out["build"] = {
        "wall_s": round(build_wall, 1),
        "docs_per_sec": round(n_docs / build_wall, 1),
        "executed": report.executed,
        "skipped": report.skipped,
        "stage_s": {
            r.stage: r.duration_s
            for r in spark.read.parquet(f"{idx_path}/_lineage")
            .filter("status = 'ok'")
            .collect()
        },
    }

    idx, blocks = load_persisted(spark, idx_path)
    stats = idx.scalar_stats()
    out["index"] = {
        "n_docs": stats["n_docs"],
        "avgdl": round(stats["avgdl"], 3),
        "dictionary_terms": idx.dictionary.count(),
        "postings_rows": idx.postings.count(),
        "blocks_rows": blocks.count(),
        "max_docid": idx.doc_lengths.agg({"docid": "max"}).first()[0],
        "store_bytes": sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(idx_path)
            for f in fs
        ),
    }
    # cliff probe: term-bucket skew (a stopword bucket dwarfing the rest
    # would mean the bucketing does not hold at 1000x vocab)
    buckets = (
        spark.read.parquet(f"{idx_path}/_metrics")
        .filter("stage = 'postings' and partition_key like 'bucket=%'")
        .selectExpr("max(rows) as mx", "percentile(rows, 0.5) as med")
        .first()
    )
    if buckets and buckets.mx:
        out["index"]["bucket_rows_max_over_median"] = round(
            buckets.mx / max(buckets.med, 1), 2
        )
    # cliff probe: the driver dictionary snapshot must REFUSE this vocab
    from jassjr_spark.operators.search import local_dictionary

    out["index"]["local_dict_refused"] = local_dictionary(idx) is None

    # ---- query workloads over the PERSISTED index (store-read path)
    lines = synth_queries(args.queries)
    q = parse_queries(spark, lines)
    qterms = terms_of(lines)

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    search(idx, parse_queries(spark, lines[:2]), k=10, stats=stats,
           qterms=terms_of(lines[:2])).count()  # warm store footers
    t = timed(lambda: search(idx, q, k=10, stats=stats, qterms=qterms).count())
    out["bm25_top10"] = {
        "wall_s": round(t, 2),
        "per_query_ms": round(t / len(lines) * 1000, 1),
    }
    t = timed(lambda: search(idx, q, k=1000, stats=stats, qterms=qterms).count())
    out["bm25_top1000"] = {
        "wall_s": round(t, 2),
        "per_query_ms": round(t / len(lines) * 1000, 1),
    }
    path_out: list = []
    t = timed(
        lambda: wand_search(idx, blocks, q, k=10, stats=stats,
                            path_out=path_out).count()
    )
    out["wand_top10"] = {
        "wall_s": round(t, 2),
        "per_query_ms": round(t / len(lines) * 1000, 1),
        "physical_path": path_out[:1],
    }

    # ---- dedup at 20M (scan path, no cache)
    t0 = time.perf_counter()
    n_exact = dedup_exact(docs).count()
    out["dedup_exact"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "survivors": n_exact,
    }
    t0 = time.perf_counter()
    n_pairs = lsh_candidate_pairs(docs).count()
    out["dedup_lsh_pairs"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "candidate_pairs": n_pairs,
    }

    out["ui"] = ui_metrics(app_id)
    out["host_load_1m_at_end"] = round(os.getloadavg()[0], 2)
    out["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, args.out), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

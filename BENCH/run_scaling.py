"""Scaling-efficiency evidence (BASELINE.json north rule): the same job on
the same input at two parallelism levels — local[8] vs local[32] (no real
cluster in this sandbox) — reporting throughput at both plus

    efficiency = (T_8 / T_32) / (32 / 8)        (perfect strong scaling = 1.0)

Writes BENCH/scaling.json and regenerates the results table in
BENCH/BASELINE.md.

    python BENCH/run_scaling.py [--docs 150000] [--iters 3]
"""

# NOTE: no `from __future__ import annotations` here — the inline
# pandas_udf's type hints must be real objects (pd is a local import).

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/jassjr_bench_corpus.parquet"  # rebound per --docs in main()


def ensure_corpus(n_docs: int) -> None:
    """Distributed deterministic corpus: content seeded per docid, generated
    inside an Arrow UDF (driver-side generation of 10^5+ docs is minutes of
    single-core Python; this is seconds on 32 cores)."""
    from jassjr_spark.session import get_spark

    marker = f"{CORPUS}/_built_{n_docs}"
    if os.path.exists(marker):
        return
    spark = get_spark("corpus_gen", master="local[32]")

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jassjr_spark.fixtures import _COMMON, _MID, _RARE

    vocab = _COMMON * 5 + _MID * 2 + _RARE  # skewed mixture

    @F.pandas_udf(T.StringType())
    def gen_content(docid: pd.Series) -> pd.Series:
        import random

        out = []
        for d in docid:
            rng = random.Random(42 + int(d))
            n = rng.randint(3, 120)
            out.append(" ".join(rng.choice(vocab) for _ in range(n)))
        return pd.Series(out)

    (
        spark.range(0, n_docs, 1, 64)
        .select(
            F.col("id").alias("docid"),
            F.format_string("DOC-%08d", F.col("id")).alias("docno"),
            gen_content(F.col("id")).alias("content"),
        )
        .write.mode("overwrite")
        .parquet(CORPUS)
    )
    open(marker, "w").write("ok")
    spark.stop()


def run_level(cores: int, iters: int, queries: int, mode: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="60g")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "scaling_job.py"),
         "--cores", str(cores), "--corpus", CORPUS, "--iters", str(iters),
         "--queries", str(queries), "--mode", mode],
        capture_output=True, text=True, check=True, env=env,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_interleaved(levels, rounds: int, iters: int, queries: int, mode: str):
    """Alternate the two levels across fresh JVMs and keep each level's
    BEST time. The sandbox host has heavy run-to-run noise (identical jobs
    vary 2-5x wall-clock); interleaving exposes both levels to the same
    drift and min-of-rounds estimates achievable performance."""
    best: dict[int, dict] = {}
    for _ in range(rounds):
        for cores in levels:
            r = run_level(cores, iters, queries, mode)
            cur = best.get(cores)
            if cur is None:
                best[cores] = r
            else:
                for metric in ("index", "search"):
                    if f"{metric}_sec" in r and (
                        r[f"{metric}_sec"] < cur[f"{metric}_sec"]
                    ):
                        cur[f"{metric}_sec"] = r[f"{metric}_sec"]
                        for extra in (f"{metric}_docs_per_sec", "queries_per_sec"):
                            if extra in r:
                                cur[extra] = r[extra]
    return [best[c] for c in levels]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--mode", choices=["index", "search", "both"], default="both")
    ap.add_argument("--out", default="scaling.json")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    global CORPUS
    CORPUS = f"/tmp/jassjr_bench_corpus_{args.docs}.parquet"
    ensure_corpus(args.docs)
    lo, hi = run_interleaved(
        (args.low, args.high), args.rounds, args.iters, args.queries, args.mode
    )

    ratio = args.high / args.low
    result = {
        "n_docs": lo["n_docs"],
        "levels": {f"local[{args.low}]": lo, f"local[{args.high}]": hi},
    }
    for metric in ("index", "search"):
        if f"{metric}_sec" in lo:
            sp = lo[f"{metric}_sec"] / hi[f"{metric}_sec"]
            result[f"{metric}_speedup"] = round(sp, 3)
            result[f"{metric}_efficiency"] = round(sp / ratio, 3)
    here = os.path.dirname(os.path.abspath(__file__))
    # --out may be bare (lands in BENCH/) or carry its own directory.
    out = args.out if os.path.dirname(args.out) else os.path.join(here, args.out)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Multi-JVM scaling evidence (VERDICT r5 Next #5): the index+search
sweep across REAL executor JVM boundaries via Spark's local-cluster
mode — per-executor memory limits, serde, and network-ish shuffle
transport, no cluster needed. Compares 4 total cores (1 executor) vs 16
total cores (4 executors), interleaved best-of-rounds like
run_scaling.py (same host-noise rationale).

    python BENCH/run_scaling_cluster.py [--docs 150000] [--rounds 3]

Writes BENCH/scaling_local_cluster.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(cores: int, master: str, corpus: str, iters: int,
            queries: int) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="24g")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "scaling_job.py"),
         "--cores", str(cores), "--corpus", corpus, "--iters", str(iters),
         "--queries", str(queries), "--mode", "both", "--master", master],
        capture_output=True, text=True, check=True, env=env,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--mem-mb", type=int, default=8192)
    ap.add_argument("--out", default="scaling_local_cluster.json")
    args = ap.parse_args()

    corpus = f"/tmp/jassjr_bench_corpus_{args.docs}.parquet"
    if not os.path.exists(f"{corpus}/_built_{args.docs}"):
        import run_scaling

        run_scaling.CORPUS = corpus
        run_scaling.ensure_corpus(args.docs)

    legs = [
        (4, f"local-cluster[1,4,{args.mem_mb}]"),    # 1 executor JVM
        (16, f"local-cluster[4,4,{args.mem_mb}]"),   # 4 executor JVMs
    ]
    best: dict[int, dict] = {}
    for rnd in range(args.rounds):
        for cores, master in legs:
            r = run_leg(cores, master, corpus, args.iters, args.queries)
            r["master"] = master
            cur = best.get(cores)
            if cur is None:
                best[cores] = r
            else:
                for metric in ("index", "search"):
                    if r.get(f"{metric}_sec", 1e9) < cur.get(f"{metric}_sec", 1e9):
                        cur[f"{metric}_sec"] = r[f"{metric}_sec"]
            print(f"round {rnd} {master}: {r}", file=sys.stderr)

    lo, hi = best[4], best[16]
    result = {
        "n_docs": lo["n_docs"],
        "mode": "local-cluster (multi-JVM executors)",
        "levels": {lo["master"]: lo, hi["master"]: hi},
        "load_1m": round(os.getloadavg()[0], 2),
    }
    for metric in ("index", "search"):
        if f"{metric}_sec" in lo and f"{metric}_sec" in hi:
            sp = lo[f"{metric}_sec"] / hi[f"{metric}_sec"]
            result[f"{metric}_speedup_4to16"] = round(sp, 3)
            result[f"{metric}_efficiency_4to16"] = round(sp / 4.0, 3)
    here = os.path.dirname(os.path.abspath(__file__))
    out = args.out if os.path.dirname(args.out) else os.path.join(here, args.out)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Multi-JVM broadcast-crossover A/B (OPTIMIZATION_r06 carried item #4):
measure the search leg in local-cluster mode with the default docno-join
crossover (broadcast the docids table) vs the flipped crossover
(JASSJR_BROADCAST_DOCIDS_MAX below n_docs, so the <=k-rows-per-query
ranked run is broadcast into docids instead). The hypothesis from the
round-6 scaling run: multi-JVM mode replicates the docids broadcast once
per executor JVM, so lowering the crossover should close part of the
search-efficiency gap at 4 executors.

Interleaved best-of-rounds, same discipline as run_scaling_cluster.py:

    python BENCH/run_lc_broadcast_ab.py [--docs 600000] [--rounds 2]

Writes BENCH/scaling_lc_broadcast_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(cores: int, master: str, corpus: str, iters: int,
            queries: int, knob: str | None) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="24g")
    if knob is not None:
        env["JASSJR_BROADCAST_DOCIDS_MAX"] = knob
    else:
        env.pop("JASSJR_BROADCAST_DOCIDS_MAX", None)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "scaling_job.py"),
         "--cores", str(cores), "--corpus", corpus, "--iters", str(iters),
         "--queries", str(queries), "--mode", "search", "--master", master],
        capture_output=True, text=True, check=True, env=env,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--mem-mb", type=int, default=8192)
    ap.add_argument("--out", default="scaling_lc_broadcast_ab.json")
    args = ap.parse_args()

    corpus = f"/tmp/jassjr_bench_corpus_{args.docs}.parquet"
    if not os.path.exists(f"{corpus}/_built_{args.docs}"):
        import run_scaling

        run_scaling.CORPUS = corpus
        run_scaling.ensure_corpus(args.docs)

    mc16 = f"local-cluster[4,4,{args.mem_mb}]"
    mc4 = f"local-cluster[1,4,{args.mem_mb}]"
    # (label, cores, master, knob): knob "100000" < 600k docs flips the
    # docno join to broadcast the ranked run; None keeps the default.
    legs = [
        ("16c_default", 16, mc16, None),
        ("16c_flipped", 16, mc16, "100000"),
        ("4c_default", 4, mc4, None),
        ("4c_flipped", 4, mc4, "100000"),
    ]
    best: dict[str, dict] = {}
    for rnd in range(args.rounds):
        for label, cores, master, knob in legs:
            r = run_leg(cores, master, corpus, args.iters, args.queries,
                        knob)
            r["master"], r["knob"] = master, knob or "default"
            cur = best.get(label)
            if cur is None or r["search_sec"] < cur["search_sec"]:
                best[label] = r
            print(f"round {rnd} {label}: {r}", file=sys.stderr)

    result = {
        "n_docs": best["16c_default"]["n_docs"],
        "mode": "local-cluster broadcast-crossover A/B (search leg)",
        "legs": best,
        "load_1m": round(os.getloadavg()[0], 2),
    }
    for knob in ("default", "flipped"):
        lo, hi = best[f"4c_{knob}"], best[f"16c_{knob}"]
        sp = lo["search_sec"] / hi["search_sec"]
        result[f"search_speedup_4to16_{knob}"] = round(sp, 3)
        result[f"search_efficiency_4to16_{knob}"] = round(sp / 4, 3)
    result["search_16c_flip_gain"] = round(
        best["16c_default"]["search_sec"] / best["16c_flipped"]["search_sec"],
        3)
    out_path = os.path.join(os.path.dirname(__file__), args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""spark-submit entry point: BM25 top-k search over a persisted index.

    spark-submit --py-files jassjr_spark.zip jassjr_spark/search_job.py \
        --index /indexes/corpus [--queries queries.txt] [--k 1000] [--wand]

Queries come from --queries (one per line, optional leading TREC id) or
stdin, exactly like the reference REPL (JASSjr_search.py:55). Output is the
TREC run on stdout: "qid Q0 docno rank score JASSjr".
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries")
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--wand", action="store_true",
                    help="block-max WAND pruned evaluation (rank-identical)")
    ap.add_argument("--force-blocks", action="store_true",
                    help="with --wand: disable the adaptive fallback and "
                         "always decode kept blocks (fallback_keep_frac=1)")
    ap.add_argument("--block-span", type=int, default=0,
                    help="override; 0 = read from index _meta")
    ap.add_argument("--interactive", action="store_true",
                    help="true REPL: answer each line as it arrives "
                         "(sub-second p50; byte-identical output)")
    ap.add_argument("--interactive-budget", type=int, default=5_000_000,
                    help="driver postings budget (entries) for the REPL's "
                         "local cache; when it covers the whole index, "
                         "construction loads ALL postings resident (the "
                         "reference's startup regime) and every query is "
                         "zero-job")
    ap.add_argument("--as-of", type=int, default=None, dest="as_of",
                    help="time-travel: answer queries against the index "
                         "SNAPSHOT at this epoch (LSM epoch layout only; "
                         "refuses below the compaction floor). Not "
                         "combinable with --wand (blocks bake the live "
                         "docid set).")
    ap.add_argument("--syntax", action="store_true",
                    help="parse lines with the full query language "
                         "(+req -not term^w term~d pfx* /re/) instead of "
                         "the reference's bare disjunctive terms; qid = "
                         "input line number. Field filters and phrases "
                         "need metadata/positions tables and are "
                         "rejected here.")
    args = ap.parse_args()

    from jassjr_spark.operators.search import (
        InteractiveSearcher, input_order_qids, parse_queries, regroup_lines,
        search_lines, to_trec_lines,
    )
    from jassjr_spark.operators.wand import wand_search
    from jassjr_spark.plans.build_job import load_persisted
    from jassjr_spark.session import get_spark
    from jassjr_spark.sources.index_store import read_index

    spark = get_spark("jassjr_search")

    if args.as_of is not None and args.wand:
        ap.error("--as-of cannot combine with --wand (the compressed "
                 "blocks bake the live docid set; snapshot queries run "
                 "the exact kernel)")

    def _read(path):
        return read_index(spark, path, as_of=args.as_of)

    if args.syntax:
        from jassjr_spark.operators.query_language import (
            run_user_queries, run_user_query,
        )

        idx = _read(args.index).cache()
        idx.postings.count()  # warm
        if args.interactive:
            source = open(args.queries) if args.queries else sys.stdin
            for ln in source:
                if not ln.strip():
                    continue
                for out_ln in to_trec_lines(
                        run_user_query(idx, ln.strip(), k=args.k)):
                    print(out_ln, flush=True)
            return
        if args.queries:
            lines = [ln for ln in open(args.queries).read().splitlines()
                     if ln.strip()]
        else:
            lines = [ln for ln in sys.stdin.read().splitlines() if ln.strip()]
        out = regroup_lines(
            to_trec_lines(run_user_queries(idx, lines, k=args.k)),
            [str(i) for i in range(len(lines))],
        )
        for ln in out:
            print(ln)
        return

    if args.interactive:
        # the reference's REPL shape (JASSjr_search.cpp:168): load state
        # once, answer each stdin line as it arrives
        idx = _read(args.index).cache()
        idx.postings.count()  # warm
        it = InteractiveSearcher(
            idx, local_postings_budget=args.interactive_budget)
        source = open(args.queries) if args.queries else sys.stdin
        for ln in source:
            if not ln.strip():
                continue
            for out_ln in it.search_line(ln.strip(), k=args.k):
                print(out_ln, flush=True)
        return

    if args.queries:
        lines = [ln for ln in open(args.queries).read().splitlines() if ln.strip()]
    else:
        lines = [ln for ln in sys.stdin.read().splitlines() if ln.strip()]

    if args.wand:
        from jassjr_spark.sources.index_store import read_meta

        from jassjr_spark.plans.build_job import load_block_stats

        idx, blocks = load_persisted(spark, args.index)
        idx = idx.cache()
        stats = idx.scalar_stats()
        block_stats = load_block_stats(spark, args.index)
        span = args.block_span or read_meta(spark, args.index)["block_span"] or 1024
        q = parse_queries(spark, lines)
        # --force-blocks disables the adaptive fallback; otherwise the
        # engine may (correctly) route to the naive kernel — e.g. the
        # default k=1000 always exceeds the prunable-k gate. Either way,
        # tell the user which physical path actually ran (output is
        # identical by construction).
        chosen: list = []
        out = regroup_lines(
            to_trec_lines(
                wand_search(idx, blocks, q, k=args.k, stats=stats,
                            block_span=span,
                            fallback_keep_frac=(
                                1.0 if args.force_blocks else 0.5),
                            path_out=chosen, block_stats=block_stats)
            ),
            input_order_qids(lines),
        )
        print(f"wand: physical path = {chosen[0] if chosen else 'unknown'}"
              f" (k={args.k})", file=sys.stderr)
    else:
        idx = _read(args.index).cache()
        out = search_lines(idx, spark, lines, k=args.k)
    for ln in out:
        print(ln)


if __name__ == "__main__":
    main()

"""One-shot wall-time survey of the round-4 extension entries at a given
scale dir — evidence the additions stay in the same latency class as the
core engine (bench.py's headline lines are unchanged for round-over-
round comparability; this is the coverage-side companion).

    python BENCH/new_ops_job.py [sf_dir] [cores]

Each entry runs once after a shared warmup (indexes/stores memoized by
the driver_queries layer exactly as in production use); values are
single-shot seconds, labeled as such.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16

ENTRIES = [
    "code_grep_many", "code_grep_many_persisted", "code_snippets_top5",
    "code_snippets_multi", "code_mlt_top10", "code_federated_top10",
    "code_prf_top10", "code_not_top10", "code_mixed_top10",
    "code_bm25f_top10", "code_syn_top10", "code_grouped_top10",
    "code_page2_top10", "ft_complete", "ft_related", "ft_ndcg",
    "decon_pairs", "text_redact", "pipe_curated",
    # round-4 continuation additions
    "ft_boost_top10", "ft_fuzzy_top10", "ft_wildcard_top10",
    "ft_regex_top10", "ft_term_vector", "ft_explain", "ft_bm25_tuned",
    "ft_sig_terms", "ft_phrase_mix_top10", "code_hit_counts",
    "code_sortby_top10", "code_facet_stats", "code_cursor_top10",
    "code_histogram", "code_dismax_top10", "sim_rescore_top10",
    "ft_percolate", "ft_percolate_neg", "ft_stem_dictionary",
    "ft_stem_search_top10", "ft_autocorrect_top10", "ft_bpref",
    "sim_mmr_top5",
    # round-4 session-5 additions (similarities, fusion, snapshots, PQ)
    "ft_lmd_top10", "ft_tfidf_top10", "ft_msm_top10", "ft_docboost_top10",
    "ft_err", "ft_rbp", "ft_zipf", "ft_stop_top10", "hybrid_linear_top10",
    "code_facet_percentiles", "snap_as_of_lengths", "sim_pq_top5",
    # round-4 session-6 additions (LM quality, BPE, incremental dedup)
    "text_ppl", "text_ppl2", "text_bpe_tokens", "text_bpe_merges",
    "dedup_incremental",
    # round-4 session-7 additions (event analytics, training-data I/O, LTR)
    "ev_asof_join", "ev_range_campaigns", "ev_retention", "ev_funnel",
    "ev_anomalies", "ev_rollup", "io_jsonl_roundtrip", "ltr_features",
]


def main() -> None:
    import __spark_entry__ as entry

    from jassjr_spark.session import get_spark

    spark = get_spark(
        "new_ops_bench", master=f"local[{CORES}]", shuffle_partitions=CORES
    )
    qs = entry.queries()
    # warm shared artifacts (corpus/code index, stores) through one entry
    qs["code_grep_many"](spark, SF_DIR).count()
    qs["ft_complete"](spark, SF_DIR).count()

    out = {}
    for name in ENTRIES:
        t0 = time.perf_counter()
        n = qs[name](spark, SF_DIR).count()
        out[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
    print(json.dumps({"sf_dir": SF_DIR, "cores": CORES,
                      "method": "single-shot after warmup",
                      "entries": out}))


if __name__ == "__main__":
    main()

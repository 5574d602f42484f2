"""Scatter-gather search over independent index shards.

The reference serves exactly one monolithic index (one vocab.bin /
postings.bin pair, ``JASSjr_search.cpp:86-134``); a 100-TB corpus is
instead indexed as many shard indexes (per-partition builds,
``plans/build_job.py``; zero-shuffle merge, ``index_store.merge_indexes``).
Merging is the *storage* consolidation path; this module is the
*query-time* alternative the big engines use (Elasticsearch/Solr
scatter-gather): answer a query against N live shards directly —
no merge step, shards stay independently writable — and still return
exactly what one merged index would.

Rank-identity argument (tested): BM25's per-(term, doc) contribution
depends on tf and dl (shard-local by construction — every doc lives in
exactly one shard), and on N, avgdl, df (GLOBAL). So the scatter phase
scores each shard with globalized statistics:

* N = sum of shard doc counts; avgdl = sum(total_terms) / N computed
  driver-side in CPython — bitwise equal to a merged index's
  ``avg(len)`` because Spark's avg over longs is exact-sum / count;
* df(term) = sum of shard dfs, gathered with ONE job (union of the
  shards' term-pruned dictionary probes), fed to ``search()`` through
  its ``local_dict`` override, idf via CPython ``math.log`` as always.

Each shard then runs the ordinary S4-S10 pipeline (bucket-pruned
postings scan, broadcast query join, ordered fold) and keeps its own
top-k; the gather phase is a union of N tiny (<= k rows per query)
runs re-ranked globally — the only cross-shard data movement.

Tie caveat: the shard-local top-k cut breaks exact-rsv ties by docid
within the shard while the global re-rank uses docno; a tie ACROSS the
cut boundary could therefore admit a different member of the tied set
than a merged index would. Exact-double rsv ties between distinct
documents require identical (tf, dl) profiles; callers needing a hard
guarantee under adversarial duplicates should widen k at scatter time.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import search


def global_stats(shards: list[Index]) -> dict:
    """Summed corpus statistics across shards, exact to the last ulp vs
    a merged index (integer sums; one CPython double division)."""
    n_docs = total_terms = 0
    for sh in shards:
        s = sh.scalar_stats()
        n_docs += s["n_docs"]
        total_terms += s["total_terms"]
    return {
        "n_docs": n_docs,
        "total_terms": total_terms,
        "avgdl": total_terms / n_docs if n_docs else 0.0,
    }


def global_df(shards: list[Index], qterms: list[str]) -> dict[str, int]:
    """(term -> global df) for the query's terms: every shard's pruned
    dictionary probe unioned into ONE aggregation job."""
    probes = [
        sh.dictionary.filter(F.col("term").isin(qterms)).select("term", "df")
        for sh in shards
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), probes)
    return {
        r.term: r.df
        for r in unioned.groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .collect()
    }


CORI_B = 0.4
CORI_DF_BASE = 50.0
CORI_DF_FACTOR = 150.0


def shard_df_table(shards: list[Index], qterms: list[str]) -> dict:
    """((shard, term) -> df) for the query's terms, gathered with ONE
    job: every shard's pruned dictionary probe tagged with its shard id
    and unioned. The collected table is O(shards x query terms)."""
    probes = [
        sh.dictionary.filter(F.col("term").isin(qterms)).select(
            F.lit(i).alias("shard"), "term", "df"
        )
        for i, sh in enumerate(shards)
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), probes)
    return {(r.shard, r.term): r.df for r in unioned.collect()}


def cori_scores(
    df_table: dict, shard_weights: list[int], qterms: list[str],
    b: float = CORI_B,
) -> list[tuple[int, float]]:
    """CORI resource ranking (Callan et al., SIGIR'95) from a collected
    df table: score shard i as the mean belief over the query's terms,

        T = df / (df + 50 + 150 * cw_i / avg_cw)        (term frequency)
        I = ln((n_shards + 0.5) / cf_t) / ln(n_shards + 1)   (scarcity)
        belief = b + (1 - b) * T * I

    with cw_i = shard i's total term count and cf_t = number of shards
    containing t. Terms in NO shard are dropped from the mean (an OOV
    term says nothing about where to route). Pure driver CPython over
    the tiny probe table — libm ln, bitwise what the SQL oracle's
    ``ln`` computes. Returns [(shard, score)] sorted score desc, shard
    asc; all-OOV queries score every shard 0.0."""
    nsh = len(shard_weights)
    avg_cw = sum(shard_weights) / nsh
    seen, terms = set(), []
    for t in qterms:
        if t not in seen:
            seen.add(t)
            terms.append(t)
    cf = {
        t: sum(1 for i in range(nsh) if df_table.get((i, t), 0) > 0)
        for t in terms
    }
    scored = [t for t in terms if cf[t] > 0]
    out = []
    for i in range(nsh):
        if not scored:
            out.append((i, 0.0))
            continue
        acc = 0.0
        for t in scored:
            df = float(df_table.get((i, t), 0))
            T = df / (df + CORI_DF_BASE
                      + CORI_DF_FACTOR * shard_weights[i] / avg_cw)
            I = math.log((nsh + 0.5) / cf[t]) / math.log(nsh + 1.0)
            acc += b + (1.0 - b) * T * I
        out.append((i, acc / len(scored)))
    return sorted(out, key=lambda p: (-p[1], p[0]))


def rank_shards(
    shards: list[Index], qterms: list[str], b: float = CORI_B,
) -> list[tuple[int, float]]:
    """[(shard, cori_score)] best-first for a term list — the resource-
    selection step: at 1000 shards, routing a query to the best few
    replaces a 1000-way scatter with an m-way one."""
    weights = [sh.scalar_stats()["total_terms"] for sh in shards]
    return cori_scores(shard_df_table(shards, qterms), weights, qterms, b)


def selective_federated_search(
    shards: list[Index],
    queries: DataFrame,
    k: int = 10,
    m: int = 2,
    b: float = CORI_B,
) -> DataFrame:
    """Scatter-gather over only each query's top-``m`` shards by CORI.

    Statistics stay GLOBAL over ALL shards (N, avgdl, df as in
    federated_search), so a returned document's rsv is identical to the
    full federation's — selection only narrows WHICH shards are asked,
    the honest trade (documents whose only copies live in skipped
    shards are unreachable; that is the point of resource selection).
    One probe job serves both the CORI table and the scorer's global
    df; queries with the same shard choice share one search() plan, so
    the job count is O(distinct shard subsets), not O(queries)."""
    qrows = queries.select("query_id", "pos", "term").collect()
    by_qid: dict = {}
    for r in sorted(qrows, key=lambda r: (r.query_id, r.pos)):
        by_qid.setdefault(r.query_id, []).append(r.term)
    all_terms = sorted({r.term for r in qrows})

    gstats = global_stats(shards)
    df_table = shard_df_table(shards, all_terms)
    weights = [sh.scalar_stats()["total_terms"] for sh in shards]
    gdf = {
        t: df
        for t in all_terms
        if (df := sum(df_table.get((i, t), 0) for i in range(len(shards)))) > 0
    }

    subsets: dict[tuple, list] = {}
    for qid, terms in by_qid.items():
        ranked = cori_scores(df_table, weights, terms, b)
        chosen = tuple(sorted(i for i, _ in ranked[:m]))
        subsets.setdefault(chosen, []).append(qid)

    runs = []
    for chosen, qids in subsets.items():
        qsub = queries.filter(F.col("query_id").isin(qids))
        qterms = sorted({t for q in qids for t in by_qid[q]})
        for i in chosen:
            runs.append(
                search(shards[i], qsub, k=k, stats=gstats,
                       local_dict=gdf, qterms=qterms)
            )
    gathered = reduce(lambda a, b2: a.unionByName(b2), runs).drop("rank")
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docno").desc()
    )
    return (
        gathered.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "docno", "rank", "rsv")
    )


def federated_search(
    shards: list[Index],
    queries: DataFrame,
    k: int = 10,
    qterms: list[str] | None = None,
) -> DataFrame:
    """(query_id, docno, rank, rsv): global top-k over all shards,
    rank-identical (see module docstring) to searching one merged index.
    Global ranks tie-break docno desc (shard docids are not comparable
    across shards)."""
    if qterms is None:
        qterms = [r.term for r in queries.select("term").distinct().collect()]
    gstats = global_stats(shards)
    gdf = global_df(shards, qterms)
    runs = [
        search(sh, queries, k=k, stats=gstats, local_dict=gdf, qterms=qterms)
        for sh in shards
    ]
    gathered = reduce(lambda a, b: a.unionByName(b), runs).drop("rank")
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docno").desc()
    )
    return (
        gathered.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "docno", "rank", "rsv")
    )

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

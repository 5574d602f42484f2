"""Explicit skew handling: salted two-phase aggregation.

Where it matters in this engine: any ``groupBy(term)`` whose per-group
state does NOT shrink map-side. Plain count/sum dictionaries are safe
(Spark's partial aggregation combines before the shuffle), and the blocked
postings groupBy is bounded by block_span. But a ``collect_list`` over a
whole term — e.g. exporting a legacy array-layout postings table, or any
holistic aggregate — concentrates a stopword's entire 10^9-row group in
one reducer. AQE does not split skewed *aggregations* (only joins), so the
fix must be explicit:

  phase 1: groupBy(key, salt = some_column % S) — S-way split of every
           group, each partial bounded by |group|/S;
  phase 2: groupBy(key) over the S partials — now at most S rows per key.

``salted_collect_postings`` instantiates the pattern for the array-layout
postings export (salt = docid % S, partials are docid-sorted runs, phase 2
concatenates runs in salt order — NOT a resort; correct because
docid % S buckets... are interleaved, so phase 2 merges via flatten +
array_sort on the (at most S) partial arrays, each already sorted: cost is
S-way merge of bounded pieces, not a monolithic sort of 10^9 elements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_postings(
    postings: DataFrame, salt_buckets: int = 64
) -> DataFrame:
    """(term, docid, tf) -> (term, df, postings array<struct<docid,tf>>)
    docid-ascending, built with a salted two-phase aggregation so no single
    task ever holds more than ~|postings(term)| / salt_buckets rows during
    phase 1."""
    phase1 = (
        postings.withColumn("salt", (F.col("docid") % salt_buckets).cast("int"))
        .groupBy("term", "salt")
        .agg(
            F.sort_array(F.collect_list(F.struct("docid", "tf"))).alias("part"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        phase1.groupBy("term")
        .agg(
            F.array_sort(F.flatten(F.collect_list("part"))).alias("postings"),
            F.sum("n").cast("long").alias("df"),
        )
        .select("term", "df", "postings")
    )

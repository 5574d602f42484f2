"""Scale-adaptive scan spreading (guide §2.5 "input skew" / §6).

A small corpus often arrives as ONE unsplittable parquet row group: any
number of byte-range splits still leaves every row in the partition that
holds the row-group midpoint, so per-row compute downstream of the scan
(tokenizers, hash kernels, cosine folds) serializes on 1-2 cores
regardless of cluster size. ``spread`` round-robins such a source over
the session's default parallelism; at real scale the scan already has
more partitions than cores and the call is a no-op — nothing here is
tuned to local mode.

The repartition is deterministic (Spark sorts before a round-robin
repartition by default, SPARK-23207) and callers only apply it upstream
of order-independent operators, so results never change — only the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin ``df`` over ``target`` (default: the session default
    parallelism) partitions IF it currently has fewer — the condition
    that marks an unsplittable small scan. Otherwise return it as-is."""
    sc = df.sparkSession.sparkContext
    t = target or sc.defaultParallelism
    n = df.rdd.getNumPartitions()
    if 0 < n < t:
        return df.repartition(t)
    return df

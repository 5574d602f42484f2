"""Hybrid retrieval: reciprocal-rank fusion (RRF) of heterogeneous
rankings — the standard way to combine this engine's two retrieval
halves (BM25 lexical top-k, operators/search.py; cosine/ANN vector
top-k, operators/similarity.py + sources/vector_store.py) into one
ranking, per Cormack, Clarke & Buettcher's RRF (SIGIR 2009):

    rrf(d) = Σ_runs  w_run / (c + rank_run(d))        (c = 60 classic)

The reference engine has no hybrid mode (it is BM25-only); this is part
of the engine's LLM-data-pipeline surface, where "retrieve by keyword
AND by embedding, fuse" is the canonical recall path for dedup /
contamination sweeps.

Determinism contract (the driver oracle hashes raw doubles): the fused
score is built as a FIXED-ORDER chain of two-operand IEEE additions of
exactly representable-per-run terms (w/(c+rank) is one double division
each), not a SUM aggregate — so Spark and any ANSI-SQL engine produce
bit-identical rrf values. Ties break docid-descending like every ranked
surface in this engine.

Scale shape: each input run is ≤ k rows per query (top-k output of its
retriever), so the fusion joins are trivially broadcast-able and the
whole fuse is a few MB regardless of corpus size — the heavy lifting
stays in the upstream retrievers, which carry their own scale designs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60.0  # the constant from the RRF paper; callers may override


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 10,
    c: float = RRF_C,
    weights: list[float] | None = None,
    id_col: str = "docid",
) -> DataFrame:
    """Fuse ``runs`` — each (query_id, <id_col>, rank) with rank 1-based —
    into (query_id, <id_col>, rank, rrf), top ``k`` per query by
    (rrf desc, id desc). A document absent from a run contributes 0 for
    that run (the standard RRF convention)."""
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError("one weight per run")

    base: DataFrame | None = None
    for i, r in enumerate(runs):
        r = r.select("query_id", id_col, F.col("rank").alias(f"_rank_{i}"))
        base = r if base is None else base.join(
            r, ["query_id", id_col], "full_outer"
        )
    expr = None
    for i, w in enumerate(weights):
        term = F.coalesce(
            F.lit(float(w)) / (F.lit(float(c)) + F.col(f"_rank_{i}")),
            F.lit(0.0),
        )
        expr = term if expr is None else expr + term
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col(id_col).desc()
    )
    return (
        base.withColumn("rrf", expr)
        .withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "rrf")
    )


def linear_fuse(
    runs: list[DataFrame],
    k: int = 10,
    weights: list[float] | None = None,
    id_col: str = "docid",
    score_col: str = "score",
) -> DataFrame:
    """Weighted-sum fusion with per-query min-max normalization — the
    other standard hybrid combiner (the convex-combination baseline of
    Bruch et al., "An Analysis of Fusion Functions for Hybrid Retrieval",
    TOIS 2023): each run's scores are rescaled to [0, 1] WITHIN the
    query,

        norm(s) = (s - min_q) / (max_q - min_q)    (1.0 when max == min)

    and fused = Σ_runs w_run * norm_run(d), absent-from-run = 0 (RRF's
    convention). Unlike RRF it uses score MAGNITUDES, so a dominant
    top-1 in one run can outrank unanimous mid-ranks in the other.

    Each ``runs[i]`` is (query_id, <id_col>, <score_col>). Determinism
    contract (same as rrf_fuse): min/max/subtract/divide/multiply and a
    fixed-order two-operand addition chain are all IEEE-exact, so the
    fused double is bit-identical across engines given identical input
    scores — no rounding needed. Scale shape: runs are top-k-sized, the
    min/max aggregate and the fuse joins are a few MB per query batch.
    """
    if not runs:
        raise ValueError("linear_fuse needs at least one run")
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError("one weight per run")

    base: DataFrame | None = None
    for i, r in enumerate(runs):
        s = F.col(score_col)
        mm = r.groupBy("query_id").agg(
            F.min(s).alias("_mn"), F.max(s).alias("_mx")
        )
        norm = F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0)).otherwise(
            (s - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))
        )
        r = (
            r.join(mm, "query_id")
            .select("query_id", id_col, norm.alias(f"_n_{i}"))
        )
        base = r if base is None else base.join(
            r, ["query_id", id_col], "full_outer"
        )
    expr = None
    for i, w in enumerate(weights):
        term = F.lit(float(w)) * F.coalesce(F.col(f"_n_{i}"), F.lit(0.0))
        expr = term if expr is None else expr + term
    win = Window.partitionBy("query_id").orderBy(
        F.col("fused").desc(), F.col(id_col).desc()
    )
    return (
        base.withColumn("fused", expr)
        .withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "fused")
    )

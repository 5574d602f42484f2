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

"""Block-max WAND top-k pruning (SURVEY.md §7 stage 5; north-star feature).

The reference scores every posting of every query term
(JASSjr_search.cpp:197-221). Block-max WAND skips postings blocks that
provably cannot reach the current top-k threshold. Our blocks are
docid-RANGE aligned ACROSS terms (functions/compression.py), which makes
the classic doc-at-a-time algorithm collapse into set algebra a cluster
can execute:

  every posting of doc d (any term) lives in block_id = d // span, so
    score(d) = Σ_t idf_t · impact_t(d)  ≤  UB(block)
             = Σ_t w_t · idf_t · max_impact(t, block)
  (w_t = multiplicity of t in the query — bag semantics).

Two-phase, provably rank-safe evaluation, all DataFrame ops:

  A. compute UB per (query, block) from block metadata only (tiny: query
     terms × their blocks); seed-score the highest-UB blocks that are
     guaranteed to contain ≥ k docs; θ_q = k-th seed score.
  B. keep blocks with UB ≥ θ_q − ε; exact-score ONLY those (same scoring
     kernel as the naive path, same ordered float fold); final top-k.

Safety: a doc in a pruned block has score ≤ UB < θ_q − ε while the true
k-th score ≥ θ_q, so no top-k member is ever pruned; kept docs are
re-scored by the identical kernel, so the output is rank- AND
score-identical to the naive path (asserted in tests against the naive
engine AND the reference oracle). ε = 1e-9 absorbs float-order slack
between the UB summation order and the per-doc fold order (real
discrepancy is ~1 ulp; ε costs a negligible amount of extra scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import TOP_K
from jassjr_spark.functions.compression import DEFAULT_BLOCK_SPAN
from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import (
    accumulate,
    attach_idf,
    score_postings,
    top_k,
)

EPSILON = 1e-9


def _block_upper_bounds(
    q_idf: DataFrame, blocks: DataFrame
) -> DataFrame:
    """-> (query_id, block_id, ub, cand_docs).

    cand_docs = max_t n(t, block): a lower bound on the distinct docids in
    the block, used to guarantee the seed set covers >= k docs.
    """
    weights = q_idf.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("w"),
        F.first("idf").alias("idf"),
    )
    return (
        blocks.join(F.broadcast(weights), "term")
        .groupBy("query_id", "block_id")
        .agg(
            F.sum(F.col("w") * F.col("idf") * F.col("max_impact")).alias("ub"),
            F.max("n").cast("long").alias("cand_docs"),
        )
    )


def wand_search(
    index: Index,
    blocks: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    stats: dict | None = None,
    block_span: int = DEFAULT_BLOCK_SPAN,
) -> DataFrame:
    """-> (query_id, docno, rank, rsv), identical to search() output.

    ``blocks`` is the BLOCK_SCHEMA metadata table built at index time with
    the same avgdl (functions/compression.py:build_blocks).
    """
    s = stats or index.scalar_stats()
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    from jassjr_spark.sources.index_store import pruned_postings

    postings = pruned_postings(index, qterms)
    q_idf = attach_idf(queries, index.dictionary, s["n_docs"], qterms=qterms)
    blocks_q = blocks.filter(F.col("term").isin(qterms))

    ub = _block_upper_bounds(q_idf, blocks_q).cache()

    # --- phase A: seed blocks (highest UB until >= k candidate docs) -> θ
    w = Window.partitionBy("query_id").orderBy(
        F.col("ub").desc(), F.col("block_id").asc()
    )
    seeds = (
        ub.withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cand_docs").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .filter(F.col("cum_before") < k)
        .select("query_id", "block_id")
    )
    seed_scores = _exact_scores(
        queries, postings, index, s, seeds, block_span, qterms
    )
    kth = (
        top_k(seed_scores, k)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("rsv").alias("theta"))
        .withColumn(
            "theta", F.when(F.col("n") >= k, F.col("theta")).otherwise(F.lit(0.0))
        )
        .select("query_id", "theta")
    )

    # --- phase B: keep blocks whose UB clears θ − ε, exact-score, top-k
    kept = (
        ub.join(F.broadcast(kth), "query_id", "left")
        .filter(
            F.col("ub") >= F.coalesce(F.col("theta"), F.lit(0.0)) - EPSILON
        )
        .select("query_id", "block_id")
    )
    final_scores = _exact_scores(
        queries, postings, index, s, kept, block_span, qterms
    )
    ranked = top_k(final_scores, k)
    return (
        ranked.join(F.broadcast(index.docids), "docid")
        .select("query_id", "docno", "rank", "rsv")
    )


def _exact_scores(
    queries: DataFrame, postings: DataFrame, index: Index, s: dict,
    block_subset: DataFrame, block_span: int, qterms: list[str] | None = None,
) -> DataFrame:
    """Exact (query_id, docid, rsv) restricted to the given
    (query_id, block_id) subset — the same kernel as the naive path plus a
    broadcast semi-join on the block filter."""
    scored = score_postings(
        queries, postings, index.dictionary, s["n_docs"], s["avgdl"],
        qterms=qterms,
    ).withColumn("block_id", (F.col("docid") / block_span).cast("long"))
    scored = scored.join(
        F.broadcast(block_subset), ["query_id", "block_id"], "left_semi"
    )
    return accumulate(scored.drop("block_id"))

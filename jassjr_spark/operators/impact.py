"""Impact-ordered segments + score-at-a-time (SAAT) anytime evaluation.

The big-brother JASS/ATIRE feature named by the north star (absent from
JASSjr itself — SURVEY.md §2.4 notes compression/impact-ordering come from
the north star, not the reference): at index time, each posting's full
BM25 contribution (idf folded in) is QUANTIZED to an integer impact level;
postings are regrouped into per-(term, impact) segments; query evaluation
processes segments in decreasing impact order and may STOP after a postings
budget ρ — an "anytime" ranker whose quality degrades gracefully with the
budget, and whose scores are integer sums (deterministic, order-free —
no float-summation semantics to reproduce).

Scale notes:
* segments are additionally split by docid range (``block_span``) so a
  stopword's mass at one impact level cannot form an unbounded
  ``collect_list`` (the same skew argument as functions/compression.py).
* the SAAT budget cut is segment-granular and per query: a window over
  (impact desc) with a running postings total, entirely in DataFrames.

Determinism gate (tested): with an unlimited budget, SAAT's ranking is
EXACTLY the quantized referee's ranking (integer equality), and its
top-k overlaps the exact-BM25 top-k to within quantization error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import B, K1, TOP_K
from jassjr_spark.operators.index_build import Index

DEFAULT_LEVELS = 512          # 9-bit quantization, the classic ATIRE width
DEFAULT_SEG_SPAN = 1 << 20    # docid-range split inside one impact level


def _exact_contrib(n_docs: int):
    """Per-posting BM25 contribution (idf folded in), pure Column math.
    All-JVM on purpose: the quantizer and the referee must share bit-exact
    inputs; cross-engine float identity is NOT required for quantized
    semantics (the integer levels are the contract)."""
    tf = F.col("tf").cast("double")
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    return idf * (
        (tf * (K1 + 1.0))
        / (tf + K1 * (1.0 - B + B * (F.col("dl").cast("double") / F.col("avgdl"))))
    )


def quantize_contribs(
    postings: DataFrame, dictionary: DataFrame, n_docs: int, avgdl: float,
    levels: int = DEFAULT_LEVELS,
) -> tuple[DataFrame, dict]:
    """-> ((term, docid, impact int), params). Impact in [1, levels-1];
    df==N terms are elided before quantization (their contribution is 0).

    The float contribution is first integerized to micro-units
    (round(c * 1e6)); the level is then PURE INTEGER math,
    ``(ci - lo) * (levels-2) div span`` — given identical micro-unit
    inputs the quantizer is reproducible bit-for-bit in any engine (the
    DuckDB driver oracle mirrors it), whereas a float floor() here would
    flip levels on ANY 1-ulp cross-engine drift. The residual risk is the
    rounding step itself: libm log differences flip a ci only when
    c*1e6 sits within ~1 ulp of an exact .5 boundary (and shift lo/span
    only when that posting is the corpus min/max) — the same accepted
    risk class as every round(x, n) oracle comparison in this repo."""
    dfed = postings.join(
        F.broadcast(
            dictionary.select("term", "df").filter(F.col("df") < n_docs)
        ),
        "term",
    ).withColumn("avgdl", F.lit(float(avgdl)))
    contrib = dfed.withColumn(
        "ci", F.round(_exact_contrib(n_docs) * 1e6, 0).cast("long")
    )
    lo, hi = contrib.agg(F.min("ci"), F.max("ci")).first()
    if lo is None:
        lo, hi = 0, 0
    span = max(hi - lo, 1)
    q = (
        F.expr(f"((ci - {lo}L) * {levels - 2}) DIV {span}L") + 1
    ).cast("int")
    quantized = contrib.select("term", "docid", q.alias("impact"))
    return quantized, {"lo": lo, "hi": hi, "levels": levels}


def build_impact_segments(
    index: Index, stats: dict | None = None,
    levels: int = DEFAULT_LEVELS, seg_span: int = DEFAULT_SEG_SPAN,
) -> tuple[DataFrame, dict]:
    """-> (segments(term, impact, seg, n, docids array<long>), params)."""
    s = stats or index.scalar_stats()
    quantized, params = quantize_contribs(
        index.postings, index.dictionary, s["n_docs"], s["avgdl"], levels
    )
    segments = (
        quantized.withColumn("seg", (F.col("docid") / seg_span).cast("long"))
        .groupBy("term", "impact", "seg")
        .agg(
            F.sort_array(F.collect_list("docid")).alias("docids"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return segments, params


def saat_search(
    segments: DataFrame, queries: DataFrame, k: int = TOP_K,
    rho: int | None = None,
) -> DataFrame:
    """Score-at-a-time evaluation over impact-ordered segments.

    queries: (query_id, pos, term) — bag semantics via per-term weight =
    occurrence count. rho: per-query postings budget (None = unlimited ⇒
    ranking identical to the quantized referee). Returns
    (query_id, docid, rank, rsv_q int).
    """
    weights = queries.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    segs = segments.join(F.broadcast(weights), "term")
    if rho is not None:
        # impact-descending segment order; keep segments while the
        # RUNNING total of postings before this segment is under budget
        # (JASS stops mid-segment; we stop at the segment boundary that
        # first exceeds ρ — same asymptotics, simpler distribution)
        w_order = Window.partitionBy("query_id").orderBy(
            F.col("impact").desc(), F.col("term").asc(), F.col("seg").asc()
        )
        segs = (
            segs.withColumn(
                "before",
                F.coalesce(
                    F.sum("n").over(
                        w_order.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .filter(F.col("before") < rho)
            .drop("before")
        )
    scored = segs.select(
        "query_id",
        F.explode("docids").alias("docid"),
        (F.col("w") * F.col("impact")).alias("partial"),
    )
    acc = scored.groupBy("query_id", "docid").agg(
        F.sum("partial").cast("long").alias("rsv_q")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("rsv_q").desc(), F.col("docid").desc()
    )
    return (
        acc.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )


def quantized_referee(
    index: Index, queries: DataFrame, k: int = TOP_K,
    stats: dict | None = None, levels: int = DEFAULT_LEVELS,
) -> DataFrame:
    """Document-at-a-time scoring over the SAME quantized contributions —
    the determinism gate for saat_search(rho=None)."""
    s = stats or index.scalar_stats()
    quantized, _ = quantize_contribs(
        index.postings, index.dictionary, s["n_docs"], s["avgdl"], levels
    )
    weights = queries.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    acc = (
        quantized.join(F.broadcast(weights), "term")
        .groupBy("query_id", "docid")
        .agg(F.sum(F.col("w") * F.col("impact")).cast("long").alias("rsv_q"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("rsv_q").desc(), F.col("docid").desc()
    )
    return (
        acc.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )

"""MaxScore dynamic pruning — the term-granular companion to block-max
WAND (operators/wand.py).

The reference scores every posting of every query term
(JASSjr_search.cpp:197-221). MaxScore (Turtle & Flood 1995; the TAAT/
DAAT-agnostic formulation in Mallia et al.'s PISA writeups) instead
splits the query's terms into an ESSENTIAL set and a NON-ESSENTIAL set:
sorted by per-term score upper bound, the longest ascending prefix whose
bounds sum below the top-k threshold θ can never, on its own, lift a
document into the top k — so documents that appear ONLY in non-essential
lists are never materialized at all.

Distributed restatement (all DataFrame ops; per-query term partitions are
driver-side metadata — a query has O(10) terms):

  1. per-term upper bound  ub(t) = max over t's blocks of the
     avgdl-drift-safe impact bound (wand.impact_bound_expr) — a
     METADATA-only scan of the blocks table; the payload column is never
     read (Parquet column pruning).
  2. θ seed: fully score ONLY each query's single highest-ub term list
     (term-pruned postings scan). The k-th best partial score is a valid
     lower bound on the true k-th full score (partial ≤ full per doc, and
     those k docs exist).
  3. term partition per query: weighted bounds ub'(t) = w_t·idf_t·ub(t)
     (w_t = bag multiplicity) sorted ascending; non-essential = the
     longest prefix with  Σ ub' < θ − ε  (ε absorbs float fold-order
     slack, same constant as WAND).
  4. essential lists are scored fully; their (query, doc) set is the
     CANDIDATE set. Non-essential lists are scanned term-pruned but
     semi-joined to the candidates BEFORE the accumulate shuffle — the
     distributed analogue of DAAT MaxScore's "look up non-essential
     cursors only for candidate docs". AQE picks a broadcast semi-join
     when the candidate set is small (selective θ), which is exactly
     when pruning pays.
  5. union all scored rows and run the SAME position-ordered fold +
     top-k as the naive path — the fold sorts by (pos), so the float
     sum order, and therefore every byte of the output, is identical to
     search() regardless of which subset each row came from (tested).

Safety: a document absent from every essential list has
score ≤ Σ_non-essential ub' < θ − ε ≤ (true k-th score) − ε, so it can
never enter the top k, even through the docid tie-break (ties need score
equality). Candidate docs are re-scored exactly. Hence rank- AND
score-identical to the exhaustive kernel.

Scale shape: where WAND prunes payload DECODE I/O at block granularity,
MaxScore prunes the ACCUMULATE SHUFFLE at term granularity — on a
stopword-bearing query the stopword's list dominates the shuffle, and it
is precisely the term MaxScore demotes to non-essential. The two pruners
compose conceptually but are kept as separate physical paths, both
bit-identical to the reference kernel.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

from jassjr_spark.constants import TOP_K
from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import (
    accumulate, bm25_contrib, resolve_docnos, top_k,
)
from jassjr_spark.operators.wand import (
    EPSILON, MAX_PRUNABLE_K, impact_bound_expr, pruned_blocks,
)


def term_upper_bounds(index: Index, blocks: DataFrame, qterms: list[str],
                      avgdl: float) -> dict[str, float]:
    """-> {term: max per-posting BM25 impact bound} from blocks METADATA
    only (no payload bytes touched; bucket-dir + term pushdown pruning)."""
    b = pruned_blocks(index, blocks, qterms)
    cols = [c for c in ("term", "max_impact", "max_tf", "min_dl", "avgdl0")
            if c in b.columns]
    meta = b.select(*cols)
    rows = (
        meta.groupBy("term")
        .agg(F.max(impact_bound_expr(meta.columns, avgdl)).alias("ub"))
        .collect()
    )
    return {r.term: r.ub for r in rows}


def term_upper_bounds_local(block_stats: dict, qterms: list[str],
                            avgdl: float) -> dict[str, float] | None:
    """Driver-resident replacement for term_upper_bounds — zero Spark
    jobs — from collect_block_stats summaries. Unlike the WAND gate's
    Monte-Carlo (a plan heuristic), these bounds feed MaxScore's SAFETY
    partition, so every value must genuinely upper-bound the term's
    per-posting impact under the CURRENT avgdl:

    * stats term: baked exact max_impact (computed under avgdl0), scaled
      by max(1, avgdl/avgdl0) — impact growth under a larger avgdl is
      capped by the avgdl ratio (the same argument as wand.py's rescaled
      baked bound); a smaller avgdl only shrinks impacts.
    * floored-out term (a deployment's min_blocks floor): the universal
      ceiling k1+1 (tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) < k1+1 for all
      tf, dl — the denominator always exceeds tf). Looser ⇒ the term is
      demoted less often ⇒ less pruning, never a wrong answer.

    * multi-epoch (LSM) store — blocks baked under DIFFERENT avgdl0s
      (streaming/incremental.py:refresh_blocks): the per-block scaling
      collapses exactly to two per-term scalars,
      max_b[imp_b·max(1, avgdl/avgdl0_b)] = max(imp_max, avgdl·ratio)
      with ratio = max_b(imp_b/avgdl0_b) baked by build_block_stats.

    Returns None when the table predates the exact imp_max column (a
    sketch's top point is not contractually the max) or when the store
    is multi-epoch and the table predates the imp_per_avgdl0 column
    (a single collapsed avgdl0 cannot soundly scale bounds baked under
    several) — the caller then runs the Spark bound scan, whose
    per-block impact_bound_expr is drift-safe by construction."""
    from jassjr_spark.constants import K1

    if not block_stats.get("exact_max"):
        return None
    avgdl0 = block_stats.get("avgdl0")
    rng = block_stats.get("avgdl0_range")
    mixed = rng is not None and rng[0] != rng[1]
    terms = block_stats["terms"]
    scale = max(1.0, avgdl / avgdl0) if avgdl0 else 1.0
    out: dict[str, float] = {}
    for t in qterms:
        entry = terms.get(t)
        if entry is None:
            out[t] = K1 + 1.0
            continue
        ratio = entry[3] if len(entry) > 3 else None
        if ratio is not None:
            out[t] = max(entry[2], avgdl * ratio)
        elif mixed:
            return None  # legacy table over a multi-epoch store
        else:
            out[t] = entry[2] * scale
    return out


def _score_subset(index: Index, qrows, idf: dict, pairs: set,
                  qid_type, avgdl: float) -> DataFrame:
    """Score exactly the (query_id, term) occurrence rows in ``pairs``:
    a driver-built (query_id, pos, term, idf) frame broadcast into the
    term-pruned postings scan, then the shared bm25_contrib kernel.
    -> (query_id, docid, pos, contrib)."""
    from jassjr_spark.sources.index_store import pruned_postings

    spark = index.postings.sparkSession
    rows = [
        (r.query_id, r.pos, r.term, idf[r.term])
        for r in qrows
        if (r.query_id, r.term) in pairs and r.term in idf
    ]
    schema = StructType([
        StructField("query_id", qid_type),
        StructField("pos", IntegerType()),
        StructField("term", StringType()),
        StructField("idf", DoubleType()),
    ])
    q = spark.createDataFrame(rows, schema)
    terms = sorted({t for _, _, t, _ in rows})
    if not terms:
        return q.select(
            "query_id", F.lit(0).cast("long").alias("docid"), "pos",
            F.lit(0.0).alias("contrib"),
        ).limit(0)
    postings = pruned_postings(index, terms)
    return (
        postings.join(F.broadcast(q), "term")
        .select("query_id", "docid", "pos", bm25_contrib(avgdl).alias("contrib"))
    )


def maxscore_search(
    index: Index,
    blocks: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    stats: dict | None = None,
    path_out: list | None = None,
    info_out: dict | None = None,
    block_stats: dict | None = None,
) -> DataFrame:
    """-> (query_id, docno, rank, rsv), byte-identical to search().

    ``blocks`` supplies the per-term bounds (metadata columns only).
    ``path_out``/``info_out`` mirror wand_search's introspection: the
    physical path chosen and, per query, θ and the essential /
    non-essential term split (tests assert real pruning happened).
    ``block_stats`` (collect_block_stats): when resident, the per-term
    bound phase runs driver-side (term_upper_bounds_local) instead of
    scanning blocks metadata — the bounds stay true upper bounds, so
    output is still byte-identical (tested).
    """
    from jassjr_spark.operators.search import search as naive_search

    s = stats or index.scalar_stats()
    if k > MAX_PRUNABLE_K:
        # same gate as WAND: θ = the k-th score sits deep in the
        # distribution, the non-essential prefix degenerates to empty
        if path_out is not None:
            path_out.append("postings")
        return naive_search(index, queries, k=k, stats=s)

    qrows = queries.select("query_id", "pos", "term").collect()
    qid_type = queries.schema["query_id"].dataType
    qterms = sorted({r.term for r in qrows})
    n_docs = s["n_docs"]

    # S4/S6/S7 driver-side, the same CPython math.log contract as
    # search.attach_idf (ulp-identity with the reference)
    pairs = [
        (r.term, r.df)
        for r in index.dictionary.filter(F.col("term").isin(qterms))
        .select("term", "df").collect()
    ]
    idf = {t: math.log(n_docs / df) for t, df in pairs if df < n_docs}

    ubs = None
    if block_stats is not None:
        ubs = term_upper_bounds_local(block_stats, sorted(idf), s["avgdl"])
    if ubs is None:
        ubs = term_upper_bounds(index, blocks, sorted(idf), s["avgdl"])

    # per-query bag weights and weighted bounds, driver-side
    by_q: dict = {}
    for r in qrows:
        if r.term in idf:
            by_q.setdefault(r.query_id, {}).setdefault(r.term, 0)
            by_q[r.query_id][r.term] += 1
    wub = {
        qid: sorted(
            ((w * idf[t] * ubs.get(t, float("inf")), t)
             for t, w in terms.items()),
        )
        for qid, terms in by_q.items()
    }

    # --- θ seed: the single top-bound term per query, scored fully
    e0 = {(qid, tub[-1][1]) for qid, tub in wub.items() if tub}
    scored_e0 = _score_subset(index, qrows, idf, e0, qid_type,
                              s["avgdl"]).localCheckpoint(eager=True)
    theta_rows = (
        top_k(accumulate(scored_e0), k)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("rsv").alias("kth"))
        .collect()
    )
    theta = {r.query_id: (r.kth if r.n >= k else 0.0) for r in theta_rows}

    # --- term partition: longest ascending prefix with Σub' < θ − ε
    ess_rest: set = set()
    non_ess: set = set()
    info: dict = {}
    for qid, tub in wub.items():
        th = theta.get(qid, 0.0)
        cum = 0.0
        cut = 0  # terms [0:cut] are non-essential
        for i, (ub, _t) in enumerate(tub[:-1]):  # top term is never demoted
            cum += ub
            if th > 0.0 and cum < th - EPSILON:
                cut = i + 1
            else:
                break
        for i, (_ub, t) in enumerate(tub):
            if i < cut:
                non_ess.add((qid, t))
            elif (qid, t) not in e0:
                ess_rest.add((qid, t))
        info[qid] = {
            "theta": th,
            "essential": len(tub) - cut,
            "non_essential": cut,
        }
    if info_out is not None:
        info_out.update(info)
    if path_out is not None:
        path_out.append("maxscore" if non_ess else "postings")

    scored_ess = _score_subset(index, qrows, idf, ess_rest, qid_type,
                               s["avgdl"])
    parts = [scored_e0, scored_ess]
    if non_ess:
        cand = (
            scored_e0.select("query_id", "docid")
            .unionByName(scored_ess.select("query_id", "docid"))
            .distinct()
        )
        ne_scored = (
            _score_subset(index, qrows, idf, non_ess, qid_type, s["avgdl"])
            .join(cand, ["query_id", "docid"], "left_semi")
        )
        parts.append(ne_scored)
    all_scored = parts[0]
    for p in parts[1:]:
        all_scored = all_scored.unionByName(p)
    ranked = top_k(accumulate(all_scored), k)
    return resolve_docnos(index, ranked, n_docs)

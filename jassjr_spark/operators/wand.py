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

Two-phase, provably rank-safe evaluation, all DataFrame ops, and the
pruning now gates I/O, not just compute:

  A. compute UB per (query, block) from block METADATA only — the scan
     reads (term, block_id, n, max_impact); Parquet column pruning never
     touches the payload bytes. Seed-score the highest-UB blocks that are
     guaranteed to contain ≥ k docs; θ_q = k-th seed score.
  B. keep blocks with UB ≥ θ_q − ε; decode and exact-score ONLY those —
     the payload scan is filtered to the kept block_ids BEFORE the varbyte
     decode (pushed into the Parquet scan when the kept set is small),
     the distributed analogue of the reference's per-term fseek reading
     only the bytes of the lists it needs (JASSjr_search.cpp:197-202).

The exact kernel is the same Column expression as the naive path
(operators/search.py:bm25_contrib) over the decoded (tf, dl) ints, with
the same term-position-ordered float fold, so the output is rank- AND
score-identical to the naive path (asserted in tests against the naive
engine AND the reference oracle). The dl needed by BM25 rides inside the
payload (functions/compression.py), so this path never joins doc_lengths
or touches index.postings at query time.

Safety: a doc in a pruned block has score ≤ UB < θ_q − ε while the true
k-th score ≥ θ_q, so no top-k member is ever pruned; kept docs are
re-scored by the identical kernel. ε = 1e-9 absorbs float-order slack
between the UB summation order and the per-doc fold order (real
discrepancy is ~1 ulp; ε costs a negligible amount of extra scoring).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import TOP_K
from jassjr_spark.functions.compression import DEFAULT_BLOCK_SPAN, decode_blocks
from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import (
    accumulate,
    attach_idf,
    bm25_contrib,
    resolve_docnos,
    score_postings,
    top_k,
)


def _postings_scores(index: Index, queries: DataFrame, qterms: list[str],
                     s: dict, local_dict: dict | None = None,
                     qentries: list | None = None) -> DataFrame:
    """The naive JVM kernel over term-pruned postings — the fallback when
    block pruning cannot pay; bit-identical scores to the blocks path.
    ``local_dict`` forwards an already-collected (term -> df) probe so a
    fallback taken AFTER the driver dictionary probe never re-runs the
    filtered dictionary collect as a second Spark job. ``qentries``
    additionally forwards the driver-side (query_id, pos, term) rows;
    with both present the scoring runs the join-free literal kernel +
    fixed-width accumulate (score_postings_local/accumulate_fixed — one
    map stage, no broadcast build, codegen aggregate; bit-identical rsv)."""
    from jassjr_spark.operators.search import (
        accumulate_fixed, score_postings_local,
    )
    from jassjr_spark.sources.index_store import pruned_postings

    postings = pruned_postings(index, qterms)
    if qentries is not None and local_dict is not None:
        scored = score_postings_local(
            postings, qentries, s["n_docs"], s["avgdl"], local_dict
        )
        max_pos = max((p for _, p, _ in qentries), default=0)
        return accumulate_fixed(scored, max_pos)
    return accumulate(
        score_postings(queries, postings, index.dictionary,
                       s["n_docs"], s["avgdl"], qterms=qterms,
                       local_dict=local_dict)
    )

EPSILON = 1e-9
# Above this k the engine skips straight to the postings kernel (unless
# the caller forces the blocks path): θ = the k-th best score falls deep
# into the score distribution, so almost every block clears it and the
# seed work is wasted — the standard block-max result that pruning pays at
# small k (measured here too: k=10 wins 20-26%, k=1000 never does).
MAX_PRUNABLE_K = 100
# Seed-phase block-count floor per query (see wand_search): enough top-UB
# blocks that θ sees ~k genuinely high-scoring docs, small enough that the
# seed decode stays trivial.
SEED_BLOCKS_MAX = 32
# Below this many kept blocks the block_id filter is inlined as an IN list
# (pushes into the Parquet scan / row-group stats); above it, a broadcast
# semi-join (still before decode, but filtered post-scan).
PUSHDOWN_MAX_BLOCK_IDS = 10_000
# Driver-local gate (block_stats): estimates within this band of the
# decision threshold defer to the exact Spark probe — the Monte-Carlo
# model assumes per-block term independence, which is accurate enough to
# call clear cases but not coin flips.
GATE_BORDERLINE = 0.10
# Monte-Carlo sample count for the driver-local gate: 8192 vectorized
# draws estimate a fraction to ~±0.011 (1σ), an order tighter than the
# borderline band, in ~100 µs of numpy.
GATE_MC_SAMPLES = 8192
# Fewer union-block samples than this and the estimate is noise — defer.
GATE_MIN_UNION_SAMPLES = 64


def _driver_frac_prunable(
    qrows: list,
    local_dict: dict,
    block_stats: dict,
    n_docs: int,
    avgdl: float,
    block_span: int,
) -> float | None:
    """Driver-local estimate of the Spark prunability probe: the fraction
    of (query, candidate-block) pairs whose UB falls under half the
    query's max UB. Returns None when the estimate can't be trusted
    (drifted store, OOV-only queries, too few union samples) — the caller
    then runs the exact probe. The estimate only picks a PHYSICAL PLAN;
    both plans produce bit-identical output, so a wrong call here costs
    time, never correctness.

    Model: blocks are docid ranges shared across terms, so a random
    corpus block contains term t with probability ≈ n_blocks(t) /
    n_corpus_blocks, approximately independently across terms; t's
    impact bound in a block where it appears is a draw from its
    index-time quantile summary (functions/compression.py:
    build_block_stats). Terms below the stats floor are modeled from
    their df with the universal impact ceiling k1+1 (tf→∞ limit of the
    BM25 tf-saturation factor)."""
    import math

    from collections import Counter, defaultdict

    from jassjr_spark.constants import K1
    from jassjr_spark.functions.compression import BLOCK_STATS_FRACTIONS

    rng_a = block_stats.get("avgdl0_range")
    for a in (rng_a if rng_a else (block_stats.get("avgdl0"),)):
        # multi-epoch stores bake blocks under several avgdl0s: refuse
        # if EITHER end of the range has drifted from the current avgdl
        if a and abs(avgdl / a - 1.0) > 0.10:
            return None  # grown store: only the drift-safe Spark bound is fair
    n_corpus_blocks = max(1, -(-n_docs // block_span))
    term_stats = block_stats.get("terms", {})
    per_q: dict = defaultdict(Counter)
    for r in qrows:
        per_q[r.query_id][r.term] += 1
    rng = np.random.default_rng(0x3A55)  # fixed seed: deterministic plans
    fracs = np.asarray(BLOCK_STATS_FRACTIONS, dtype=np.float64)
    S = GATE_MC_SAMPLES
    low = total = 0.0
    for ctr in per_q.values():
        contribs = []
        for t, w in ctr.items():
            df = local_dict.get(t)
            if df is None or df >= n_docs:
                continue  # OOV (inner-join drop) or idf==0 elision
            c = w * math.log(n_docs / df)
            if t in term_stats:
                nb, quantiles = term_stats[t][0], term_stats[t][1]
                imp = np.interp(rng.random(S), fracs, quantiles)
            else:
                # below the stats floor: expected blocks hit by df docs
                # spread over n_corpus_blocks ranges; impact ceiling k1+1
                nb = n_corpus_blocks * (
                    1.0 - (1.0 - 1.0 / n_corpus_blocks) ** df
                )
                imp = K1 + 1.0
            present = rng.random(S) < min(1.0, nb / n_corpus_blocks)
            contribs.append(c * imp * present)
        if not contribs:
            continue
        ub = np.sum(contribs, axis=0)
        union = ub[ub > 0]
        if union.size < GATE_MIN_UNION_SAMPLES:
            return None
        low += float((union < 0.5 * union.max()).sum())
        total += union.size
    if total == 0:
        return None
    return low / total


def impact_bound_expr(meta_columns: list[str], avgdl: float | None):
    """The per-block avgdl-drift-safe impact upper-bound Column (see
    _block_upper_bounds for the safety argument). Shared with the
    term-granular MaxScore pruner (operators/maxscore.py), whose per-term
    bound is the max of this expression over a term's blocks."""
    from jassjr_spark.constants import B, K1

    if avgdl is not None and "max_tf" in meta_columns:
        mtf = F.col("max_tf").cast("double")
        recomputed = (mtf * (K1 + 1.0)) / (
            mtf + K1 * (1.0 - B + B * (F.col("min_dl").cast("double")
                                       / F.lit(float(avgdl))))
        )
        if "avgdl0" in meta_columns:
            scaled = F.col("max_impact") * F.greatest(
                F.lit(1.0), F.lit(float(avgdl)) / F.col("avgdl0")
            )
            return F.least(recomputed, scaled)
        return recomputed
    return F.col("max_impact")


def _block_upper_bounds(
    q_idf: DataFrame, blocks_meta: DataFrame, avgdl: float | None = None,
) -> DataFrame:
    """-> (query_id, block_id, ub, cand_docs).

    cand_docs = max_t n(t, block): a lower bound on the distinct docids in
    the block, used to guarantee the seed set covers >= k docs.

    When the blocks carry (max_tf, min_dl, avgdl0) — every store written
    since the columns were added — and ``avgdl`` is given, the per-block
    impact bound is the TIGHTER of two avgdl-drift-safe bounds under the
    CURRENT avgdl:

    * recomputed: contrib(max_tf, min_dl, avgdl_now) — contrib is
      monotone increasing in tf and decreasing in dl, so this bounds
      every posting under any avgdl (but is loose when max_tf and min_dl
      come from different postings);
    * rescaled baked: max_impact * max(1, avgdl_now/avgdl0) — the baked
      bound froze its build-time avgdl0, which a grown corpus can push
      past (rank-UNSAFE raw), but contribution growth under
      avgdl_now > avgdl0 is capped by the avgdl ratio, so the scaled
      value is safe — and on an undrifted batch store the factor is 1,
      i.e. exactly the original tight bound (no pruning regression).

    Legacy stores without the columns keep the raw baked value (their
    avgdl cannot have drifted: batch stores are written with their
    stats)."""
    weights = q_idf.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("w"),
        F.first("idf").alias("idf"),
    )
    impact = impact_bound_expr(blocks_meta.columns, avgdl)
    return (
        blocks_meta.join(F.broadcast(weights), "term")
        .groupBy("query_id", "block_id")
        .agg(
            F.sum(F.col("w") * F.col("idf") * impact).alias("ub"),
            F.max("n").cast("long").alias("cand_docs"),
        )
    )


def pruned_blocks(index: Index, blocks: DataFrame, terms: list[str]) -> DataFrame:
    """Blocks restricted to ``terms``, with bucket-directory pruning when
    the blocks table is bucket-partitioned (same _meta modulus contract as
    pruned_postings)."""
    from jassjr_spark.sources.index_store import term_bucket_py

    b = blocks
    if "bucket" in b.columns and index.n_buckets > 0:
        buckets = sorted({term_bucket_py(t, index.n_buckets) for t in terms})
        b = b.filter(F.col("bucket").isin(buckets))
    return b.filter(F.col("term").isin(list(terms)))


def wand_search(
    index: Index,
    blocks: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    stats: dict | None = None,
    block_span: int = DEFAULT_BLOCK_SPAN,
    fallback_keep_frac: float = 0.5,
    path_out: list | None = None,
    block_stats: dict | None = None,
    blocks_min_postings: int = 250_000,
    qrows_local: list | None = None,
    local_dict: dict | None = None,
) -> DataFrame:
    """-> (query_id, docno, rank, rsv), identical to search() output.

    ``path_out``: pass a list to receive the physical path the adaptive
    gates chose — "blocks" (pruned decode) or "postings" (naive JVM
    kernel) — so callers (the CLI's --wand) can report which plan actually
    ran; the output is identical either way.

    ``blocks`` is the BLOCK_SCHEMA table built at index time with the same
    avgdl (functions/compression.py:build_blocks) — in memory or read from
    ``{path}/blocks``.

    Adaptive physical choice: pruning effectiveness is DATA-dependent — on
    a corpus whose per-doc tf is flat, every block has the same upper
    bound and θ prunes nothing, so decoding (kept ≈ all) blocks costs more
    than the naive JVM scan it replaces. Phase A is cheap (metadata only),
    so after computing the kept set we read its fraction: below
    ``fallback_keep_frac`` the engine scores from the decoded kept blocks
    (I/O-pruned path); above it, from the term-pruned postings table (the
    naive kernel) — both kernels are bit-identical, so the output never
    depends on the choice (tested). Set fallback_keep_frac=1.0 to force
    the blocks path.

    ``block_stats``: the driver-resident per-term impact summary from
    functions/compression.py:collect_block_stats. When present, the
    prunability probe runs as vectorized numpy on the DRIVER (zero Spark
    jobs before the physical choice — the same architecture as the
    reference, which answers every per-query metadata question from its
    startup-loaded vocab hash map, JASSjr_search.py:65-75); only
    borderline estimates (within GATE_BORDERLINE of the threshold),
    drifted stores, or low-coverage queries defer to the exact Spark
    probe. The choice still never affects output.

    ``qrows_local``: the driver-side (query_id, pos, term) rows, when the
    caller already holds them (text workloads always do — the queries DF
    is built FROM them); skips the per-call queries collect AND routes
    the postings fallback through the join-free literal kernel
    (score_postings_local), bit-identical output. ``local_dict``: an
    already-resident (term -> df) snapshot (operators/search.
    local_dictionary, the reference's startup-loaded vocab) — skips the
    per-call dictionary probe job.

    ``blocks_min_postings``: absolute per-query candidate-postings floor
    (mean over the batch, from the driver dictionary probe — no job)
    below which the naive single-scan kernel is chosen regardless of
    prunability: pruning can save at most the candidate decode+score
    work, while the block machinery costs extra distributed stages
    whose scheduling latency does not shrink with the workload. The
    default is the measured crossover on a 32-core single box (173k-doc
    Zipf, ~140k postings/query: naive 114 ms/query vs blocks 202;
    600k-doc, ~480k/query: blocks wins) — a first-order calibration
    constant, not a law; on a real cluster per-stage latency is higher,
    so if anything the default is too LOW there. Deployments recalibrate
    via BENCH/suite600k_job.py. 0 disables (always consult the
    prunability gate — what tiny-corpus tests do).
    """
    from collections import namedtuple

    s = stats or index.scalar_stats()
    _QRow = namedtuple("_QRow", ["query_id", "pos", "term"])
    if qrows_local is not None:
        qrows = [_QRow(q, p, t) for q, p, t in qrows_local]
        qterms = sorted({r.term for r in qrows})
    elif fallback_keep_frac < 1.0:
        qrows = queries.select("query_id", "pos", "term").collect()
        qterms = sorted({r.term for r in qrows})
    else:
        # forced-blocks callers never consult the floor or the gate, so
        # only the distinct-terms set (bounded by the vocab intersect)
        # crosses to the driver — not Q×T per-occurrence rows
        qrows = None
        qterms = sorted(
            r.term for r in queries.select("term").distinct().collect()
        )
    qentries = (
        [(r.query_id, r.pos, r.term) for r in qrows]
        if qrows is not None else None
    )
    if fallback_keep_frac < 1.0 and k > MAX_PRUNABLE_K:
        if path_out is not None:
            path_out.append("postings")
        scores = _postings_scores(index, queries, qterms, s,
                                  local_dict=local_dict, qentries=qentries)
        return resolve_docnos(index, top_k(scores, k), s["n_docs"])
    # dictionary probe once, driver-side (attach_idf reuses it): both the
    # idf join and the driver-local gate need (term -> df); a caller-
    # resident snapshot (local_dict) makes this a no-op
    if local_dict is None:
        local_dict = {
            r.term: r.df
            for r in index.dictionary.filter(F.col("term").isin(qterms))
            .select("term", "df").collect()
        }
    if fallback_keep_frac < 1.0 and blocks_min_postings > 0:
        # absolute workload floor, before any prunability question:
        # block-max pruning can save AT MOST the decode+score of the
        # query's candidate postings, and its machinery costs extra
        # distributed stages (metadata UB join + per-query threshold
        # window + pushdown decode) whose scheduling latency is a Spark
        # universal, not a host artifact. Below ~10^5 candidate postings
        # per query the single-scan kernel finishes in well under one
        # task-second, so no amount of pruning can repay the extra
        # stages — on THIS box or on a 1000-executor cluster. Measured:
        # 173k-doc Zipf corpus, 50 mixed-df queries — naive 122 ms/query
        # vs gated-blocks 223 ms/query despite a correct >60% prunable
        # estimate (BENCH/suite_173k_zipf_r5_resident.json); at 600k
        # docs (~250k postings/query) blocks wins and the floor passes.
        per_q: dict[str, set] = {}
        for r in qrows:
            per_q.setdefault(r.query_id, set()).add(r.term)
        loads = [
            sum(local_dict.get(t, 0) for t in ts) for ts in per_q.values()
        ]
        if loads and sum(loads) / len(loads) < blocks_min_postings:
            if path_out is not None:
                path_out.append("postings")
            scores = _postings_scores(index, queries, qterms, s,
                                      local_dict=local_dict,
                                      qentries=qentries)
            return resolve_docnos(index, top_k(scores, k), s["n_docs"])
    skip_spark_probe = False
    if fallback_keep_frac < 1.0 and block_stats is not None:
        est = _driver_frac_prunable(
            qrows, local_dict, block_stats, s["n_docs"], s["avgdl"],
            block_span,
        )
        threshold = 1.0 - fallback_keep_frac
        if est is not None and est < threshold - GATE_BORDERLINE:
            if path_out is not None:
                path_out.append("postings")
            scores = _postings_scores(index, queries, qterms, s,
                                      local_dict=local_dict,
                                      qentries=qentries)
            return resolve_docnos(index, top_k(scores, k), s["n_docs"])
        if est is not None and est > threshold + GATE_BORDERLINE:
            skip_spark_probe = True  # clearly prunable: go straight to seeds
    q_idf = attach_idf(queries, index.dictionary, s["n_docs"], qterms=qterms,
                       local_dict=local_dict)
    blocks_q = pruned_blocks(index, blocks, qterms)

    # --- phase A: UB per (query, block) from metadata columns only (the
    # payload column is never materialized here — column pruning)
    meta_cols = ["term", "block_id", "n", "max_impact"]
    if "max_tf" in blocks_q.columns:  # avgdl-drift-safe bound ingredients
        meta_cols += ["max_tf", "min_dl"]
        if "avgdl0" in blocks_q.columns:
            meta_cols.append("avgdl0")
    meta = blocks_q.select(*meta_cols)
    ub = _block_upper_bounds(q_idf, meta, avgdl=s["avgdl"]).cache()

    # Prunability probe BEFORE paying for seed scoring: θ can never exceed
    # a query's max block UB, so only blocks with UB well under that max
    # are even candidates for pruning. If UBs are flat (synthetic corpora
    # with uniform tf; conjunctions of same-df terms), skip phase B's
    # decode entirely and score the term-pruned postings with the
    # identical JVM kernel — output is bit-identical either way (tested).
    if fallback_keep_frac < 1.0 and not skip_spark_probe:
        wq = Window.partitionBy("query_id")
        frac_prunable = (
            ub.withColumn("qmax", F.max("ub").over(wq))
            .agg(F.avg((F.col("ub") < 0.5 * F.col("qmax")).cast("double")))
            .first()[0]
        ) or 0.0
        if frac_prunable < 1.0 - fallback_keep_frac:
            ub.unpersist()  # nothing downstream references it
            if path_out is not None:
                path_out.append("postings")
            scores = _postings_scores(index, queries, qterms, s,
                                      local_dict=local_dict,
                                      qentries=qentries)
            return resolve_docnos(index, top_k(scores, k), s["n_docs"])

    # seed blocks: highest UB until >= k candidate docs AND at least
    # min(k, 32) blocks -> θ. The block-count floor matters: one block
    # guarantees k docs numerically, but its k-th best ACTUAL doc may have
    # matched only the weakest query term (θ ≈ min UB ⇒ zero pruning);
    # the high-score docs that make θ sharp are spread ~one per top-UB
    # block, so seed ~k of them.
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
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("cum_before") < k) | (F.col("rn") <= min(k, SEED_BLOCKS_MAX))
        )
        .select("query_id", "block_id")
    )
    seed_scores = _exact_scores(q_idf, blocks_q, seeds, s["avgdl"], block_span)
    kth = (
        top_k(seed_scores, k)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("rsv").alias("theta"))
        .withColumn(
            "theta", F.when(F.col("n") >= k, F.col("theta")).otherwise(F.lit(0.0))
        )
        .select("query_id", "theta")
    )

    # --- phase B: keep blocks whose UB clears θ − ε, decode+score, top-k
    # The kept-fraction gate counts the UNPERSISTED plan first, so a
    # fallback decision leaves nothing behind (the r3 shape checkpointed
    # before deciding and the materialized blocks outlived the fallback —
    # ADVICE r3). Only the blocks path localCheckpoints: the kept set is
    # consumed by TWO actions (_exact_scores' ids collect, then the
    # caller's), which must see ONE materialization; cache() would pin an
    # entry per call for the session's lifetime (REPL / driver), while
    # checkpointed partitions are freed by the ContextCleaner when the
    # result plan is garbage-collected. Loss of a stored partition fails
    # the query loudly instead of recomputing under a different θ.
    kept_plan = (
        ub.join(F.broadcast(kth), "query_id", "left")
        .filter(
            F.col("ub") >= F.coalesce(F.col("theta"), F.lit(0.0)) - EPSILON
        )
        .select("query_id", "block_id")
    )
    n_total = ub.count()
    n_kept = kept_plan.count()
    if n_total > 0 and n_kept / n_total > fallback_keep_frac:
        # θ turned out weaker than the probe predicted: pruning still
        # won't pay for the decode — same JVM-kernel fallback
        ub.unpersist()
        if path_out is not None:
            path_out.append("postings")
        final_scores = _postings_scores(index, queries, qterms, s,
                                        local_dict=local_dict,
                                        qentries=qentries)
    else:
        if path_out is not None:
            path_out.append("blocks")
        kept = kept_plan.localCheckpoint(eager=True)
        ub.unpersist()  # kept is materialized; ub no longer needed
        final_scores = _exact_scores(q_idf, blocks_q, kept, s["avgdl"],
                                     block_span)
    return resolve_docnos(index, top_k(final_scores, k), s["n_docs"])


def _exact_scores(
    q_idf: DataFrame, blocks_q: DataFrame, block_subset: DataFrame,
    avgdl: float, block_span: int,
) -> DataFrame:
    """Exact (query_id, docid, rsv) over ONLY the (query_id, block_id)
    subset: the payload scan is restricted to the union of kept block ids
    BEFORE the varbyte decode, then the decoded postings join the query
    (broadcast) and the per-query kept set filters exactly."""
    ids = [r.block_id for r in block_subset.select("block_id").distinct()
           .limit(PUSHDOWN_MAX_BLOCK_IDS + 1).collect()]
    if len(ids) <= PUSHDOWN_MAX_BLOCK_IDS:
        sub = blocks_q.filter(F.col("block_id").isin(ids))
    else:
        sub = blocks_q.join(
            F.broadcast(block_subset.select("block_id").distinct()),
            "block_id", "left_semi",
        )
    decoded = decode_blocks(sub.select("term", "block_id", "payload"),
                            block_span)
    scored = (
        decoded.join(
            F.broadcast(q_idf.select("query_id", "pos", "term", "idf")), "term"
        )
        .withColumn("block_id", (F.col("docid") / block_span).cast("long"))
        .join(F.broadcast(block_subset), ["query_id", "block_id"], "left_semi")
        .select("query_id", "docid", "pos", bm25_contrib(avgdl).alias("contrib"))
    )
    return accumulate(scored)

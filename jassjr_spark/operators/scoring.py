"""Pluggable ranking similarities beyond ATIRE-BM25, plus result-set
gating and static-prior fusion — the scoring knobs every production
engine exposes that the reference hardcodes away (JASSjr_search.py:24-25
pins k1/b; its scorer is the single compiled-in BM25 loop,
JASSjr_search.cpp:205-224).

All scorers reuse the engine's plan shape (operators/search.py):
pruned postings scan -> broadcast query join -> pure-Column per-posting
contribution -> deterministic term-position-ordered fold -> windowed
top-k. Only the contribution expression changes, so every property the
BM25 path earned (term pushdown, no Python in the hot loop, whole-stage
codegen, skew behavior) carries over verbatim.

Scorers
-------
- ``lm_dirichlet_search``: query-likelihood with Dirichlet smoothing
  (Zhai & Lafferty, SIGIR 2001), the Lucene ``LMDirichletSimilarity``
  shape: each MATCHED posting contributes

      ln(1 + tf / (mu * cf_t / C)) + ln(mu / (dl + mu))

  (C = total term occurrences in the collection). Matched-only
  semantics, like the reference's hashmap accumulator: unmatched docs
  are not scored, and scores may be negative, so no rsv>0 cut.
- ``tfidf_search``: the Lucene-classic TF-IDF shape:

      sqrt(tf) * idf^2 / sqrt(dl),   idf = 1 + ln(N / (df + 1))

  idf is computed driver-side with CPython ``math.log`` (the same
  libm discipline as attach_idf); sqrt/divide are IEEE-exact, so this
  scorer is bit-reproducible across engines.

Gating / fusion
---------------
- ``search_msm``: minimum-should-match — a document qualifies only if
  it matches at least ``min_match`` distinct scorable query terms
  (Lucene's ``minimumShouldMatch``). The match count rides the SAME
  aggregation as the score fold (no extra shuffle); ``min_match=1`` is
  plain disjunctive search, ``min_match=#terms`` is boolean AND.
- ``function_score``: fuse the text score with a static per-document
  prior (recency, pagerank, length prior, ...) BEFORE ranking:
  ``rsv * boost`` or ``rsv + boost``. The boost table joins against the
  matched set (<= matched docs rows), not the corpus, and docs absent
  from the boost table get the neutral element.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.constants import TOP_K
from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import (
    accumulate,
    attach_idf,
    bm25_contrib,
    resolve_docnos,
    score_postings,
)

DEFAULT_MU = 2000.0


def _qterms(queries: DataFrame, qterms: list[str] | None) -> list[str]:
    if qterms is None:
        qterms = [r.term for r in queries.select("term").distinct().collect()]
    return qterms


def _ranked(
    acc: DataFrame, k: int, positive_only: bool,
    round_to: int | None = None,
) -> DataFrame:
    """Window top-k over (rsv desc, docid desc) — the engine's S9/S10
    shape, with the rsv>0 cut optional because LM scores are signed.
    ``round_to`` rounds rsv BEFORE ranking (the repo's cross-engine
    reproducibility discipline: rounded scores + docid tie-break rank
    identically on engines whose float-sum order differs). The +0.0
    normalizes IEEE -0.0 — round() of a tiny negative score yields -0.0
    on some engines and 0.0 on others, which value-hash-diverges."""
    from pyspark.sql import Window

    if round_to is not None:
        acc = acc.withColumn("rsv", F.round("rsv", round_to) + F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    base = acc.filter(F.col("rsv") > 0.0) if positive_only else acc
    return (
        base.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def lm_dirichlet_search(
    index: Index, queries: DataFrame, mu: float = DEFAULT_MU,
    k: int = TOP_K, stats: dict | None = None,
    qterms: list[str] | None = None, resolve: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing over the same
    pruned-postings plan as BM25. Per matched posting:

        ln(1 + tf / prior_t) + ln(mu / (dl + mu)),
        prior_t = mu * cf_t / C

    ``prior_t`` is per-TERM and the query set is tiny, so it is computed
    driver-side (CPython float ops — exact, deterministic) and rides the
    broadcast query frame; only the two ``ln`` calls and the fold run
    distributed. OOV terms drop via the inner join. df==N terms are NOT
    elided — unlike idf, the LM contribution of a ubiquitous term is
    finite and meaningful. Scores may be negative: no rsv>0 cut.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    c_total = float(s["total_terms"])
    qterms = _qterms(queries, qterms)
    spark = queries.sparkSession

    rows = (
        index.dictionary.filter(F.col("term").isin(qterms))
        .select("term", "cf").collect()
    )
    # mu * cf / C in this exact order — the SQL oracle mirrors it so the
    # IEEE sequence (one multiply, one divide) is bitwise identical.
    priors = [(r.term, mu * r.cf / c_total) for r in rows]
    prior_df = spark.createDataFrame(priors, "term string, prior double")
    q = queries.join(F.broadcast(prior_df), "term")

    postings = pruned_postings(index, qterms)
    joined = postings.join(
        F.broadcast(q.select("query_id", "pos", "term", "prior")), "term"
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    contrib = (
        F.log(F.lit(1.0) + tf / F.col("prior"))
        + F.log(F.lit(mu) / (dl + F.lit(mu)))
    )
    scored = joined.select("query_id", "docid", "pos",
                           contrib.alias("contrib"))
    ranked = _ranked(accumulate(scored), k, positive_only=False,
                     round_to=round_to)
    if not resolve:
        return ranked
    return resolve_docnos(index, ranked, s["n_docs"])


def tfidf_search(
    index: Index, queries: DataFrame, k: int = TOP_K,
    stats: dict | None = None, qterms: list[str] | None = None,
    resolve: bool = True, round_to: int | None = None,
) -> DataFrame:
    """Lucene-classic TF-IDF ranking: sqrt(tf) * idf^2 / sqrt(dl) with
    idf = 1 + ln(N/(df+1)), idf^2 computed driver-side in CPython (libm
    log + exact multiply). Every distributed op (sqrt, divide, ordered
    fold) is IEEE-exact, so scores are bit-reproducible. idf > 0 always
    (the +1 smoothing), so the rsv>0 cut is equivalent to matched-only.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    n_docs = s["n_docs"]
    qterms = _qterms(queries, qterms)
    spark = queries.sparkSession

    rows = (
        index.dictionary.filter(F.col("term").isin(qterms))
        .select("term", "df").collect()
    )
    weights = []
    for r in rows:
        idf = 1.0 + math.log(n_docs / (r.df + 1.0))
        weights.append((r.term, idf * idf))
    w_df = spark.createDataFrame(weights, "term string, w double")
    q = queries.join(F.broadcast(w_df), "term")

    postings = pruned_postings(index, qterms)
    joined = postings.join(
        F.broadcast(q.select("query_id", "pos", "term", "w")), "term"
    )
    contrib = (
        F.sqrt(F.col("tf").cast("double")) * F.col("w")
        / F.sqrt(F.col("dl").cast("double"))
    )
    scored = joined.select("query_id", "docid", "pos",
                           contrib.alias("contrib"))
    ranked = _ranked(accumulate(scored), k, positive_only=True,
                     round_to=round_to)
    if not resolve:
        return ranked
    return resolve_docnos(index, ranked, s["n_docs"])


def search_msm(
    index: Index, queries: DataFrame, min_match: int, k: int = TOP_K,
    stats: dict | None = None, resolve: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """Minimum-should-match disjunctive BM25: rank only documents that
    match at least ``min_match`` DISTINCT scorable query terms; the
    score is the usual full BM25 sum over the matched terms. Lucene
    ``minimumShouldMatch`` semantics: if a query has fewer scorable
    terms than ``min_match`` it returns nothing (OOV and df==N terms
    cannot count toward the requirement — the former match no doc, the
    latter are elided from scoring).

    Plan shape == search_conjunctive: one ``count(DISTINCT term)``
    added to the SAME aggregation as the rsv fold (no extra shuffle),
    then a scalar ``matched >= min_match`` filter BEFORE the top-k
    window, so the window sees only the gated candidate set.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    if min_match < 1:
        raise ValueError(f"min_match must be >= 1, got {min_match}")
    s = stats or index.scalar_stats()
    n_docs = s["n_docs"]
    qterms = _qterms(queries, None)
    q = attach_idf(queries, index.dictionary, n_docs, qterms=qterms)

    postings = pruned_postings(index, qterms)
    scored = postings.join(
        F.broadcast(q.select("query_id", "pos", "term", "idf")), "term"
    ).select("query_id", "docid", "term", "pos",
             bm25_contrib(s["avgdl"]).alias("contrib"))
    acc = (
        scored.groupBy("query_id", "docid")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "contrib"))),
                F.lit(0.0),
                lambda a, x: a + x["contrib"],
            ).alias("rsv"),
            F.countDistinct("term").cast("long").alias("matched"),
        )
        .filter(F.col("matched") >= F.lit(min_match))
        .select("query_id", "docid", "rsv")
    )
    ranked = _ranked(acc, k, positive_only=True, round_to=round_to)
    if not resolve:
        return ranked
    return resolve_docnos(index, ranked, n_docs)


def function_score(
    index: Index, queries: DataFrame, doc_boosts: DataFrame,
    mode: str = "multiply", k: int = TOP_K, stats: dict | None = None,
    qterms: list[str] | None = None, resolve: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """Static-prior fusion (Lucene/ES ``function_score``): combine the
    BM25 text score with a per-document boost BEFORE ranking —
    ``rsv * boost`` (mode "multiply") or ``rsv + boost`` (mode "sum").

    ``doc_boosts`` is (docid long, boost double), typically an
    index-time artifact (recency decay, link prior, quality score).
    Documents absent from it get the neutral element (1.0 / 0.0) — the
    boost table may cover any subset of the corpus.

    Plan shape: the boost join runs on the ACCUMULATED matched set
    (one row per (query, matched doc)), not on postings, so the extra
    join input is bounded by the match count, and it runs BEFORE the
    top-k window because boosts reorder candidates. At corpus scale the
    boost side is doc-count-sized: a plain shuffle hash join on docid —
    co-partitionable with the accumulate output, and prunable further
    if the boost table is bucketed by docid.
    """
    if mode not in ("multiply", "sum"):
        raise ValueError(f"mode must be 'multiply' or 'sum', got {mode!r}")
    s = stats or index.scalar_stats()
    from jassjr_spark.sources.index_store import pruned_postings

    qterms = _qterms(queries, qterms)
    postings = pruned_postings(index, qterms)
    scored = score_postings(queries, postings, index.dictionary,
                            s["n_docs"], s["avgdl"], qterms=qterms)
    acc = accumulate(scored)
    neutral = 1.0 if mode == "multiply" else 0.0
    boosted = acc.join(
        doc_boosts.select("docid", "boost"), "docid", "left"
    ).withColumn("boost", F.coalesce("boost", F.lit(neutral)))
    rsv = (
        F.col("rsv") * F.col("boost") if mode == "multiply"
        else F.col("rsv") + F.col("boost")
    )
    fused = boosted.select("query_id", "docid", rsv.alias("rsv"))
    # BM25 rsv > 0 and multiplicative boosts are conventionally > 0; for
    # additive fusion signed boosts are legal, so keep all matched docs.
    ranked = _ranked(fused, k, positive_only=(mode == "multiply"),
                     round_to=round_to)
    if not resolve:
        return ranked
    return resolve_docnos(index, ranked, s["n_docs"])

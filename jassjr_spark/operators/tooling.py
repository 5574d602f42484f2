"""Diagnostic/verification operators — SURVEY.md §2.3 T1-T3 parity, plus a
trec_eval-style quality scorer (the reference's §5 layer-4 evaluation,
README.md:101-134, computed by the external trec_eval binary there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from jassjr_spark.operators.index_build import Index


def index_stats(index: Index) -> DataFrame:
    """T1 (tools/index_stats.py:33-58): N, avgdl, min/max doclen, vocab
    size, heaviest term (largest postings list)."""
    lens = index.doc_lengths.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.min("len").cast("long").alias("min_len"),
        F.max("len").cast("long").alias("max_len"),
    )
    heaviest = (
        index.dictionary.orderBy(F.col("df").desc(), F.col("term"))
        .limit(1)
        .select(
            F.col("term").alias("heaviest_term"),
            F.col("df").alias("heaviest_df"),
        )
    )
    vocab = index.dictionary.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    return lens.crossJoin(vocab).crossJoin(heaviest)


def vocab_diff(dict_a: DataFrame, dict_b: DataFrame) -> DataFrame:
    """T2 (tools/vocab_diff.py:30-88): vocabulary comparison of two
    dictionaries -> (term, df_a, df_b, status) for every discrepancy:
    'only_a' / 'only_b' / 'df_mismatch'. Empty result == same index
    vocabulary (the tool's exit-0 condition)."""
    a = dict_a.select("term", F.col("df").alias("df_a"))
    b = dict_b.select("term", F.col("df").alias("df_b"))
    joined = a.join(b, "term", "full_outer")
    return joined.select(
        "term",
        "df_a",
        "df_b",
        F.when(F.col("df_b").isNull(), F.lit("only_a"))
        .when(F.col("df_a").isNull(), F.lit("only_b"))
        .when(F.col("df_a") != F.col("df_b"), F.lit("df_mismatch"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


def show_document(docs: DataFrame, docno: str) -> DataFrame:
    """T3 (tools/show_document.cpp:25-78): fetch raw document by docno."""
    return docs.filter(F.col("docno") == docno)


def term_vector(
    index: Index, docs: DataFrame, docno: str, prepend_docno: bool = False
) -> DataFrame:
    """Per-document term vector -> (term, tf, df): Lucene's TermVectors /
    the termvectors API of production engines (the reference exposes only
    whole-document fetch, tools/show_document.cpp:25-78).

    Access-path choice: re-tokenize the FORWARD document — a one-doc plan
    whose docno predicate pushes into the documents scan — rather than
    filtering the term-partitioned postings store, where a docid predicate
    reads every term bucket (the inverted layout is the wrong access path
    for a one-doc question; engines keep a forward/stored view for this).
    df rides in from the dictionary via a broadcast of the doc's own
    (bounded-by-doclen) term set; terms absent from the CURRENT dictionary
    are dropped (inner join) — the vector describes the indexed corpus.
    ``prepend_docno`` must match how the index was built."""
    from jassjr_spark.functions.tokenize import doc_term_frequencies

    one = docs.filter(F.col("docno") == docno)
    tfs = doc_term_frequencies(one, prepend_docno=prepend_docno).select(
        "term", F.col("tf").cast("long").alias("tf")
    )
    return (
        index.dictionary.join(F.broadcast(tfs), "term")
        .select("term", "tf", F.col("df").cast("long").alias("df"))
    )


def explain_score(
    index: Index, terms: list[str], docno: str, stats: dict | None = None
) -> DataFrame:
    """Scoring explanation -> one row per scorable query term matching the
    doc: (term, tf, df, dl, idf, contrib) with ``sum(contrib)`` == the
    doc's rsv in ``search`` — Lucene's Explanation / the _explain API.
    Same elision rules as the engine (OOV and df==N terms are absent),
    same CPython-idf + shared bm25_contrib kernel, so the breakdown IS
    the score, not a re-derivation. idf/contrib rounded to 6 dp for
    cross-engine display stability.

    Plan: one docno probe on the docids table + the standard pruned
    postings fetch filtered to that docid — never a corpus scan."""
    from jassjr_spark.operators.search import attach_idf, bm25_contrib
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    spark = index.dictionary.sparkSession
    hit = index.docids.filter(F.col("docno") == docno).collect()
    if not hit:
        return spark.createDataFrame(
            [], "term string, tf long, df long, dl long, idf double, "
                "contrib double")
    docid = hit[0].docid
    qterms = sorted(set(terms))
    queries = spark.createDataFrame(
        [(0, i, t) for i, t in enumerate(qterms)],
        "query_id long, pos int, term string",
    )
    q = attach_idf(queries, index.dictionary, s["n_docs"], qterms=qterms)
    return (
        pruned_postings(index, qterms)
        .filter(F.col("docid") == docid)
        .join(F.broadcast(q.select("term", "idf")), "term")
        .join(F.broadcast(index.dictionary
                          .filter(F.col("term").isin(qterms))
                          .select("term", "df")), "term")
        .select(
            "term", F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("dl").cast("long").alias("dl"),
            F.round("idf", 6).alias("idf"),
            F.round(bm25_contrib(s["avgdl"]), 6).alias("contrib"),
        )
    )


def suggest_terms(
    index: Index, word: str, max_dist: int = 2, k: int = 5
) -> DataFrame:
    """Did-you-mean: dictionary terms within edit distance ``max_dist``
    of ``word`` -> (term, dist, df, cf, rank), best-first. The standard
    spell-correction companion to a search engine (the reference has
    none); ranked by (distance asc, cf desc, term asc) — closest first,
    popularity breaks distance ties, spelling breaks popularity ties, so
    the cut at k is deterministic and cross-engine stable.

    Scale shape: a vocab-sized scan, not a corpus-sized one, and the
    cheap ``abs(len-len(word)) <= max_dist`` band filter prunes before
    the O(len^2) levenshtein runs (a Parquet-pushable predicate on a
    dictionary sorted/min-maxed by a length column, if persisted so).
    Spark's bounded variant levenshtein(l, r, threshold) would cap the
    DP early; the unbounded form is kept for oracle parity.
    """
    dist = F.levenshtein(F.col("term"), F.lit(word))
    w = Window.orderBy(
        F.col("dist").asc(), F.col("cf").desc(), F.col("term").asc()
    )
    return (
        index.dictionary
        .filter(
            F.abs(F.length("term") - F.lit(len(word))) <= max_dist
        )
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("term", "dist", F.col("df").cast("long").alias("df"),
                "cf", "rank")
    )


TREC_EVAL_CUTOFFS = (5, 10, 15, 20, 30, 100, 200, 500, 1000)


def trec_eval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    key: str = "docno",
    cutoffs: tuple = TREC_EVAL_CUTOFFS,
    include_summary: bool = True,
) -> DataFrame:
    """trec_eval parity for a TREC run (query_id, <key>, rank, rsv) and
    qrels (query_id, <key>, rel) — the reference's published table
    (README.md:104-133): per-query rows plus (include_summary) an 'all'
    row matching trec_eval's aggregate semantics (counts are sums, metric
    columns are means over queries).

    Columns: query_id ('all' on the summary row), num_q, num_ret, num_rel,
    num_rel_ret, map (per-query: AP), recip_rank, rprec,
    p_at_{5,10,15,20,30,100,200,500,1000}, recall (num_rel_ret/num_rel at
    the run depth). Pure window math; AP divides by the TOTAL relevant
    count (trec_eval's definition), so a truncated run yields truncated-AP
    exactly as trec_eval would report it for that run.
    """
    rel = qrels.filter(F.col("rel") > 0).select(
        "query_id", key, F.lit(1).alias("is_rel")
    )
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("num_rel")
    )
    j = (
        run.join(rel, ["query_id", key], "left")
        .withColumn("is_rel", F.coalesce("is_rel", F.lit(0)))
        .join(F.broadcast(n_rel), "query_id", "left")
        .withColumn("num_rel", F.coalesce("num_rel", F.lit(0)))
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    j = j.withColumn("cum_rel", F.sum("is_rel").over(w)).withColumn(
        "prec_at_rank", F.col("cum_rel") / F.col("rank")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("num_ret"),
        F.first("num_rel").alias("num_rel"),
        F.sum("is_rel").cast("long").alias("num_rel_ret"),
        F.sum(F.when(F.col("is_rel") == 1, F.col("prec_at_rank"))).alias("sum_prec"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when((F.col("is_rel") == 1) & (F.col("rank") <= F.col("num_rel")), 1)
            .otherwise(0)
        ).alias("rel_in_top_r"),
    ]
    for c in cutoffs:
        aggs.append(
            F.sum(F.when((F.col("rank") <= c) & (F.col("is_rel") == 1), 1)
                  .otherwise(0)).alias(f"rel_at_{c}")
        )
    per_q = j.groupBy("query_id").agg(*aggs)

    def _safe_div(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    # Unrounded per-query metric expressions. trec_eval averages the
    # UNROUNDED per-query values into its 'all' row and rounds only the
    # display, so the summary must be computed from these raw columns —
    # averaging the already-rounded display values can drift by ~5e-5.
    raw: dict[str, object] = {
        "map": _safe_div(F.coalesce("sum_prec", F.lit(0.0)), F.col("num_rel")),
        "recip_rank": F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)),
        "rprec": _safe_div(F.col("rel_in_top_r").cast("double"),
                           F.col("num_rel")),
    }
    for c in cutoffs:
        raw[f"p_at_{c}"] = F.col(f"rel_at_{c}") / float(c)
    raw["recall"] = _safe_div(F.col("num_rel_ret").cast("double"),
                              F.col("num_rel"))
    metric_cols = list(raw)

    cols = [
        F.col("query_id").cast("string").alias("query_id"),
        F.lit(1).cast("long").alias("num_q"),
        "num_ret",
        "num_rel",
        "num_rel_ret",
        *[F.round(expr, 4).alias(m) for m, expr in raw.items()],
        *[expr.alias(f"_{m}_raw") for m, expr in raw.items()],
    ]
    with_raw = per_q.select(*cols)
    out = with_raw.drop(*[f"_{m}_raw" for m in metric_cols])
    if not include_summary:
        return out

    summary = with_raw.agg(
        F.count(F.lit(1)).cast("long").alias("num_q"),
        F.sum("num_ret").cast("long").alias("num_ret"),
        F.sum("num_rel").cast("long").alias("num_rel"),
        F.sum("num_rel_ret").cast("long").alias("num_rel_ret"),
        *[F.round(F.avg(f"_{m}_raw"), 4).alias(m) for m in metric_cols],
    ).select(
        F.lit("all").alias("query_id"), "num_q", "num_ret", "num_rel",
        "num_rel_ret", "map", "recip_rank", "rprec",
        *[f"p_at_{c}" for c in cutoffs], "recall",
    )
    return out.unionByName(summary)


def complete_prefix(index: Index, prefix: str, k: int = 10) -> DataFrame:
    """Query autocomplete: the dictionary's top-k terms starting with
    ``prefix``, ranked by collection frequency (ties: term asc — the
    (cf, term) key is unique per term, so the cut is deterministic).
    The companion to suggest_terms (did-you-mean); on the persisted
    term-sorted dictionary the startswith filter is a pushed range scan.
    """
    return (
        index.dictionary.filter(F.col("term").startswith(prefix))
        .orderBy(F.col("cf").desc(), F.col("term"))
        .limit(k)
        .select("term", F.col("df").cast("long"), F.col("cf").cast("long"))
    )


def related_terms(
    index: Index, term: str, k: int = 10, min_co: int = 2
) -> DataFrame:
    """"Related searches": terms co-occurring with ``term``, ranked by
    LIFT = n_co / df — order-equivalent to PMI for a fixed seed term
    (PMI = ln(N * n_co / (df_seed * df)) is monotone in n_co/df), but
    computed with ONE correctly-rounded double division so the ranking
    and the emitted score are bitwise-reproducible cross-engine (a
    JVM-vs-libm ``ln`` can drift an ulp; a division cannot).

    Plan: the seed's postings project to a docid set, broadcast into one
    postings probe (the PRF mining shape, operators/prf.py), then a
    vocab-sized count + dictionary join. ``min_co`` kills the long tail
    of one-off co-occurrences.
    """
    seed_docs = (
        index.postings.filter(F.col("term") == term).select("docid")
    )
    # broadcast only when the seed's postings verifiably fit (driver df
    # probe, like S4) — a stopword seed must shuffle-join instead
    row = index.dictionary.filter(F.col("term") == term).select("df").first()
    seed_df = row.df if row else 0
    probe = F.broadcast(seed_docs) if seed_df <= 5_000_000 else seed_docs
    co = (
        index.postings.join(probe, "docid")
        .filter(F.col("term") != term)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .filter(F.col("n_co") >= min_co)
    )
    return (
        co.join(index.dictionary.select("term", "df"), "term")
        .withColumn(
            "lift",
            (F.col("n_co").cast("double") * F.lit(1.0)) / F.col("df").cast("double"),
        )
        .orderBy(F.col("lift").desc(), F.col("term"))
        .limit(k)
        .select("term", "n_co", F.col("df").cast("long"), "lift")
    )


def ndcg_at(
    run: DataFrame, qrels: DataFrame, k: int = 10, key: str = "docid",
    include_summary: bool = True,
) -> DataFrame:
    """Binary-gain NDCG@k per query plus the trec_eval-style 'all' row
    (mean of the UNROUNDED per-query values, then rounded — the same
    averaging discipline as trec_eval_metrics):

        dcg  = sum over relevant ranked hits (rank <= k) of 1/log2(rank+1)
        idcg = sum_{i=1..min(R, k)} 1/log2(i+1)      (R = #relevant)

    Queries with no relevant document are dropped (idcg undefined), as
    trec_eval does. 4-decimal rounding absorbs cross-engine float-sum
    order and log2 ulp variation, per the repo-wide rounding discipline.
    """
    hits = run.filter(F.col("rank") <= k).join(
        qrels.select("query_id", key), ["query_id", key]
    )
    dcg = hits.groupBy("query_id").agg(
        F.sum(F.lit(1.0) / F.log2(F.col("rank").cast("double") + F.lit(1.0)))
        .alias("dcg")
    )
    ideal = (
        qrels.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("nrel"))
        .withColumn(
            "idcg",
            F.aggregate(
                F.sequence(F.lit(1), F.least(F.col("nrel"), F.lit(k))),
                F.lit(0.0),
                lambda a, i: a
                + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
            ),
        )
        .filter(F.col("nrel") > 0)
    )
    per_q = (
        ideal.join(dcg, "query_id", "left")
        .withColumn(
            "_raw", F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
        )
    )
    out = per_q.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.round("_raw", 4).alias("ndcg"),
    )
    if not include_summary:
        return out
    summary = per_q.agg(F.round(F.avg("_raw"), 4).alias("ndcg")).select(
        F.lit("all").alias("query_id"), "ndcg"
    )
    return out.unionByName(summary)


def bpref_metric(
    run: DataFrame, qrels: DataFrame, key: str = "docid",
    include_summary: bool = True,
) -> DataFrame:
    """bpref (Buckley & Voorhees, SIGIR 2004; trec_eval's m_bpref) per
    query plus the 'all' mean row — the judged-only metric that stays
    stable under INCOMPLETE judgments, which MAP is not:

        bpref = 1/R * sum over retrieved RELEVANT docs of
                1 - min(nonrel_above, R) / min(R, N)

    where nonrel_above counts JUDGED-nonrelevant docs (qrels rel == 0)
    ranked above the relevant doc, R = judged relevant, N = judged
    nonrelevant (trec_eval's branch: divide by R when N > R, else by N).
    Unjudged retrieved docs contribute nothing anywhere — the metric's
    point. Queries with R == 0 are dropped (as trec_eval does); N == 0
    makes every term 1 (no evidence against any hit). 6-dp rounding on
    display, mean over UNROUNDED per-query values for 'all'.
    """
    labeled = qrels.select(
        "query_id", key,
        F.when(F.col("rel") > 0, 1).otherwise(0).alias("is_rel"),
        F.when(F.col("rel") > 0, 0).otherwise(1).alias("is_jnr"),
    )
    counts = labeled.groupBy("query_id").agg(
        F.sum("is_rel").cast("long").alias("num_rel"),
        F.sum("is_jnr").cast("long").alias("num_jnr"),
    ).filter(F.col("num_rel") > 0)
    j = (
        run.join(labeled, ["query_id", key], "left")
        .withColumn("is_rel", F.coalesce("is_rel", F.lit(0)))
        .withColumn("is_jnr", F.coalesce("is_jnr", F.lit(0)))
        .join(F.broadcast(counts), "query_id")
    )
    above = Window.partitionBy("query_id").orderBy("rank") \
        .rowsBetween(Window.unboundedPreceding, -1)
    nr_above = F.coalesce(F.sum("is_jnr").over(above), F.lit(0)) \
        .cast("double")
    r = F.col("num_rel").cast("double")
    n = F.col("num_jnr").cast("double")
    term = F.when(F.col("num_jnr") == 0, F.lit(1.0)).otherwise(
        F.when(n > r, 1.0 - F.least(nr_above, r) / r)
        .otherwise(1.0 - nr_above / n)
    )
    per_q = (
        j.withColumn("_term", F.when(F.col("is_rel") == 1, term))
        .groupBy("query_id")
        .agg(
            F.first("num_rel").alias("num_rel"),
            F.first("num_jnr").alias("num_jnr"),
            (F.coalesce(F.sum("_term"), F.lit(0.0))
             / F.first("num_rel").cast("double")).alias("_raw"),
        )
    )
    out = per_q.select(
        F.col("query_id").cast("string").alias("query_id"),
        "num_rel", "num_jnr", F.round("_raw", 6).alias("bpref"),
    )
    if not include_summary:
        return out
    summary = per_q.agg(
        F.sum("num_rel").alias("num_rel"),
        F.sum("num_jnr").alias("num_jnr"),
        F.round(F.avg("_raw"), 6).alias("bpref"),
    ).select(F.lit("all").alias("query_id"), "num_rel", "num_jnr", "bpref")
    return out.unionByName(summary)


def err_metric(
    run: DataFrame, qrels: DataFrame, k: int = 10, key: str = "docid",
    include_summary: bool = True,
) -> DataFrame:
    """Expected Reciprocal Rank at k (Chapelle et al., CIKM 2009) with
    binary relevance, per query plus the 'all' mean row:

        ERR@k = sum_{r=1..k} (R_r / r) * prod_{i<r} (1 - R_i),
        R = (2^rel - 1) / 2^max_grade  ->  0.5 for rel=1, 0 otherwise.

    With binary grades the cascade product telescopes to
    0.5^(#relevant ranked above r), so the whole metric is one window
    count over the run — no per-rank recursion. Queries with no judged
    relevant doc are dropped (same convention as ndcg_at); 0.5^n and the
    1/r divisions are IEEE-exact, 4-dp rounding absorbs sum order.
    """
    rel = qrels.filter(F.col("rel") > 0).select("query_id", key) \
        if "rel" in qrels.columns else qrels.select("query_id", key)
    hits = (
        run.filter(F.col("rank") <= k)
        .join(rel, ["query_id", key])
    )
    above = Window.partitionBy("query_id").orderBy("rank") \
        .rowsBetween(Window.unboundedPreceding, -1)
    n_above = F.coalesce(F.count(F.lit(1)).over(above), F.lit(0))
    term = (F.lit(0.5) / F.col("rank").cast("double")) \
        * F.pow(F.lit(0.5), n_above.cast("double"))
    per_q_hits = hits.withColumn("_t", term).groupBy("query_id") \
        .agg(F.sum("_t").alias("_raw"))
    judged = rel.select("query_id").distinct()
    per_q = judged.join(per_q_hits, "query_id", "left") \
        .withColumn("_raw", F.coalesce("_raw", F.lit(0.0)))
    out = per_q.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.round("_raw", 4).alias("err"),
    )
    if not include_summary:
        return out
    summary = per_q.agg(F.round(F.avg("_raw"), 4).alias("err")).select(
        F.lit("all").alias("query_id"), "err"
    )
    return out.unionByName(summary)


def rbp_metric(
    run: DataFrame, qrels: DataFrame, p: float = 0.8, key: str = "docid",
    include_summary: bool = True,
) -> DataFrame:
    """Rank-Biased Precision (Moffat & Zobel, TOIS 2008) with binary
    relevance, per query plus the 'all' mean row:

        RBP(p) = (1 - p) * sum_r rel_r * p^(r-1)

    — the user inspects rank r with probability p^(r-1); p=0.8 models a
    patient-ish user (expected viewing depth 1/(1-p) = 5). Evaluated
    over the full run depth (RBP needs no cutoff: the geometric weights
    bound the tail — the residual (uncertainty from unretrieved docs) is
    p^depth). Queries with no judged relevant doc are dropped; 4-dp
    rounding absorbs cross-engine pow/sum variation.
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1), got {p}")
    rel = qrels.filter(F.col("rel") > 0).select("query_id", key) \
        if "rel" in qrels.columns else qrels.select("query_id", key)
    hits = run.join(rel, ["query_id", key])
    w = F.pow(F.lit(p), F.col("rank").cast("double") - F.lit(1.0))
    per_q_hits = hits.withColumn("_w", w).groupBy("query_id").agg(
        (F.lit(1.0 - p) * F.sum("_w")).alias("_raw")
    )
    judged = rel.select("query_id").distinct()
    per_q = judged.join(per_q_hits, "query_id", "left") \
        .withColumn("_raw", F.coalesce("_raw", F.lit(0.0)))
    out = per_q.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.round("_raw", 4).alias("rbp"),
    )
    if not include_summary:
        return out
    summary = per_q.agg(F.round(F.avg("_raw"), 4).alias("rbp")).select(
        F.lit("all").alias("query_id"), "rbp"
    )
    return out.unionByName(summary)

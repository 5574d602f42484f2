"""BM25 disjunctive top-k search — SURVEY.md §2 ops S1-S11.

Reference per-query loop (JASSjr_search.py:55-100, JASSjr_search.cpp:168-237):
dictionary probe -> postings fetch -> df==N elision -> idf = ln(N/df) ->
per-posting ATIRE-BM25 accumulate -> sort (rsv desc, docid desc) -> top 1000,
stop at rsv == 0 -> "qid Q0 docno rank %.4f JASSjr".

Spark restatement (one job for a whole query *batch*, not one query at a
time — the engine's unit of work is the workload):

1. queries(query_id, pos, term) is tiny -> ``F.broadcast`` into an inner
   join against postings on term (S4 dictionary probe + S5 fetch in one
   hash join; inner join = the reference's silent KeyError skip,
   JASSjr_search.py:86-87). The join also pushes ``term IN (...)`` into the
   Parquet scan when the postings side is a term-sorted/bucketed table, so
   only the touched lists are read — the distributed analogue of the
   reference's per-term fseek (JASSjr_search.cpp:197-202).
2. df-filter + idf + the BM25 kernel are pure Column expressions
   (whole-stage codegen; no UDF in the hot path).
3. Per-(query, doc) accumulation: the reference adds f64 contributions in
   query-term order (JASSjr_search.py:64-85); f64 addition is
   non-associative, and Spark's ``sum()`` order is nondeterministic, which
   could flip a 4th decimal on near-ties. Queries have few terms, so we
   ``sort_array(collect_list(struct(pos, contrib)))`` and fold with
   ``F.aggregate`` — a deterministic left fold in term-position order,
   still pure Column ops. Bag semantics for duplicated query terms come
   free (each (pos, term) row scores separately).
4. Top-k: rank = ``row_number`` over (rsv desc, docid desc) per query
   (S9; tie-break higher-docid-first, SURVEY.md §1.4 item 6), rank <= k,
   rsv > 0 (S10 — matched-only semantics mean rsv==0 never occurs for a
   hashmap engine, but idf>0 guarantees it anyway).
5. docno resolution (S11) joins ``docids`` AFTER top-k, so the join input
   is <= k rows per query; the small side is broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import (
    B, K1, LOCAL_POSTINGS_BUDGET, RUN_NAME, TOP_K,
)
from jassjr_spark.operators.index_build import Index

# Above this corpus size the docids table stops being broadcast-able and
# the ranked run becomes the broadcast side of the docno join.
# Env-tunable (scale knob, guide §3.1). Measured A/B in multi-JVM
# local-cluster[4,4,8g] mode at 600k docs on an idle host
# (BENCH/scaling_lc_broadcast_ab.json): the DEFAULT side wins there too
# (flipping at 600k is 1.34x slower — the per-executor replication of
# the docids broadcast is cheaper than forcing the ranked run through a
# driver collect-and-broadcast), so the crossover is a driver-memory
# bound for corpora whose docids can no longer be broadcast at all, not
# a multi-JVM tune.
BROADCAST_DOCIDS_MAX = int(
    os.environ.get("JASSJR_BROADCAST_DOCIDS_MAX", "5000000")
)


def peel_qid(toks: list[str]) -> tuple[str, list[str]]:
    """The canonical whole-token numeric TREC-id peel, shared by EVERY
    query parser in this module so all physical paths agree on which
    token is the qid (reference S3, JASSjr_search.py:55-62; SURVEY.md
    §1.4 item 9). The qid stays a STRING: str.isnumeric accepts
    numerals int() rejects (e.g. '½', 'Ⅻ'), so converting here would
    crash on lines the distributed parser serves fine."""
    if toks and toks[0].isnumeric():
        return toks[0], toks[1:]
    return "0", toks


def parse_queries(spark: SparkSession, lines: list[str]) -> DataFrame:
    """TREC query lines -> (query_id string, pos int, term string).

    Reference S3 (JASSjr_search.py:55-62): whitespace split; if the first
    token is numeric it is the query id (whole-token test via peel_qid)
    and is not searched; id defaults to "0". Terms are NOT lowercased
    (reference searches raw query bytes, SURVEY.md §1.4 item 3).
    """
    rows = []
    for line in lines:
        toks = line.split()
        if not toks:
            continue
        qid, toks = peel_qid(toks)
        for pos, term in enumerate(toks):
            rows.append((qid, pos, term))
    return spark.createDataFrame(rows, "query_id string, pos int, term string")


def terms_of(lines: list[str]) -> list[str]:
    """Distinct search terms of a batch of query lines, sorted.

    Applies the shared peel_qid TREC-id peel (SURVEY.md §1.4 item 9):
    the first token is excluded ONLY when it is numeric. An id-less
    multi-term line keeps every token."""
    ts: set[str] = set()
    for line in lines:
        _, toks = peel_qid(line.split())
        ts.update(toks)
    return sorted(ts)


def local_dictionary(index: Index, max_terms: int = 2_000_000) -> dict | None:
    """Driver-side (term -> df) snapshot. For interactive/repeated search
    over a moderate vocabulary this removes the per-call dictionary-probe
    job entirely (job count, not data, bounds small-query latency).
    Returns None when the vocabulary exceeds ``max_terms`` — at web scale
    the per-query filtered probe (pushdown on a sorted dictionary table)
    is the right plan and this snapshot must not be attempted."""
    if index.dictionary.count() > max_terms:
        return None
    return {r.term: r.df for r in index.dictionary.select("term", "df").collect()}


def attach_idf(
    queries: DataFrame, dictionary: DataFrame, n_docs: int,
    qterms: list[str] | None = None, local_dict: dict | None = None,
) -> DataFrame:
    """S4 dictionary probe + S6 elision + S7 idf, driver-side.

    The per-query-term (df -> idf) set is tiny (#distinct query terms), so
    we probe the dictionary with one filtered collect — the distributed
    analogue of the reference's hash-map lookup (JASSjr_search.py:65-75) —
    and compute idf with CPython ``math.log``, the *same* libm call the
    reference makes, so scores match to the last ulp (JVM ``Math.log`` may
    differ by 1 ulp, enough to flip a 4th decimal on rare inputs).
    idf==0 elision: terms with df == N are dropped (JASSjr_search.py:70-72);
    out-of-vocabulary terms drop out via the inner join (KeyError pass,
    JASSjr_search.py:86-87).
    """
    import math

    spark = queries.sparkSession
    if qterms is None:
        qterms = [r.term for r in queries.select("term").distinct().collect()]
    if local_dict is not None:
        pairs = [(t, local_dict[t]) for t in qterms if t in local_dict]
    else:
        pairs = [
            (r.term, r.df)
            for r in dictionary.filter(F.col("term").isin(qterms))
            .select("term", "df")
            .collect()
        ]
    idf = [(t, math.log(n_docs / df)) for t, df in pairs if df < n_docs]
    idf_df = spark.createDataFrame(idf, "term string, idf double")
    return queries.join(F.broadcast(idf_df), "term")


def score_postings(
    queries: DataFrame, postings: DataFrame, dictionary: DataFrame,
    n_docs: int, avgdl: float, qterms: list[str] | None = None,
    local_dict: dict | None = None, k1: float = K1, b: float = B,
) -> DataFrame:
    """-> (query_id, docid, pos, contrib): per (query-term-occurrence, doc)
    BM25 contribution. Pure Column math (whole-stage codegen); the
    broadcast join on term doubles as the postings fetch — with a
    term-sorted Parquet postings table the join's ``term IN (...)`` pushes
    into the scan and prunes untouched lists (S5).

    Query-time boosting: when ``queries`` carries a ``weight`` column
    (double), each occurrence's contribution is the unweighted BM25
    contribution *then* multiplied by the weight — ``(idf * tf_part) * w``,
    grouping fixed so weight=1.0 rows are bit-identical to the unweighted
    kernel (x * 1.0 == x in IEEE 754 for finite x)."""
    q = attach_idf(queries, dictionary, n_docs, qterms=qterms,
                   local_dict=local_dict)
    boosted = "weight" in queries.columns
    cols = ["query_id", "pos", "term", "idf"] + (["weight"] if boosted else [])
    joined = postings.join(F.broadcast(q.select(*cols)), "term")
    contrib = bm25_contrib(avgdl, k1=k1, b=b)
    if boosted:
        contrib = contrib * F.col("weight").cast("double")
    return joined.select(
        "query_id", "docid", "pos", contrib.alias("contrib")
    )


def bm25_contrib(avgdl: float, k1: float = K1, b: float = B):
    """The ATIRE-BM25 per-posting contribution as ONE Column expression
    over (idf, tf, dl) columns — shared by the naive and the blocks/WAND
    scoring kernels so both paths produce bit-identical doubles.
    ``k1``/``b`` default to the reference's constants (JASSjr_search.py:
    24-25); overriding them is the standard per-collection tuning knob
    the reference hardcodes away."""
    tf = F.col("tf").cast("double")
    return F.col("idf") * (
        (tf * (k1 + 1.0))
        / (tf + k1 * (1.0 - b + b * (F.col("dl").cast("double") / F.lit(float(avgdl)))))
    )


def accumulate(scored: DataFrame) -> DataFrame:
    """-> (query_id, docid, rsv): deterministic term-position-ordered fold."""
    return (
        scored.groupBy("query_id", "docid")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("rsv")
        )
    )


def accumulate_fixed(scored: DataFrame, max_pos: int) -> DataFrame:
    """``accumulate`` for inputs where (query_id, docid, pos) is UNIQUE and
    pos <= ``max_pos`` (every disjunctive batch: one posting per (term,
    docid), one row per query-term occurrence). Pivots each pos into its
    own aggregate column and folds them 0.0 + c0 + c1 + ... skipping
    absent positions — the SAME left fold in the SAME pos order as
    accumulate's sort_array/F.aggregate, so rsv is bit-identical
    (asserted in tests), but the plan is a codegen hash aggregate over
    fixed-width doubles instead of an ObjectHashAggregate building and
    interpreting a per-group array — measured ~25% off the naive-kernel
    batch at sf1.0, and the map-side partial aggregation ships one row
    per (query, doc, pos-slot) group instead of a list payload."""
    aggs = [
        F.max(F.when(F.col("pos") == p, F.col("contrib"))).alias(f"_c{p}")
        for p in range(max_pos + 1)
    ]
    g = scored.groupBy("query_id", "docid").agg(*aggs)
    rsv = F.lit(0.0)
    for p in range(max_pos + 1):
        c = F.col(f"_c{p}")
        rsv = F.when(c.isNotNull(), rsv + c).otherwise(rsv)
    return g.select("query_id", "docid", rsv.alias("rsv"))


def score_postings_local(
    postings: DataFrame, qentries: list, n_docs: int, avgdl: float,
    local_dict: dict, k1: float = K1, b: float = B,
) -> DataFrame:
    """``score_postings`` for a DRIVER-RESIDENT query batch: the
    (query_id, pos, idf) fan-out per term is inlined as a literal
    when-chain of struct arrays and exploded, so the plan is ONE map
    stage over the pruned postings scan — no BroadcastExchange build per
    call, no Spark-side dictionary probe (measured: the broadcast join
    alone cost ~0.6 s/call at sf1.0). Contributions are bit-identical to
    score_postings: idf comes from the same CPython ``math.log`` over the
    same (term -> df) pairs, and the BM25 kernel is the same
    ``bm25_contrib`` Column with the idf literal in place of the joined
    column (float literals round-trip exactly).

    ``qentries``: [(query_id, pos, term)] — the driver-side query rows
    (they always exist for text workloads; wand_search/search callers
    forward them). ``local_dict``: (term -> df). OOV terms and df==N
    terms drop out exactly like the inner join + elision filter.
    """
    import math

    fanout: dict[str, list] = {}
    for qid, pos, term in qentries:
        df = local_dict.get(term)
        if df is None or df >= n_docs:
            continue  # OOV (inner-join drop) or idf==0 elision
        fanout.setdefault(term, []).append((qid, pos, math.log(n_docs / df)))
    if not fanout:
        return (
            postings.filter(F.lit(False))
            .select(
                F.lit(0).cast("long").alias("query_id"),
                "docid",
                F.lit(0).cast("int").alias("pos"),
                F.lit(0.0).alias("contrib"),
            )
        )
    expr = None
    for term, lst in fanout.items():
        arr = F.array(*[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.lit(pos).cast("int").alias("pos"),
                F.lit(idf).alias("idf"),
            )
            for qid, pos, idf in lst
        ])
        expr = (
            F.when(F.col("term") == term, arr) if expr is None
            else expr.when(F.col("term") == term, arr)
        )
    return (
        postings.filter(F.col("term").isin(sorted(fanout)))
        .withColumn("_q", F.explode(expr))
        .select(
            F.col("_q.query_id").alias("query_id"),
            "docid",
            F.col("_q.pos").alias("pos"),
            F.col("_q.idf").alias("idf"),
            "tf",
            "dl",
        )
        .select(
            "query_id", "docid", "pos",
            bm25_contrib(avgdl, k1=k1, b=b).alias("contrib"),
        )
    )


def top_k(accumulated: DataFrame, k: int = TOP_K, offset: int = 0) -> DataFrame:
    """-> (query_id, docid, rank, rsv), rank 1-based, <= k rows/query.
    ``offset`` pages past the first results (rank offset+1..offset+k —
    deep paging; rank stays the GLOBAL rank so page boundaries are
    visible to the caller)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    ranked = (
        accumulated.filter(F.col("rsv") > 0.0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= offset + k)
    )
    return ranked.filter(F.col("rank") > offset) if offset else ranked


def search(
    index: Index, queries: DataFrame, k: int = TOP_K,
    stats: dict | None = None, qterms: list[str] | None = None,
    local_dict: dict | None = None, k1: float = K1, b: float = B,
) -> DataFrame:
    """Full S1-S10 pipeline -> (query_id, docno, rank, rsv) ranked run.

    Pass ``qterms`` when the query terms are already known driver-side
    (they always are for text workloads) — it saves one Spark job per
    call; job-count, not data volume, dominates small-batch latency.
    ``k1``/``b`` tune the scorer per call (reference defaults otherwise).
    """
    s = stats or index.scalar_stats()
    # Prune the postings scan to the query's terms (and, for a persisted
    # bucketed index, to their bucket directories) before the join — the
    # distributed analogue of the reference's per-term fseek.
    from jassjr_spark.sources.index_store import pruned_postings

    if qterms is None:
        qterms = [r.term for r in queries.select("term").distinct().collect()]
    postings = pruned_postings(index, qterms)
    scored = score_postings(
        queries, postings, index.dictionary, s["n_docs"], s["avgdl"],
        qterms=qterms, local_dict=local_dict, k1=k1, b=b,
    )
    ranked = top_k(accumulate(scored), k)
    return resolve_docnos(index, ranked, s["n_docs"])


def search_conjunctive(
    index: Index, queries: DataFrame, k: int = TOP_K,
    stats: dict | None = None, strict: bool = False,
) -> DataFrame:
    """Conjunctive (boolean-AND) BM25 top-k: a document qualifies only if
    it matches EVERY scorable query term; qualifying docs are ranked by
    the same BM25 sum (identical kernel + ordered fold) as the
    disjunctive engine. The reference is disjunctive-only
    (JASSjr_search.py:64-88); AND semantics is the standard companion
    mode every production engine ships.

    "Scorable" = in the dictionary with df < N. Terms that are OOV or
    df==N cannot constrain a postings engine (the former match nothing,
    the latter match everything); by default they are dropped from the
    requirement — the stopword-removal convention. ``strict=True``
    instead empties any query containing an OOV term (classic boolean
    semantics).

    Plan shape: the disjunctive scored stream keeps its ``term`` column;
    the accumulate adds one ``count(DISTINCT term)`` to the SAME
    aggregation (no extra shuffle), and the per-query required count is
    a driver-known broadcast. At scale the matched==need filter runs
    before top-k, so the window sees only the (far smaller) conjunctive
    candidate set.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    n_docs = s["n_docs"]
    spark = queries.sparkSession
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    q = attach_idf(queries, index.dictionary, n_docs, qterms=qterms)

    # per-query required distinct-term count, driver-side (queries are tiny)
    need_rows = (
        q.groupBy("query_id")
        .agg(F.countDistinct("term").cast("long").alias("need"))
    )
    if strict:
        # a term absent from the DICTIONARY (OOV) matches nothing, so the
        # conjunction is unsatisfiable; df==N terms stay non-constraining
        vocab = {
            r.term for r in index.dictionary
            .filter(F.col("term").isin(qterms)).select("term").collect()
        }
        dead = queries.filter(~F.col("term").isin(list(vocab))) \
            .select("query_id").distinct()
        need_rows = need_rows.join(F.broadcast(dead), "query_id", "left_anti")

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
        .join(F.broadcast(need_rows), "query_id")
        .filter(F.col("matched") == F.col("need"))
        .select("query_id", "docid", "rsv")
    )
    return resolve_docnos(index, top_k(acc, k), n_docs)


def search_mixed(
    index: Index, queries: DataFrame, required: DataFrame, k: int = TOP_K,
    stats: dict | None = None,
) -> DataFrame:
    """Lucene-style mixed boolean mode: a document must contain EVERY
    ``required`` (query_id, term) term, but is scored on ALL of the
    query's terms (the ``+term`` operator: required terms gate, optional
    terms still lift the score). Degenerates to plain disjunctive search
    with an empty required set and to search_conjunctive when required ==
    all terms.

    Required terms that are OOV empty the query (un-satisfiable, classic
    boolean); required terms with df == N gate nothing and are dropped
    from the requirement (they match every doc but cannot score).

    Plan shape: identical to search_conjunctive — the required-match
    count rides the SAME aggregation as the rsv fold (a conditional
    countDistinct; no extra shuffle), the per-query need is a broadcast.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    n_docs = s["n_docs"]
    spark = queries.sparkSession
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    q = attach_idf(queries, index.dictionary, n_docs, qterms=qterms)

    rterms = [r.term for r in required.select("term").distinct().collect()]
    vocab = {
        r.term for r in index.dictionary
        .filter(F.col("term").isin(rterms)).select("term").collect()
    }
    # a required OOV term is un-satisfiable for that query
    dead = required.filter(~F.col("term").isin(list(vocab)) if vocab
                           else F.lit(True)).select("query_id").distinct()
    # df==N required terms can't appear in scored rows (idf elision) —
    # drop them from the need or every query would fail the gate
    scorable = {
        r.term for r in index.dictionary.filter(
            F.col("term").isin(rterms) & (F.col("df") < n_docs)
        ).select("term").collect()
    }
    live_req = required.filter(F.col("term").isin(list(scorable))
                               if scorable else F.lit(False))
    need_rows = (
        live_req.groupBy("query_id")
        .agg(F.countDistinct("term").cast("long").alias("need"))
        .join(F.broadcast(dead), "query_id", "left_anti")
    )
    # queries with NO live required terms need 0 matches (pure disjunctive)
    all_q = queries.select("query_id").distinct().join(
        F.broadcast(dead), "query_id", "left_anti"
    )
    need_rows = all_q.join(need_rows, "query_id", "left").select(
        "query_id", F.coalesce("need", F.lit(0)).alias("need")
    )

    postings = pruned_postings(index, qterms)
    scored = postings.join(
        F.broadcast(q.select("query_id", "pos", "term", "idf")), "term"
    ).join(
        F.broadcast(live_req.select("query_id", "term")
                    .withColumn("req", F.lit(1))),
        ["query_id", "term"], "left",
    ).select(
        "query_id", "docid", "term", "pos",
        F.coalesce("req", F.lit(0)).alias("req"),
        bm25_contrib(s["avgdl"]).alias("contrib"),
    )
    acc = (
        scored.groupBy("query_id", "docid")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "contrib"))),
                F.lit(0.0),
                lambda a, x: a + x["contrib"],
            ).alias("rsv"),
            F.countDistinct(F.when(F.col("req") == 1, F.col("term")))
            .cast("long").alias("matched_req"),
        )
        .join(F.broadcast(need_rows), "query_id")
        .filter(F.col("matched_req") == F.col("need"))
        .select("query_id", "docid", "rsv")
    )
    return resolve_docnos(index, top_k(acc, k), n_docs)


def search_negated(
    index: Index, queries: DataFrame, negated: DataFrame, k: int = TOP_K,
    stats: dict | None = None,
) -> DataFrame:
    """Boolean NOT companion mode: rank by the ordinary disjunctive BM25
    sum over the positive ``queries`` (identical kernel + ordered fold),
    excluding every document that contains ANY of the query's ``negated``
    (query_id, term) terms. The reference is disjunctive-only
    (JASSjr_search.py:64-88); ``+a -b`` is the other standard boolean
    companion next to AND (search_conjunctive).

    Exclusion semantics follow the postings algebra: an OOV negated term
    excludes nothing; a df==N negated term excludes everything (classic
    boolean — the query returns empty).

    Plan shape: the exclusion set is a SECOND pruned postings fetch
    (only the negated terms' lists are read, bucket+term pushdown like
    any query), distinct-projected to (query_id, docid) and left-anti
    joined against the accumulated scores BEFORE the top-k cut, so every
    returned page is full. Common-term negations make the exclusion side
    large; that is inherent to NOT over an inverted index and stays a
    single co-partitioned anti-join (AQE picks broadcast when the lists
    are small).
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    nterms = [r.term for r in negated.select("term").distinct().collect()]
    scored = score_postings(
        queries, pruned_postings(index, qterms), index.dictionary,
        s["n_docs"], s["avgdl"], qterms=qterms,
    )
    acc = accumulate(scored)
    if nterms:
        excl = (
            pruned_postings(index, nterms)
            .join(F.broadcast(negated.select("query_id", "term")), "term")
            .select("query_id", "docid")
            .distinct()
        )
        acc = acc.join(excl, ["query_id", "docid"], "left_anti")
    return resolve_docnos(index, top_k(acc, k), s["n_docs"])


def search_scoped(
    index: Index, queries: DataFrame, allowed: DataFrame, k: int = TOP_K,
    stats: dict | None = None, broadcast_scope: bool = True,
) -> DataFrame:
    """Metadata-scoped disjunctive BM25: rank only documents whose docid
    appears in ``allowed`` (one ``docid`` column), e.g. "search within
    repo-3" / "lang = 'python' only" over the input_hint code corpus.

    Scoring statistics stay GLOBAL (corpus-wide idf / avgdl / N) — the
    filter restricts *which documents may rank*, not what a term is worth,
    so a doc's score is identical scoped or not (the faceted-search
    convention; per-tenant isolated relevance wants a per-tenant index,
    which read-path filters can't fake). Identity: output == search(k=∞)
    semi-joined to ``allowed`` and re-ranked — pytest asserts exactly that.

    Plan shape: the semi-join lands on the scored stream BEFORE the
    accumulate and window, so the shuffle and top-k see only in-scope
    docs. A metadata predicate selecting f of the corpus cuts the
    accumulate's input by 1-f no matter how large N is. With
    ``broadcast_scope`` (default; metadata scopes are almost always a tiny
    docid set relative to postings) the semi-join is shuffle-free; at a
    scope too big to broadcast, pass False and it becomes one hash
    semi-join keyed on docid — still never wider than the scored stream.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    postings = pruned_postings(index, qterms)
    scored = score_postings(
        queries, postings, index.dictionary, s["n_docs"], s["avgdl"],
        qterms=qterms,
    )
    scope = allowed.select(F.col("docid").cast("long").alias("docid"))
    if broadcast_scope:
        scope = F.broadcast(scope)
    scored = scored.join(scope, "docid", "semi")
    ranked = top_k(accumulate(scored), k)
    return resolve_docnos(index, ranked, s["n_docs"])


def search_collapsed(
    index: Index, queries: DataFrame, groups: DataFrame, k: int = TOP_K,
    stats: dict | None = None, per_group: int = 1,
) -> DataFrame:
    """Field-collapsed disjunctive BM25: at most ``per_group`` results
    per group (default ONE) —
    "best file per repository" diversification over the input_hint corpus
    (the collapse/field-collapsing feature of production engines).

    ``groups`` is (docid, grp). Semantics: score every matching doc
    normally (global stats), keep each group's best (rsv desc, docid desc
    — the engine's standard tie-break), then rank the survivors and cut
    at k. Equivalently: the top-k of the per-group argmax set.

    Plan shape: accumulate's shuffle is the same as plain search; the
    collapse is ONE extra window partitioned by (query_id, grp) — at
    10^12 docs that window's partition count is #groups × #queries, far
    finer than the accumulate, so it never concentrates; the final top-k
    window sees ≤ #groups rows per query. The groups map rides a docid
    hash join (broadcast only if the caller pre-broadcasts); at code-repo
    scale it is a metadata table orders of magnitude under the postings.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    postings = pruned_postings(index, qterms)
    scored = score_postings(
        queries, postings, index.dictionary, s["n_docs"], s["avgdl"],
        qterms=qterms,
    )
    acc = accumulate(scored).filter(F.col("rsv") > 0.0)
    g = groups.select(F.col("docid").cast("long").alias("docid"), "grp")
    wg = Window.partitionBy("query_id", "grp").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    best = (
        acc.join(g, "docid")
        .withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") <= per_group)
        .drop("_rn")
    )
    ranked = top_k(best.select("query_id", "docid", "rsv", "grp"), k)
    return resolve_docnos(index, ranked, s["n_docs"], extra=("grp",))


def facet_counts(
    index: Index, queries: DataFrame, facets: DataFrame,
    stats: dict | None = None,
) -> DataFrame:
    """Faceted navigation counts: for each query, the number of MATCHING
    documents (rsv > 0 under the standard disjunctive scoring) per facet
    value -> (query_id, facet, n_docs). The companion every scoped-search
    UI needs ("python: 1,204 · java: 817 · ...") — counts answer "how
    many would each filter leave", so they run over the UNSCOPED match
    set with global statistics, exactly like search_scoped scores.

    ``facets`` is (docid, facet). Plan shape: the same pruned-postings
    scan + accumulate as search(); the facet map joins AFTER the
    accumulate (one row per matched doc, far smaller than postings) and
    the count is a low-cardinality groupBy — partial-aggregated, no
    top-k window at all.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    postings = pruned_postings(index, qterms)
    scored = score_postings(
        queries, postings, index.dictionary, s["n_docs"], s["avgdl"],
        qterms=qterms,
    )
    acc = accumulate(scored).filter(F.col("rsv") > 0.0)
    f = facets.select(F.col("docid").cast("long").alias("docid"), "facet")
    return (
        acc.join(f, "docid")
        .groupBy("query_id", "facet")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def _matched_docids(index: Index, queries: DataFrame, s: dict) -> DataFrame:
    """The boolean-OR candidate set -> distinct (query_id, docid): every
    doc containing at least one SCORABLE query term (OOV and df==N terms
    drop out via attach_idf — identical elision to the scorer, and since
    every per-posting contribution is strictly positive, this set equals
    {rsv > 0} without computing a single score). Shared by the
    total-hits / sort-by-field / stats-facet companions."""
    from jassjr_spark.sources.index_store import pruned_postings

    qterms = [r.term for r in queries.select("term").distinct().collect()]
    q = attach_idf(queries, index.dictionary, s["n_docs"], qterms=qterms)
    return (
        pruned_postings(index, qterms)
        .join(F.broadcast(q.select("query_id", "term").distinct()), "term")
        .select("query_id", "docid")
        .distinct()
    )


def hit_counts(index: Index, queries: DataFrame,
               stats: dict | None = None) -> DataFrame:
    """Total hits per query -> (query_id, n_hits): the size of the ranked
    run at k=infinity (the total-hits number every engine reports beside
    its top-k page). Queries matching nothing report 0, not absence.

    Plan shape: pruned postings fetch + a two-phase distinct-count — no
    scoring, no window; the distinct shuffles at most one row per
    (query, matched doc)."""
    s = stats or index.scalar_stats()
    counts = (
        _matched_docids(index, queries, s)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        queries.select("query_id").distinct()
        .join(counts, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def search_ordered(
    index: Index, queries: DataFrame, order_keys: DataFrame, k: int = TOP_K,
    ascending: bool = False, stats: dict | None = None,
) -> DataFrame:
    """Sort-by-field: the boolean-OR candidate set ordered by a metadata
    key instead of relevance -> (query_id, docno, rank, sort_key) — the
    ES/Solr ``sort`` clause (newest-first, largest-first listings).

    ``order_keys`` is (docid, sort_key); docs without a key drop out
    (inner join — a doc that cannot be ordered cannot be listed).
    Tie-break: docid desc, the engine's standard.

    Plan shape: the matched set is one row per (query, doc); the key map
    joins on docid BEFORE the per-query window, so the window input is
    candidate-sized, never postings-sized."""
    s = stats or index.scalar_stats()
    key = F.col("sort_key")
    w = Window.partitionBy("query_id").orderBy(
        key.asc() if ascending else key.desc(), F.col("docid").desc()
    )
    ranked = (
        _matched_docids(index, queries, s)
        .join(order_keys.select(
            F.col("docid").cast("long").alias("docid"), "sort_key"), "docid")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if s["n_docs"] <= BROADCAST_DOCIDS_MAX:
        out = ranked.join(F.broadcast(index.docids), "docid")
    else:
        out = index.docids.join(F.broadcast(ranked), "docid")
    return out.select("query_id", "docno", "rank", "sort_key")


def facet_stats(
    index: Index, queries: DataFrame, facets: DataFrame,
    stats: dict | None = None,
) -> DataFrame:
    """Stats facet (the aggregation companion to facet_counts): per
    (query, facet value), count/min/max/avg of a numeric field over the
    MATCHING documents -> (query_id, facet, n_docs, min_val, max_val,
    avg_val) — "python: 1,204 files, avg 8.3 KB" next to the counts.

    ``facets`` is (docid, facet, val). Same unscoped match set as
    facet_counts; the aggregate is low-cardinality and partial-aggregates
    map-side. avg is rounded to 6 dp for cross-engine stability."""
    s = stats or index.scalar_stats()
    f = facets.select(
        F.col("docid").cast("long").alias("docid"), "facet",
        F.col("val").cast("double").alias("val"),
    )
    return (
        _matched_docids(index, queries, s)
        .join(f, "docid")
        .groupBy("query_id", "facet")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.round(F.avg("val"), 6).alias("avg_val"),
        )
    )


def facet_percentiles(
    index: Index, queries: DataFrame, facets: DataFrame,
    percentiles: tuple[float, ...] = (0.5, 0.9),
    stats: dict | None = None,
) -> DataFrame:
    """Percentiles facet (the ES percentiles aggregation): per (query,
    facet value), EXACT linear-interpolated percentiles of a numeric
    field over the matching documents -> (query_id, facet, n_docs,
    p_50, p_90, ...). Uses ``F.percentile`` — SQL PERCENTILE_CONT
    semantics, so the numbers mean the same thing in every engine;
    6-dp rounding absorbs interpolation-arithmetic ulps.

    Exact percentiles sort values WITHIN each (query, facet) group —
    fine while groups fit a task (facet cardinality x match count
    bounded). At unbounded group sizes switch the expression to
    ``F.percentile_approx`` (t-digest sketch, mergeable map-side):
    same plan shape, sketch instead of sort; not cross-engine
    hashable, which is why the oracled surface uses the exact form.
    """
    s = stats or index.scalar_stats()
    f = facets.select(
        F.col("docid").cast("long").alias("docid"), "facet",
        F.col("val").cast("double").alias("val"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for q in percentiles:
        aggs.append(
            F.round(F.percentile("val", F.lit(float(q))), 6)
            .alias(f"p_{round(q * 100)}")
        )
    return (
        _matched_docids(index, queries, s)
        .join(f, "docid")
        .groupBy("query_id", "facet")
        .agg(*aggs)
    )


def search_after(
    index: Index, queries: DataFrame, k: int = TOP_K,
    after: dict[int, tuple[float, int]] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Cursor pagination (the ES ``search_after`` pattern): per query,
    the next page strictly BELOW an ``(rsv, docid)`` cursor in the
    engine's total order (rsv desc, docid desc) -> (query_id, docno,
    rank, rsv) with PAGE-LOCAL ranks 1..k (a cursor names a position,
    not an offset — global ranks are what ``top_k(offset=)`` is for).
    ``after`` maps query_id -> cursor; queries without one get page 1.

    Why it exists next to offset paging: ``offset`` paging ranks
    offset+k rows per query — O(depth) window work that grows with every
    page. The cursor filter prunes everything at-or-above the cursor
    BEFORE the window, so page N costs the same as page 1 however deep N
    is. The cursor is the last row of the previous page; rsv equality is
    exact because the engine's scores are bit-reproducible (ordered
    fold) — resuming from a stored cursor re-finds the identical
    boundary."""
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    spark = queries.sparkSession
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    scored = score_postings(
        queries, pruned_postings(index, qterms), index.dictionary,
        s["n_docs"], s["avgdl"], qterms=qterms,
    )
    acc = accumulate(scored)
    if after:
        cur = spark.createDataFrame(
            [(int(q), float(r), int(d)) for q, (r, d) in after.items()],
            "query_id long, cur_rsv double, cur_docid long",
        )
        acc = (
            acc.join(F.broadcast(cur), "query_id", "left")
            .filter(
                F.col("cur_rsv").isNull()
                | (F.col("rsv") < F.col("cur_rsv"))
                | ((F.col("rsv") == F.col("cur_rsv"))
                   & (F.col("docid") < F.col("cur_docid")))
            )
            .drop("cur_rsv", "cur_docid")
        )
    return resolve_docnos(index, top_k(acc, k), s["n_docs"])


def facet_histogram(
    index: Index, queries: DataFrame, vals: DataFrame, interval: float,
    stats: dict | None = None,
) -> DataFrame:
    """Histogram facet (the ES histogram aggregation): matching-document
    counts in fixed-width numeric buckets -> (query_id, bucket, n_docs),
    ``bucket = floor(val / interval) * interval`` (the bucket's lower
    bound). ``vals`` is (docid, val). Same unscoped match set and
    low-cardinality partial-aggregated groupBy as the other facets."""
    s = stats or index.scalar_stats()
    v = vals.select(
        F.col("docid").cast("long").alias("docid"),
        F.col("val").cast("double").alias("val"),
    )
    bucket = (F.floor(F.col("val") / F.lit(float(interval)))
              * F.lit(float(interval)))
    return (
        _matched_docids(index, queries, s)
        .join(v, "docid")
        .withColumn("bucket", bucket)
        .groupBy("query_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def significant_terms(
    index: Index, docs: DataFrame, queries: DataFrame,
    sample: int = 500, k: int = 20, stats: dict | None = None,
) -> DataFrame:
    """Significant-terms aggregation (the ES significant_terms + sampler
    pattern): terms overrepresented in the MATCHING documents versus the
    corpus -> (query_id, term, fg_df, bg_df, score), top-k per query by
    the JLH score ``(fgPct - bgPct) * (fgPct / bgPct)`` where fgPct =
    fg_df/n_sampled and bgPct = df/N; only positively-associated terms
    (fgPct > bgPct) qualify. Ties: term asc on the 6-dp-rounded score.

    The foreground is a deterministic SAMPLE of the match set (first
    ``sample`` docids per query, docid asc) exactly because the honest
    alternative — joining the full match set back to term data — is a
    corpus-sized join at web scale; ES's sampler agg makes the same
    trade. The sampled docs are re-tokenized from the FORWARD ``docs``
    view (bounded by sample x #queries documents), never via a docid
    probe into the term-partitioned postings."""
    from jassjr_spark.functions.tokenize import doc_term_frequencies

    s = stats or index.scalar_stats()
    n = float(s["n_docs"])
    w = Window.partitionBy("query_id").orderBy(F.col("docid").asc())
    sampled = (
        _matched_docids(index, queries, s)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sample)
        .select("query_id", "docid")
    )
    n_fg = sampled.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_fg")
    )
    sdocs = docs.join(sampled.select("docid").distinct(), "docid")
    tfs = doc_term_frequencies(sdocs, prepend_docno=False) \
        .select("docid", "term")
    fg = (
        sampled.join(tfs, "docid")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("fg_df"))
    )
    fg_pct = F.col("fg_df").cast("double") / F.col("n_fg")
    bg_pct = F.col("df").cast("double") / F.lit(n)
    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    ranked = (
        fg.join(F.broadcast(n_fg), "query_id")
        .join(index.dictionary.select("term", "df"), "term")
        .withColumn("score", F.round(score, 6))
        .filter(fg_pct > bg_pct)
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "term", "fg_df",
                F.col("df").cast("long").alias("bg_df"), "score")
    )


def resolve_docnos(
    index: Index, ranked: DataFrame, n_docs: int,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """docno resolution, shared by every search path: under ~5M docs
    broadcasting docids keeps the whole query one unbroken pipeline
    (measured ~20% faster at 600k); beyond that the docids table can never
    be the broadcast side — broadcast the <=k-rows-per-query RANKED run
    into it instead. ``extra`` names pass-through columns the caller
    attached to the ranked run (e.g. the collapse group)."""
    if n_docs <= BROADCAST_DOCIDS_MAX:
        out = ranked.join(F.broadcast(index.docids), "docid")
    else:
        out = index.docids.join(F.broadcast(ranked), "docid")
    return out.select("query_id", "docno", *extra, "rank", "rsv")


class InteractiveSearcher:
    """Low-latency REPL path (the reference's per-query loop,
    JASSjr_search.cpp:168-237, where startup state is loaded once and each
    query is a probe + accumulate + sort).

    Holds the per-session state driver-side so a query line costs ONE
    Spark action:

    * stats + (term -> df) dictionary snapshot — no probe job (guarded by
      the same max_terms bound as local_dictionary);
    * (docid -> docno) snapshot — the final docno join disappears (guarded
      by max_docids; at web scale fall back to ``search()``);
    * ranking by ``orderBy(...).limit(k)`` (TakeOrderedAndProject:
      per-partition top-k + driver merge) instead of a window — no second
      shuffle, and the collect IS the action.

    Scores are produced by the identical kernel + ordered fold, so output
    lines are byte-identical to ``search_lines`` (asserted in tests).

    Snapshot semantics: the driver-side dictionary/docno snapshots and the
    LRU postings cache are bound at construction — external index
    mutations (streaming appends, delete_documents tombstones,
    compaction) are NOT reflected until a new searcher is built over a
    fresh ``read_index``. Same contract as the reference's load-once REPL.
    """

    def __init__(self, index: Index, stats: dict | None = None,
                 max_docids: int = 10_000_000, shuffle_partitions: int = 8,
                 local_postings_budget: int = LOCAL_POSTINGS_BUDGET,
                 warm_ahead: bool = True,
                 warm_ahead_max_terms: int = 4096):
        # one query's accumulate shuffle holds <= matched-docs rows; a wide
        # shuffle is pure task-scheduling overhead here (measured: 32 -> 8
        # partitions cuts p50 from ~1.05 s to ~0.73 s at 600k docs)
        self.shuffle_partitions = shuffle_partitions
        import math

        # The searcher owns an ISOLATED session (same SparkContext): its
        # latency confs (AQE off, narrow shuffle) are set once there and
        # can never leak into plans another user compiles concurrently in
        # the base session. The index tables are rebound through global
        # temp views — the CacheManager lives in SharedState, so a cached
        # index stays cached across the session boundary.
        base = index.postings.sparkSession
        self.spark = base.newSession()
        # AQE would materialize every query stage as its own job — right
        # for a petabyte shuffle, pure scheduling overhead for one tiny
        # interactive query; same for a wide shuffle.
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.spark.conf.set("spark.sql.shuffle.partitions",
                            str(shuffle_partitions))
        tag = f"jassjr_repl_{id(self)}"
        self._views: list[str] = []

        def rebind(df, name):
            vname = f"{tag}_{name}"
            df.createOrReplaceGlobalTempView(vname)
            self._views.append(vname)
            return self.spark.table(f"global_temp.{vname}")

        index = Index(
            rebind(index.postings, "postings"),
            rebind(index.dictionary, "dictionary"),
            rebind(index.doc_lengths, "doc_lengths"),
            rebind(index.docids, "docids"),
            rebind(index.stats, "stats"),
            n_buckets=index.n_buckets,
        )
        self.index = index
        self.stats = stats or index.scalar_stats()
        self.local_dict = local_dictionary(index)
        n = self.stats["n_docs"]
        self.idf = (
            {t: math.log(n / df) for t, df in self.local_dict.items() if df < n}
            if self.local_dict is not None else None
        )
        self.docnos = (
            {r.docid: r.docno for r in index.docids.select("docid", "docno").collect()}
            if n <= max_docids else None
        )
        # driver-local postings cache (term -> numpy arrays) for the
        # zero-job scoring fast path; LRU-bounded by TOTAL posting
        # entries so memory is capped regardless of term count
        from collections import OrderedDict

        self.local_postings_budget = local_postings_budget
        self._postings_cache: "OrderedDict[str, tuple]" = OrderedDict()
        # per-term BM25 contribution vectors, memoized on first query use:
        # contrib depends only on (idf, tf, dl, avgdl) — all fixed per
        # posting for this searcher's stats snapshot — so the vectorized
        # expression is computed once per term, not once per query. Keyed
        # alongside _postings_cache and evicted with it; adds one float64
        # per posting for QUERIED terms only (the budget refusal already
        # gates what can live here at web scale).
        self._contrib_cache: dict = {}
        self._cached_entries = 0
        self.last_path: str | None = None  # "local" | "spark" (introspection)
        self.warmed_terms = 0
        self.resident = False  # whole postings table driver-cached
        if warm_ahead:
            self.warmed_terms = self._warm_ahead(warm_ahead_max_terms)

    def _warm_ahead(self, max_terms: int) -> int:
        """Load-once parity with the reference REPL (JASSjr_search.py:29
        reads the whole vocab + postings at startup): prefetch posting
        lists into the driver cache in ONE Arrow job, so a FIRST-sighting
        query scores on the driver-local numpy path (VERDICT r4: cold
        p50 329 ms / p99 1.86 s was the first Arrow fetch of exactly
        these lists). Two regimes, chosen by a driver-side df sum (no
        job):

        * resident — the WHOLE postings table fits the budget: load it
          all with a plain full scan (no IN-list). This is the
          reference's exact startup architecture and the only strategy
          that makes every query zero-job on a realistic Zipf
          vocabulary — top-df greedy leaves each query's rare tail
          un-cached, and one un-cached term costs a full Spark job
          (measured 313 ms p50 on the 600k-doc/100k-term Zipf corpus
          where per-query rare terms never repeat).
        * greedy — budget smaller than the index (the web-scale case):
          descending-df fill of the heaviest lists; max_terms bounds the
          pruned-scan IN-list (a long tail of df=1 docno terms would
          bloat it for no latency win). Inserted ascending so the
          heaviest lists are the LAST eviction candidates.

        Returns the number of terms prefetched."""
        if self.idf is None or self.docnos is None \
                or self.local_postings_budget <= 0:
            return 0
        total = sum(df for df in self.local_dict.values() if df > 0)
        if 0 < total <= self.local_postings_budget:
            warmed = self._warm_all()
            self.resident = True
            return warmed
        by_df = sorted(self.local_dict.items(),
                       key=lambda kv: (-kv[1], kv[0]))
        chosen, total = [], 0
        for t, df in by_df:
            if len(chosen) >= max_terms:
                break
            if df <= 0 or total + df > self.local_postings_budget:
                continue  # keep greedily filling with smaller lists
            chosen.append(t)
            total += df
        if not chosen:
            return 0
        chosen.reverse()
        self._fetch_local_postings(chosen)
        return len(chosen)

    def search_line(self, line: str, k: int = TOP_K) -> list[str]:
        spark = self.spark  # the searcher's isolated session
        toks = line.split()
        if not toks:
            return []
        qid, toks = peel_qid(toks)
        if not toks or self.idf is None or self.docnos is None:
            # web-scale fallback: the batch plan with its distributed joins
            if not toks:
                return []
            q = parse_queries(spark, [line])
            return to_trec_lines(
                search(self.index, q, k, stats=self.stats,
                       qterms=sorted(set(toks)), local_dict=self.local_dict)
            )
        qrows = [(qid, pos, t, self.idf[t]) for pos, t in enumerate(toks)
                 if t in self.idf]
        if not qrows:
            return []
        local = self._search_local(qid, qrows, k)
        if local is not None:
            self.last_path = "local"
            return local
        self.last_path = "spark"
        from jassjr_spark.sources.index_store import pruned_postings

        qdf = spark.createDataFrame(
            qrows, "query_id string, pos int, term string, idf double"
        )
        postings = pruned_postings(self.index, sorted({t for _, _, t, _ in qrows}))
        scored = postings.join(F.broadcast(qdf), "term").select(
            "query_id", "docid", "pos",
            bm25_contrib(self.stats["avgdl"]).alias("contrib"),
        )
        plan = (
            accumulate(scored)
            .filter(F.col("rsv") > 0.0)
            .orderBy(F.col("rsv").desc(), F.col("docid").desc())
            .limit(k)
        )
        # the plan compiles in the searcher's OWN session (AQE off, narrow
        # shuffle, set once in __init__), so the collect drives broadcast
        # + agg + TakeOrdered as one job without touching any conf another
        # session is using
        rows = plan.collect()
        return [
            "{} Q0 {} {} {:.4f} {}".format(
                qid, self.docnos[r.docid], rank, r.rsv, RUN_NAME
            )
            for rank, r in enumerate(rows, start=1)
        ]

    def _fetch_local_postings(self, terms: list[str]) -> bool:
        """Pull the posting lists for ``terms`` into the driver cache
        (ONE Spark job for all of them); False if they cannot fit the
        budget. df is known driver-side, so the memory decision is made
        BEFORE any fetch — the web-scale guard: a stopword-sized list
        never gets collected."""
        from jassjr_spark.sources.index_store import pruned_postings

        missing = [t for t in terms if t not in self._postings_cache]
        if not missing:
            return True
        need = sum(self.local_dict.get(t, 0) for t in missing)
        if sum(self.local_dict.get(t, 0) for t in terms) \
                > self.local_postings_budget:
            return False  # this query's lists can never fit: Spark path
        # LRU-evict (oldest first) until the new lists fit — but never a
        # term THIS query needs: evicting one would be refetched-or-miss
        protected = set(terms)
        while self._cached_entries + need > self.local_postings_budget:
            victim = next(
                (t for t in self._postings_cache if t not in protected), None
            )
            if victim is None:
                break
            d, _, _ = self._postings_cache.pop(victim)
            self._contrib_cache.pop(victim, None)
            self._cached_entries -= len(d)
        # Arrow columnar transfer (toPandas), not row collect: a
        # stopword-class list is 10^5-10^6 rows and Row objects cost
        # ~10x the bytes and time of an Arrow batch
        pdf = (
            pruned_postings(self.index, missing)
            .select("term", "docid", "tf", "dl").toPandas()
        )
        self._cache_frame(pdf, missing)
        return True

    def _cache_frame(self, pdf, terms: list[str]) -> None:
        """Slice a fetched (term, docid, tf, dl) frame into per-term numpy
        lists and insert them into the LRU cache. One hash pass over the
        frame, not a full-array mask per term — a per-term
        ``terms_col == t`` is O(terms * rows), which turns a warm-ahead
        prefetch (hundreds of terms, 10^7 rows) into minutes of
        single-threaded string compares; groupby indices preserve
        within-term row order, so scoring stays byte-identical."""
        docid_col = pdf["docid"].to_numpy("int64")
        tf_col = pdf["tf"].to_numpy("float64")
        dl_col = pdf["dl"].to_numpy("float64")
        groups = pdf.groupby("term", sort=False).indices
        self._cache_groups(docid_col, tf_col, dl_col, groups, terms)

    def _cache_groups(self, docid_col, tf_col, dl_col, groups,
                      terms: list[str]) -> None:
        """Insert per-term slices of fetched column arrays into the LRU
        cache. ``groups`` maps term -> ascending row-index array (so
        within-term row order — and therefore the scoring fold order —
        is preserved byte-identically)."""
        import numpy as np

        empty = np.array([], np.int64)
        for t in terms:
            ix = groups.get(t)
            if ix is None:  # no rows (e.g. masked-out): cache the absence
                self._postings_cache[t] = (
                    empty, empty.astype(np.float64), empty.astype(np.float64)
                )
                continue
            self._postings_cache[t] = (docid_col[ix], tf_col[ix], dl_col[ix])
            self._cached_entries += len(ix)

    def _warm_all(self) -> int:
        """Resident-index warm-up: the postings table's total entry count
        (known driver-side from the dictionary — no job) fits the LRU
        budget, so collect ALL of it in one Arrow full scan. No IN-list:
        the pruned-scan path exists to avoid reading what we don't want,
        and here we want everything; a 10^5-term predicate would only
        slow the scan down. Cache memory ends at exactly the same bound
        the greedy path enforces (<= budget entries), and eviction can
        never trigger, so every subsequent query is zero-job. At web
        scale sum(df) exceeds any driver budget and the caller degrades
        to the greedy top-df prefetch — the budget IS the refusal.

        The transfer stays Arrow end-to-end (toArrow, not toPandas): a
        pandas frame would hold one PYTHON STRING per row for the term
        column — ~50-80 B/entry of transient heap the entries-count
        budget does not model, several GB at a 10^7-entry budget —
        while Arrow keeps terms as offset+bytes buffers and the
        dictionary-encoded codes give the same stable per-term row
        grouping as the pandas hash groupby."""
        import numpy as np
        import pyarrow as pa

        tbl = (
            self.index.postings
            .select("term", "docid", "tf", "dl").toArrow()
        ).combine_chunks()
        docid_col = tbl.column("docid").to_numpy().astype(np.int64,
                                                          copy=False)
        tf_col = tbl.column("tf").to_numpy().astype(np.float64, copy=False)
        dl_col = tbl.column("dl").to_numpy().astype(np.float64, copy=False)
        groups: dict[str, np.ndarray] = {}
        if len(tbl):
            enc = pa.compute.dictionary_encode(tbl.column("term"))
            enc = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
            codes = enc.indices.to_numpy()
            uniq = enc.dictionary.to_pylist()
            del tbl, enc  # free the Arrow buffers before slicing
            order = np.argsort(codes, kind="stable")  # stable: keeps
            # ascending original positions within each term's group
            bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
            groups = {
                t: order[bounds[i]:bounds[i + 1]]
                for i, t in enumerate(uniq)
            }
        # terms in the dictionary snapshot but absent from the fetched
        # frame (e.g. fully masked by tombstones) cache as empty lists,
        # exactly like the per-query fetch path
        self._cache_groups(docid_col, tf_col, dl_col, groups,
                           list(self.local_dict))
        return len(self._postings_cache)

    def _local_matches(self, qrows: list):
        """The raw scoring fold of the driver-local fast path: -> (docids,
        rsv) numpy arrays of EVERY positively-scored match (no top-k
        selection), or None when the lists cannot be served locally
        (budget refusal or non-dense docid space — caller falls back to
        the Spark plan). float64 values are bit-identical to the Spark
        kernel: the per-posting contribution mirrors ``bm25_contrib``'s
        expression tree op-for-op, idf comes from the same CPython
        ``math.log`` snapshot ``attach_idf`` uses, and per-doc
        accumulation is the same position-ordered left fold as
        ``accumulate``'s F.aggregate over sort_array(collect_list(...)) —
        a dense rsv accumulator updated one query position at a time adds
        each doc's contributions in exactly that order (docids are unique
        within one posting list, so += is one sequential add per doc; the
        0.0 seed is exact: 0.0 + c == c). NOT np.add.reduceat, whose
        pairwise summation can differ in the last ulp."""
        import numpy as np

        terms = sorted({t for _, _, t, _ in qrows})
        if not self._fetch_local_postings(terms):
            return None
        n_docs = int(self.stats["n_docs"])
        for t in terms:
            self._postings_cache.move_to_end(t)  # mark recently-used (LRU)
            d = self._postings_cache[t][0]
            if len(d) and int(d.max()) >= n_docs:
                return None  # non-dense docid space: dense accumulator unsafe
        avgdl = float(self.stats["avgdl"])
        rsv_vec = np.zeros(n_docs, np.float64)
        hit = False
        for _, pos, t, idf in qrows:  # qrows are in ascending pos order
            docids, tfs, dls = self._postings_cache[t]
            if len(docids) == 0:
                continue
            contrib = self._contrib_cache.get(t)
            if contrib is None:
                # EXACTLY bm25_contrib's float64 expression tree; the
                # result is query-independent (idf is this searcher's
                # snapshot, tf/dl are per-posting constants), so memoize
                # the vector — same bits, computed once per term
                contrib = idf * (
                    (tfs * (K1 + 1.0))
                    / (tfs + K1 * (1.0 - B + B * (dls / avgdl)))
                )
                self._contrib_cache[t] = contrib
            rsv_vec[docids] += contrib
            hit = True
        if not hit:
            empty = np.array([], np.int64)
            return empty, empty.astype(np.float64)
        # matched-and-positive in ONE dense scan: every contribution is
        # >= 0 (idf = ln(N/df) >= 0), so {touched docs with rsv > 0} ==
        # {rsv_vec > 0} — a separate touched[] bool scatter per term
        # would only re-admit rsv == 0.0 docs that the > 0 mask drops
        # anyway (the caller's contract keeps positive scores only)
        uniq = np.flatnonzero(rsv_vec > 0.0)
        return uniq, rsv_vec[uniq]

    def batch_match_arrays(self, lines: list[str]) -> list[tuple] | None:
        """Workload-floor batch scoring (the WAND ``blocks_min_postings``
        principle applied to the plain BM25 batch): per query line, the
        (qid STRING — see peel_qid, docids ndarray, raw-rsv ndarray) of
        every positively-scored match, computed on the driver-resident
        postings cache —
        zero Spark jobs. Returns None unless the searcher is RESIDENT
        (the whole postings table fit the driver budget at warm-up) and
        every line scores locally, so the caller runs ONE physical path
        per batch: below the floor the reference's own single-process
        architecture is the right plan (Spark's per-job scheduling floor
        alone is several times the total work); above it sum(df) exceeds
        any driver budget, this returns None, and the caller takes the
        distributed plan. Raw float64 scores are bit-identical to the
        Spark kernel (see ``_local_matches``); ranking/rounding is left
        to the caller. Lines are scored independently (one result tuple
        per line, in input order); a caller that regroups by qid must
        ensure qids are unique across lines, as search_lines does."""
        if self.idf is None or not self.resident:
            return None
        out: list[tuple] = []
        for line in lines:
            toks = line.split()
            if not toks:
                continue
            qid, toks = peel_qid(toks)
            qrows = [(qid, pos, t, self.idf[t])
                     for pos, t in enumerate(toks) if t in self.idf]
            if not qrows:
                continue
            matched = self._local_matches(qrows)
            if matched is None:
                return None
            uniq, rsv = matched
            out.append((qid, uniq, rsv))
        return out

    def batch_matches(self, lines: list[str]) -> list[tuple] | None:
        """``batch_match_arrays`` flattened to (qid string, docid, rsv)
        Python triples — the row-shaped face used by identity tests."""
        arrays = self.batch_match_arrays(lines)
        if arrays is None:
            return None
        return [
            (qid, int(d), float(s))
            for qid, uniq, rsv in arrays
            for d, s in zip(uniq, rsv)
        ]

    def _search_local(self, qid: str, qrows: list, k: int) -> list[str] | None:
        """Zero-Spark-job scoring over driver-cached posting lists
        (VERDICT r4 Next #5): the reference's per-query regime is a
        driver-local loop over in-memory lists (JASSjr_search.cpp:168-237)
        with ~80 ms per query; Spark's job-scheduling floor alone is
        several times that, so for indexes whose touched lists fit a
        driver budget the searcher scores in numpy. Byte-identical to the
        Spark path (same float64 op order: per-posting contribution
        mirrors bm25_contrib, per-doc accumulation is the same
        position-ordered left fold, ties docid-desc). Returns None when
        the lists cannot fit — caller falls back to the Spark plan.
        """
        import numpy as np

        matched = self._local_matches(qrows)
        if matched is None:
            return None
        uniq, rsv = matched
        if len(rsv) == 0:
            return []
        if len(rsv) > k:
            # select-then-sort: partition to the k-th largest rsv, keep
            # everything >= it (ties included — the docid-desc tiebreak
            # below needs ALL boundary ties present to be exact), and
            # only lexsort that small candidate set
            thresh = np.partition(rsv, len(rsv) - k)[len(rsv) - k]
            sel = rsv >= thresh
            rsv, uniq = rsv[sel], uniq[sel]
        top = np.lexsort((uniq, rsv))[::-1][:k]  # rsv desc, docid desc
        # %-formatting == str.format == the reference's f-string for
        # fixed-point doubles (all three call the same CPython float
        # repr with 'f'/precision 4) but ~2x faster at k=1000; .tolist()
        # converts to Python scalars once in C instead of per-element
        docnos = self.docnos
        return [
            "%s Q0 %s %d %.4f %s" % (qid, docnos[d], rank, s, RUN_NAME)
            for rank, (d, s) in enumerate(
                zip(uniq[top].tolist(), rsv[top].tolist()), start=1
            )
        ]

    def close(self) -> None:
        """Drop the searcher's global temp views (the isolated session
        itself is just a SessionState handle; dropping the views is the
        only shared-namespace cleanup needed)."""
        for v in self._views:
            self.spark.catalog.dropGlobalTempView(v)
        self._views = []


def to_trec_lines(run: DataFrame) -> list[str]:
    """S11 sink: '{qid} Q0 {docno} {rank} {rsv:.4f} JASSjr' ordered by
    (query_id, rank). Python %.4f == reference formatting
    (JASSjr_search.py:100); collect is driver-side by design — a run is
    <= k rows/query, the reference also materializes it to stdout."""
    rows = run.orderBy("query_id", "rank").collect()
    return [
        "{} Q0 {} {} {:.4f} {}".format(r.query_id, r.docno, r.rank, r.rsv, RUN_NAME)
        for r in rows
    ]


def input_order_qids(query_lines: list[str]) -> list[str]:
    """The qid of each input line (default '0'), in input order."""
    return [peel_qid(line.split())[0] for line in query_lines]


def regroup_lines(run_lines: list[str], ids: list[str]) -> list[str]:
    """Reorder a TREC run to input line order (the reference REPL emits
    each line's results as it reads stdin, JASSjr_search.py:55)."""
    by_qid: dict[str, list[str]] = {}
    for ln in run_lines:
        by_qid.setdefault(ln.split(" ", 1)[0], []).append(ln)
    return [ln for qid in ids for ln in by_qid.get(qid, [])]


def search_lines(
    index: Index, spark: SparkSession, query_lines: list[str],
    k: int = TOP_K, stats: dict | None = None,
) -> list[str]:
    """Convenience: raw query lines in, TREC run lines out (REPL analogue)."""
    out: list[str] = []
    # The reference REPL scores one query line at a time; query_id collisions
    # between lines (two id-less lines both get id 0) must not merge, so we
    # key each line separately but run them as ONE Spark job per call when
    # ids are unique, else per line.
    ids = input_order_qids(query_lines)

    if len(set(ids)) == len(ids):
        q = parse_queries(spark, query_lines)
        run = search(index, q, k, stats=stats, qterms=terms_of(query_lines))
        out.extend(regroup_lines(to_trec_lines(run), ids))
    else:
        for line in query_lines:
            q = parse_queries(spark, [line])
            out.extend(
                to_trec_lines(
                    search(index, q, k, stats=stats, qterms=terms_of([line]))
                )
            )
    return out

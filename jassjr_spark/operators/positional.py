"""Positional index + exact phrase search.

The reference's index is tf-only (JASSjr_index.cpp:44-53 stores
(docid, tf) pairs; no positions, so no phrase queries). Phrase matching
is the standard companion capability every production fulltext engine
ships, and a training-data pipeline needs it for exact-substring
contamination sweeps ("find every document containing this benchmark
prompt verbatim") — so this engine adds a positional side-table and a
phrase-scored BM25 on top of it.

Data model:  positions(term, docid, positions array<int>, tf int) —
token offsets (0-based, lexer order) per (term, doc). The skew argument
of the tf-postings layout carries over: a stopword's positions list is
bounded by ONE document's length (positions are per (term, doc), never
concatenated across docs), so no group in the build can exceed the
longest document — the same reason the tf index's groupBy is safe at
10^12 docs.

Phrase evaluation is pure Column set-algebra, no UDF: a phrase
[t0 t1 ... tL] matches at offset p iff p ∈ P(t0) and p+i ∈ P(t_i) for
every i — computed by folding ``F.filter(acc, x -> array_contains(P_i,
x + i))`` across an inner join chain on docid. The join chain is L-1
hash joins of POSITION LISTS (one row per (term, doc)), each join
shrinking the left side (docs matching a longer prefix), with the
rarest-feasible pushdown: only the phrase's terms are ever scanned
(term IN (...) prunes the positional table exactly like pruned_postings
prunes the tf table).

Scoring: phrase_tf = number of match offsets; the phrase behaves as one
synthetic term with df = |{d : phrase_tf > 0}|, scored by the SAME
ATIRE-BM25 formula as single terms (idf = ln(N/df); dl and avgdl from
the engine's doc-length table) and ranked (rsv desc, docid desc) like
every other ranked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import B, K1, TOKEN_RE, TOP_K


def build_positions(
    docs: DataFrame, docid_col: str = "docid", text_col: str = "content",
) -> DataFrame:
    """(docid, text) -> (term, docid, positions sorted array<int>, tf).

    Tokenization is the engine's lexer contract in Column form:
    lowercase, TOKEN_RE token runs, 255-char truncation — the same rule
    the DuckDB oracle expresses as regexp_extract_all, so positional
    results are engine-portable. posexplode supplies the token offset;
    the groupBy is per (term, doc), bounded by one document's length.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    exploded = docs.select(
        F.col(docid_col).alias("docid"), F.posexplode(toks).alias("pos", "term")
    ).withColumn("term", F.substring("term", 1, 255))
    return exploded.groupBy("term", "docid").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count(F.lit(1)).cast("int").alias("tf"),
    )


def phrase_occurrences(positions: DataFrame, phrase: list[str]) -> DataFrame:
    """-> (docid, phrase_tf > 0): docs containing the exact token
    sequence ``phrase``, with its occurrence count.

    A repeated term in the phrase is handled naturally (its positions
    list is joined once per slot). Adjacent-duplicate slots intersect
    shifted copies of the same list, which is exactly the right
    semantics ("the the" needs p and p+1 both in P("the")).
    """
    if not phrase:
        raise ValueError("empty phrase")
    phrase = [t.lower()[:255] for t in phrase]
    pruned = positions.filter(F.col("term").isin(sorted(set(phrase))))

    def _keep_if_shifted_member(col_name: str, shift: int):
        # single-arg lambda factory: PySpark's higher-order-function
        # bridge calls the callable with one Column per PARAMETER, so
        # captured state must live in a closure, not default args
        def fn(x):
            return F.array_contains(F.col(col_name), x + F.lit(shift))

        return fn

    acc = (
        pruned.filter(F.col("term") == phrase[0])
        .select("docid", F.col("positions").alias("acc"))
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = pruned.filter(F.col("term") == t).select(
            "docid", F.col("positions").alias(f"_p{i}")
        )
        acc = (
            acc.join(nxt, "docid")
            .select(
                "docid",
                F.filter("acc", _keep_if_shifted_member(f"_p{i}", i))
                .alias("acc"),
            )
            .filter(F.size("acc") > 0)
        )
    return acc.select(
        "docid", F.size("acc").cast("int").alias("phrase_tf")
    ).filter(F.col("phrase_tf") > 0)


def proximity_occurrences(
    positions: DataFrame, terms: list[str], window: int
) -> DataFrame:
    """Anchored unordered proximity: -> (docid, prox_tf) where

        prox_tf = |{p ∈ P(terms[0]) : ∀t ∈ terms[1:], ∃q ∈ P(t),
                                      |q − p| ≤ window}|

    — occurrences of the FIRST term with every other term somewhere
    within ``window`` token offsets (either side). The tolerant
    companion to exact phrase: "benchmark prompt within 5 tokens of
    'answer'" contamination sweeps, where verbatim matching misses
    light paraphrase. Same plan shape as phrase_occurrences — a
    term-pruned positional scan and L-1 docid hash joins of per-doc
    position LISTS, all HOF Column math, no UDF, nothing proportional
    to document length materialized outside the arrays."""
    if not terms:
        raise ValueError("empty term list")
    if window < 1:
        raise ValueError("window must be >= 1")
    terms = [t.lower()[:255] for t in terms]
    anchor = terms[0]
    # a duplicate of the anchor constrains nothing (q = p satisfies it);
    # duplicate others constrain once
    others = sorted(set(terms[1:]) - {anchor})
    pruned = positions.filter(F.col("term").isin(sorted({anchor, *others})))

    def _within(col_name: str, w: int):
        def fn(p):
            return F.exists(
                F.col(col_name), lambda q: F.abs(q - p) <= F.lit(w)
            )

        return fn

    acc = (
        pruned.filter(F.col("term") == anchor)
        .select("docid", F.col("positions").alias("acc"))
    )
    for i, t in enumerate(others):
        nxt = pruned.filter(F.col("term") == t).select(
            "docid", F.col("positions").alias(f"_w{i}")
        )
        acc = (
            acc.join(nxt, "docid")
            .select(
                "docid",
                F.filter("acc", _within(f"_w{i}", window)).alias("acc"),
            )
            .filter(F.size("acc") > 0)
        )
    return acc.select(
        "docid", F.size("acc").cast("int").alias("prox_tf")
    ).filter(F.col("prox_tf") > 0)


def span_near_occurrences(
    positions: DataFrame, terms: list[str], slop: int = 0
) -> DataFrame:
    """Ordered span-near (Lucene SpanNearQuery, inOrder=true):
    -> (docid, span_tf) where

        span_tf = |{p0 ∈ P(t0) : ∃ p0 < p1 < ... < pL−1, p_i ∈ P(t_i),
                                  p_{L−1} − p0 ≤ (L−1) + slop}|

    — anchor occurrences of the first term from which the remaining
    terms can be chained IN ORDER within a total span of L−1+slop
    positions. slop=0 degenerates to exact phrase (the only chain that
    fits is p_i = p0+i). Sits between phrase (order + adjacency) and
    proximity (neither): order without adjacency.

    Evaluation is the GREEDY-minimal chain: per surviving anchor the
    accumulator keeps (start, cur) and each step advances cur to
    min{q ∈ P(t_i) : q > cur}. Greedy is exact for the existence
    question — the minimal chain has the smallest possible p_{L−1}, so
    it fits the span budget iff any chain does. Chains are pruned the
    step they exceed the budget (cur only grows), so intermediate
    arrays never exceed the anchor term's tf. Same plan shape as
    phrase_occurrences: a term-pruned positional scan and L−1 docid
    hash joins of per-doc position lists, pure HOF Column math, no UDF.
    """
    if not terms:
        raise ValueError("empty term list")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    terms = [t.lower()[:255] for t in terms]
    max_span = len(terms) - 1 + slop
    pruned = positions.filter(F.col("term").isin(sorted(set(terms))))

    acc = pruned.filter(F.col("term") == terms[0]).select(
        "docid",
        F.transform(
            "positions", lambda p: F.struct(p.alias("s"), p.alias("c"))
        ).alias("acc"),
    )

    def _advance(col_name: str):
        # closure factory: the HOF bridge passes one Column per lambda
        # parameter, so loop state must be captured here
        def fn(x):
            return F.struct(
                x["s"].alias("s"),
                F.array_min(
                    F.filter(F.col(col_name), lambda q: q > x["c"])
                ).alias("c"),
            )

        return fn

    for i, t in enumerate(terms[1:], start=1):
        nxt = pruned.filter(F.col("term") == t).select(
            "docid", F.col("positions").alias(f"_s{i}")
        )
        acc = (
            acc.join(nxt, "docid")
            .select(
                "docid",
                F.filter(
                    F.transform("acc", _advance(f"_s{i}")),
                    lambda x: x["c"].isNotNull()
                    & ((x["c"] - x["s"]) <= F.lit(max_span)),
                ).alias("acc"),
            )
            .filter(F.size("acc") > 0)
        )
    return acc.select(
        "docid", F.size("acc").cast("int").alias("span_tf")
    ).filter(F.col("span_tf") > 0)


def _scored_phrase(
    positions: DataFrame, doc_lengths: DataFrame, phrase: list[str],
    n_docs: int, avgdl: float, window: int | None, slop: int | None = None,
) -> DataFrame | None:
    """One phrase's per-doc BM25 contribution -> (docid, contrib), or
    None when the phrase matches nothing or everything (df==N elision).
    The ONE scoring body shared by phrase_search and phrase_contribs:
    df is a driver-side count over the match set (CPython math.log idf,
    ulp-identical to the flat engine); the occurrence frame feeds both
    that count and the returned plan — one extra evaluation of the
    occurrence joins per phrase, inherent to a tf that has no stored
    column (the match set is small: only matching docs survive)."""
    import math

    if window is not None and slop is not None:
        raise ValueError("window (unordered) and slop (ordered) are exclusive")
    if slop is not None:
        occ = span_near_occurrences(positions, phrase, slop) \
            .withColumnRenamed("span_tf", "phrase_tf")
    elif window is None:
        occ = phrase_occurrences(positions, phrase)
    else:
        occ = proximity_occurrences(positions, phrase, window) \
            .withColumnRenamed("prox_tf", "phrase_tf")
    df_count = occ.count()
    if df_count == 0 or df_count >= n_docs:
        return None
    idf = math.log(n_docs / df_count)
    tf = F.col("phrase_tf").cast("double")
    contrib = F.lit(idf) * (
        (tf * (K1 + 1.0))
        / (tf + K1 * (1.0 - B + B * (F.col("len").cast("double")
                                     / F.lit(float(avgdl)))))
    )
    return occ.join(doc_lengths, "docid").select(
        "docid", contrib.alias("contrib")
    )


def phrase_search(
    positions: DataFrame,
    doc_lengths: DataFrame,
    phrases: list[tuple],
    k: int = TOP_K,
    stats: dict | None = None,
    window: int | None = None,
    slop: int | None = None,
) -> DataFrame:
    """phrases = [(query_id, [term, ...]), ...] ->
    (query_id, docid, rank, rsv): BM25-scored top-k where each query is
    one synthetic term — exact-phrase occurrences by default, anchored
    unordered proximity within ``window`` tokens when ``window`` is set
    (see proximity_occurrences), ordered span-near within ``slop``
    when ``slop`` is set (see span_near_occurrences).

    ``doc_lengths`` is (docid, len); N and avgdl are derived from it when
    ``stats`` (n_docs, avgdl) isn't supplied. df is computed per query
    from the match set (one tiny aggregate over <= matching-docs rows)."""
    spark = positions.sparkSession
    if stats is None:
        row = doc_lengths.agg(
            F.count(F.lit(1)).alias("n"), F.avg("len").alias("avgdl")
        ).first()
        stats = {"n_docs": row.n, "avgdl": row.avgdl}
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    runs = []
    for qid, phrase in phrases:
        scored = _scored_phrase(positions, doc_lengths, phrase,
                                n_docs, avgdl, window, slop)
        if scored is None:
            continue  # unmatched, or idf == 0 elision (df == N)
        runs.append(
            scored.select(
                # cast: a small-int literal infers IntegerType, but the
                # empty-result branch below declares query_id LONG — the
                # output schema must not depend on whether anything
                # matched (phrase_contribs casts the same way)
                F.lit(qid).cast("long").alias("query_id"), "docid",
                F.col("contrib").alias("rsv"),
            )
        )
    if not runs:
        return spark.createDataFrame(
            [], "query_id long, docid long, rank long, rsv double"
        )
    allq = runs[0]
    for r in runs[1:]:
        allq = allq.unionByName(r)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv").desc(), F.col("docid").desc()
    )
    return (
        allq.filter(F.col("rsv") > 0)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "docid", "rank", "rsv")
    )


PHRASE_POS_BASE = 1_000_000  # fold slots for phrase clauses in composed queries


def phrase_contribs(
    positions: DataFrame,
    doc_lengths: DataFrame,
    phrases: list[tuple],
    stats: dict,
    window: int | None = None,
) -> DataFrame | None:
    """phrases = [(query_id, slot, [term, ...]), ...] -> (query_id,
    docid, pos, contrib): the per-doc BM25 contribution of each phrase
    as ONE synthetic term (df from its own match set, same formula as
    phrase_search), with ``pos = PHRASE_POS_BASE + slot`` so the
    contribution unions into the scored-term stream and the ordered rsv
    fold stays deterministic. A 4-tuple (query_id, slot, terms, slop)
    evaluates that clause as ordered span-near within ``slop`` instead
    of exact phrase (slop None = exact; the query language's "a b"~n).
    Returns None when no phrase is scorable (unmatched, or df == N
    elision). Scoring body shared with phrase_search via
    _scored_phrase."""
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    runs = []
    for entry in phrases:
        qid, slot, phrase = entry[0], entry[1], entry[2]
        slop = entry[3] if len(entry) > 3 else None
        scored = _scored_phrase(positions, doc_lengths, phrase,
                                n_docs, avgdl, window, slop)
        if scored is None:
            continue
        runs.append(
            scored.select(
                F.lit(qid).cast("long").alias("query_id"),
                "docid",
                F.lit(PHRASE_POS_BASE + slot).cast("int").alias("pos"),
                "contrib",
            )
        )
    if not runs:
        return None
    out = runs[0]
    for r in runs[1:]:
        out = out.unionByName(r)
    return out


def search_with_phrases(
    index,
    queries: DataFrame | None,
    phrases: list[tuple],
    positions: DataFrame,
    k: int = TOP_K,
    stats: dict | None = None,
) -> DataFrame:
    """Composed boolean query with phrase clauses (Lucene's BooleanQuery
    holding PhraseQuery + TermQuery clauses): rsv = sum of the plain
    terms' contributions (``queries``: query_id, pos<PHRASE_POS_BASE,
    term[, weight]) and each phrase's synthetic-term contribution ->
    (query_id, docno, rank, rsv). Disjunctive like the core engine:
    phrases lift the score, they do not gate.

    Plan shape: the phrase contribs are one extra stream unioned into
    the SAME accumulate — no second window, no extra shuffle beyond the
    phrase occurrence joins themselves."""
    from jassjr_spark.operators.search import (
        accumulate, resolve_docnos, score_postings, top_k,
    )
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    spark = positions.sparkSession
    # phrase entries pass through verbatim: 3-tuples are exact phrases,
    # 4-tuples (qid, slot, terms, slop) are ordered span-near clauses
    ph = phrase_contribs(positions, index.doc_lengths, list(phrases), s)
    scored = None
    if queries is not None:
        bad = queries.filter(F.col("pos") >= PHRASE_POS_BASE).count()
        if bad:
            raise ValueError(
                f"plain-term positions must stay < {PHRASE_POS_BASE}"
            )
        qterms = [r.term for r in queries.select("term").distinct().collect()]
        scored = score_postings(
            queries, pruned_postings(index, qterms), index.dictionary,
            s["n_docs"], s["avgdl"], qterms=qterms,
        ).select("query_id", "docid", "pos", "contrib")
    if scored is None and ph is None:
        return spark.createDataFrame(
            [], "query_id long, docno string, rank long, rsv double"
        )
    both = scored.unionByName(ph) if scored is not None and ph is not None \
        else (scored if scored is not None else ph)
    return resolve_docnos(index, top_k(accumulate(both), k), s["n_docs"])

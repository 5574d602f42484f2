"""More-like-this: rank documents similar to a given source document.

The reference engine answers only explicit term queries
(``JASSjr_search.py:61-88``); "find documents like this one" is the
standard next ask (Lucene's MoreLikeThis). Re-expressed Spark-first on
top of the existing S1-S10 pipeline:

1. the SOURCE document is tokenized with the exact index tokenizer
   (``doc_term_frequencies`` on a one-row frame — a pruned single-doc
   scan, never a corpus pass);
2. its terms are weighted tf * ln(N/df) — df probed from the dictionary
   the same driver-probe way S4 does, the log taken with CPython
   ``math.log`` for the repo-wide cross-engine ulp-identity guarantee;
3. the top ``n_terms`` (weight desc, term asc; df bounds
   ``min_df <= df < N`` applied first) become a plain disjunctive BM25
   query through ``search()`` — every downstream optimization (bucket
   pruning, broadcast query join, ordered fold) applies unchanged;
4. the source document itself is excluded and ranks are recomputed.

At 100 TB this is two driver-probe lookups (one doc's terms, their df)
plus one ordinary k-term query — no new shuffle shape anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.functions.tokenize import doc_term_frequencies
from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import search

DEFAULT_N_TERMS = 10
DEFAULT_MIN_DF = 2


def mlt_terms(
    index: Index,
    docs: DataFrame,
    docid: int,
    n_terms: int = DEFAULT_N_TERMS,
    min_df: int = DEFAULT_MIN_DF,
    stats: dict | None = None,
) -> list[str]:
    """The source document's top tf*idf terms, selection fully
    deterministic: weight desc, then term asc; terms with df < min_df
    (too rare to generalize) or df == N (idf 0) never qualify."""
    src = docs.filter(F.col("docid") == docid).select(
        "docid", F.lit("").alias("docno"), "content"
    )
    tf_rows = (
        doc_term_frequencies(src, prepend_docno=False)
        .select("term", "tf")
        .collect()
    )
    s = stats or index.scalar_stats()
    n = s["n_docs"]
    terms = sorted({r.term for r in tf_rows})
    dfmap = {
        r.term: r.df
        for r in index.dictionary.filter(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    }
    weighted = []
    for r in tf_rows:
        df = dfmap.get(r.term)
        if df is None or df < min_df or df >= n:
            continue
        weighted.append((r.tf * math.log(n / df), r.term))
    weighted.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in weighted[:n_terms]]


def more_like_this(
    index: Index,
    docs: DataFrame,
    docid: int,
    k: int = 10,
    n_terms: int = DEFAULT_N_TERMS,
    min_df: int = DEFAULT_MIN_DF,
) -> DataFrame:
    """(docno, rank, rsv) of the k documents most like ``docid``.

    ``docs`` must carry (docid, docno, content) for the corpus the index
    was built over. The source document is excluded; ranks are
    recomputed over the survivors (rsv desc, docno desc)."""
    spark = docs.sparkSession
    terms = mlt_terms(index, docs, docid, n_terms=n_terms, min_df=min_df)
    if not terms:
        return spark.createDataFrame([], "docno string, rank long, rsv double")
    queries = spark.createDataFrame(
        [(docid, p, t) for p, t in enumerate(terms)],
        "query_id long, pos int, term string",
    )
    src_docno = docs.filter(F.col("docid") == docid).select("docno").first().docno
    run = search(index, queries, k=k + 1, qterms=terms).filter(
        F.col("docno") != src_docno
    )
    w = Window.orderBy(F.col("rsv").desc(), F.col("docno").desc())
    return (
        run.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("docno", "rank", "rsv")
    )

"""Query-time synonym expansion with merged statistics.

The reference scores each query token against its own postings list
verbatim (``JASSjr_search.py:64-88``) — no vocabulary normalization of
any kind. Lucene's SynonymQuery semantics: terms in one synonym group score as if
they were ONE term — per-document tf is the SUM over members, df is the
count of documents containing ANY member — so a synonym never inflates
a document's score the way naive query expansion (one contribution per
member) would.

Spark-first shape: only the postings of the query's member terms are
fetched (bucket+term-pruned scan, the S5 discipline), remapped to their
canonical and re-aggregated per (canonical, docid) — integer tf sums,
one shuffle over the fetched lists only, never the index. Merged df is
one tiny aggregate over the same frame; idf stays CPython ``math.log``
(the repo-wide ulp guarantee). Scoring reuses bm25_contrib and the
position-ordered fold, so the whole mode is oracle-exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import Index
from jassjr_spark.operators.search import (
    accumulate,
    bm25_contrib,
    resolve_docnos,
    top_k,
)


def synonym_search(
    index: Index,
    queries: DataFrame,
    synonyms: dict[str, str],
    k: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """(query_id, pos, term) + {member term -> canonical} -> ranked run.

    Query terms are mapped to their canonical driver-side (bag
    semantics: two query terms mapping to one canonical contribute
    twice, like a repeated term). Terms outside every group behave
    exactly as in plain search(). A canonical whose merged df == N is
    elided (idf 0); a canonical with no postings drops out.
    """
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    n_docs, avgdl = s["n_docs"], s["avgdl"]
    spark = queries.sparkSession

    qrows = queries.select("query_id", "pos", "term").collect()
    canon_of = lambda t: synonyms.get(t, t)  # noqa: E731
    q_canon = [(r.query_id, r.pos, canon_of(r.term)) for r in qrows]
    needed_canons = {c for _, _, c in q_canon}
    # every member term whose canonical the query needs
    members = sorted(
        {t for t, c in synonyms.items() if c in needed_canons}
        | {c for c in needed_canons}
    )

    canon_col = (
        F.coalesce(
            F.create_map(
                *[F.lit(x) for pair in synonyms.items() for x in pair]
            )[F.col("term")],
            F.col("term"),
        )
        if synonyms else F.col("term")
    )
    fetched = pruned_postings(index, members).withColumn("canon", canon_col)
    merged = fetched.groupBy("canon", "docid").agg(
        F.sum("tf").cast("int").alias("tf"), F.min("dl").alias("dl")
    )
    dfs = {
        r.canon: r.df
        for r in merged.groupBy("canon")
        .agg(F.countDistinct("docid").cast("long").alias("df"))
        .collect()
    }
    idf = [
        (c, math.log(n_docs / dfs[c]))
        for c in sorted(needed_canons)
        if c in dfs and dfs[c] < n_docs
    ]
    qdf = spark.createDataFrame(
        q_canon, "query_id long, pos int, canon string"
    ).join(
        F.broadcast(spark.createDataFrame(idf, "canon string, idf double")),
        "canon",
    )
    scored = merged.join(
        F.broadcast(qdf.select("query_id", "pos", "canon", "idf")), "canon"
    ).select(
        "query_id", "docid", "pos", bm25_contrib(avgdl).alias("contrib")
    )
    return resolve_docnos(index, top_k(accumulate(scored), k), n_docs)

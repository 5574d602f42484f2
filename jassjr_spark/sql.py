"""SQL surface: the index as temp views + BM25 as a pure spark.sql query.

The engine's DataFrame operators ARE Catalyst plans, so the same
capabilities are reachable from SQL — useful for users who live in
spark.sql / notebooks, and a direct demonstration that the index tables
are ordinary relations (SURVEY.md §2.4 notes the reference has no SQL at
all; this is additive surface, not reference parity).

`bm25_sql` mirrors the engine's scoring shape (same expression tree, ATIRE
BM25, rank over ROUNDED 4-dp scores with docid-desc tie-break — the
cross-engine-reproducible ranking the driver contract uses; the
bit-exact-float REPL semantics stay with operators/search.py where the
ordered fold lives).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from jassjr_spark.constants import B, K1
from jassjr_spark.operators.index_build import Index


def register_index_views(
    spark: SparkSession, index: Index, prefix: str = ""
) -> list[str]:
    """Expose the index artifacts as temp views
    ``{prefix}postings/dictionary/doc_lengths/docids/stats``; returns the
    view names."""
    names = []
    for name, df in (
        ("postings", index.postings),
        ("dictionary", index.dictionary),
        ("doc_lengths", index.doc_lengths),
        ("docids", index.docids),
        ("stats", index.stats),
    ):
        v = f"{prefix}{name}"
        df.createOrReplaceTempView(v)
        names.append(v)
    return names


def bm25_sql(query_values: str, k: int = 10, prefix: str = "") -> str:
    """BM25 top-k as ONE Spark-SQL statement over the registered views.

    query_values: SQL VALUES rows ``(query_id, pos, term)`` e.g.
    ``(1, 0, 'spark'), (1, 1, 'join')``. Rank is over round(rsv, 4) with
    docid-descending ties (the driver-contract ranking)."""
    p = prefix
    return f"""
WITH queries(query_id, pos, term) AS (VALUES {query_values}),
n AS (SELECT n_docs FROM {p}stats),
avg_dl AS (SELECT avgdl FROM {p}stats),
scored AS (
  SELECT q.query_id, po.docid,
         LN(CAST(n.n_docs AS DOUBLE) / d.df)
           * ((po.tf * ({K1} + 1.0))
              / (po.tf + {K1} * ((1.0 - {B})
                 + {B} * (CAST(po.dl AS DOUBLE) / a.avgdl)))) AS contrib
  FROM queries q
  JOIN {p}dictionary d ON q.term = d.term
  JOIN {p}postings po ON q.term = po.term
  CROSS JOIN n CROSS JOIN avg_dl a
  WHERE d.df < n.n_docs
),
acc AS (
  SELECT query_id, docid, ROUND(SUM(contrib), 4) AS rsv
  FROM scored GROUP BY query_id, docid
),
ranked AS (
  SELECT query_id, docid, rsv,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rsv DESC, docid DESC) AS rank
  FROM acc WHERE rsv > 0
)
SELECT r.query_id, dn.docno, CAST(r.rank AS BIGINT) AS rank, r.rsv
FROM ranked r JOIN {p}docids dn ON r.docid = dn.docid
WHERE r.rank <= {k}
"""


def wildcard_sql(
    prefix_values: str, k: int = 10, max_expansions: int = 50,
    prefix: str = "",
) -> str:
    """Wildcard-prefix BM25 top-k as ONE Spark-SQL statement — the
    multi-term rewrite is itself relational: expansion is a dictionary
    scan + per-slot cap window, scoring the same BM25 tree as bm25_sql.

    prefix_values: SQL VALUES rows ``(query_id, slot, pfx)`` e.g.
    ``(1, 0, 'sp'), (1, 1, 'jo')``. Expansions capped at
    ``max_expansions`` per slot by (cf desc, term asc), each scoring
    with its own idf — identical semantics to operators/fuzzy.py's
    expand_prefix + search."""
    p = prefix
    return f"""
WITH prefixes(query_id, slot, pfx) AS (VALUES {prefix_values}),
exp AS (
  SELECT x.query_id, x.slot, d.term, d.cf,
         ROW_NUMBER() OVER (PARTITION BY x.query_id, x.slot
                            ORDER BY d.cf DESC, d.term ASC) AS rnk
  FROM prefixes x JOIN {p}dictionary d ON startswith(d.term, x.pfx)
),
queries AS (
  SELECT query_id, term FROM exp WHERE rnk <= {max_expansions}
),
n AS (SELECT n_docs FROM {p}stats),
avg_dl AS (SELECT avgdl FROM {p}stats),
scored AS (
  SELECT q.query_id, po.docid,
         LN(CAST(n.n_docs AS DOUBLE) / d.df)
           * ((po.tf * ({K1} + 1.0))
              / (po.tf + {K1} * ((1.0 - {B})
                 + {B} * (CAST(po.dl AS DOUBLE) / a.avgdl)))) AS contrib
  FROM queries q
  JOIN {p}dictionary d ON q.term = d.term
  JOIN {p}postings po ON q.term = po.term
  CROSS JOIN n CROSS JOIN avg_dl a
  WHERE d.df < n.n_docs
),
acc AS (
  SELECT query_id, docid, ROUND(SUM(contrib), 4) AS rsv
  FROM scored GROUP BY query_id, docid
),
ranked AS (
  SELECT query_id, docid, rsv,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rsv DESC, docid DESC) AS rank
  FROM acc WHERE rsv > 0
)
SELECT r.query_id, dn.docno, CAST(r.rank AS BIGINT) AS rank, r.rsv
FROM ranked r JOIN {p}docids dn ON r.docid = dn.docid
WHERE r.rank <= {k}
"""

"""KWIC snippet extraction / hit highlighting for ranked results.

The reference's search pipeline stops at the TREC run line
(``JASSjr_search.py:103-105`` prints qid/docno/rank/rsv only); any real
search UI then needs the "why did this hit" context — a keyword-in-
context window around the first query-term occurrence, with the match
highlighted. This re-expresses that classic last-mile step Spark-first:

* results (the top-k, tiny) are broadcast against ``docs`` so content is
  scanned ONLY for hit docids — at 100 TB the content join is a
  broadcast-semi-join-shaped probe, never a full corpus scan;
* per (query, doc), every query term's first occurrence is located with
  JVM ``locate`` on ``lower(content)`` (no UDF), the earliest wins
  (ties: term asc), and one window of ``radius`` chars each side is cut
  with pure ``substring`` arithmetic;
* the matched span is wrapped in ``[`` ``]`` from the ORIGINAL content
  (case preserved), so ``snippet`` is exactly what a UI renders.

Every step is ANSI-SQL-expressible (strpos/substr), so the operator is
oracle-gated end-to-end (driver entry ``ft_snippets``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RADIUS = 40


def snippets(
    results: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    radius: int = DEFAULT_RADIUS,
    id_col: str = "docid",
    content_col: str = "content",
    fragments: int = 1,
) -> DataFrame:
    """Attach a highlighted KWIC snippet to each (query_id, docid) result.

    ``results``: any DataFrame with (query_id, docid) — typically a top-k
    run; all its other columns (rank, rsv, docno, ...) pass through.
    ``queries``: (query_id, term) rows (extra columns ignored).

    For each result row, the earliest first-occurrence among the query's
    terms in ``lower(content)`` anchors the snippet; a result whose terms
    match only outside ``content`` (e.g. the DOCNO token) yields no row.
    Output adds: term (the anchoring term), pos (1-based char offset),
    fragment (1..``fragments``, position order), snippet
    (``...prefix[Match]suffix...`` window, original case). With
    ``fragments`` > 1, up to that many windows are kept per result —
    one per distinct term's first occurrence, earliest first.
    """
    content = F.col(content_col)
    pos = F.expr(f"locate(term, lower({content_col}))")
    # (top-k run x query terms) is driver-bounded by construction — pin
    # the broadcast so the content probe never shuffles at any scale
    hits = (
        docs.select(id_col, content_col)
        .join(
            F.broadcast(
                results.join(queries.select("query_id", "term"), "query_id")
            ),
            id_col,
        )
        .withColumn("pos", pos)
        .filter(F.col("pos") > 0)
    )
    w = Window.partitionBy("query_id", id_col).orderBy("pos", "term")
    first = hits.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= fragments
    )
    start = F.greatest(F.lit(1), F.col("pos") - radius)
    mlen = F.length("term")
    prefix = F.substring(content, start, F.col("pos") - start)
    match = F.substring(content, F.col("pos"), mlen)
    suffix = F.substring(content, F.col("pos") + mlen, F.lit(radius))
    return (
        first.withColumn(
            "snippet", F.concat(prefix, F.lit("["), match, F.lit("]"), suffix)
        )
        .withColumn("fragment", F.col("_rn").cast("long"))
        .drop("_rn", content_col)
    )


def snippet_sql(
    radius: int = DEFAULT_RADIUS, content_expr: str = "c.content"
) -> dict[str, str]:
    """The oracle-side fragments mirroring snippets() exactly (shared by
    the driver entry so Spark and SQL can't drift independently)."""
    pos = f"strpos(lower({content_expr}), q.term)"
    start = f"greatest(1, h.pos - {radius})"
    return {
        "pos": pos,
        "snippet": (
            f"substr({content_expr}, {start}, h.pos - {start})"
            f" || '[' || substr({content_expr}, h.pos, length(h.term))"
            f" || ']' || substr({content_expr}, h.pos + length(h.term),"
            f" {radius})"
        ),
    }

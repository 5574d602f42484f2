"""Percolation: registered queries matched against incoming documents.

Ordinary search asks "which documents match this query"; percolation
inverts it — "which REGISTERED queries match this document" — the
ES percolator / saved-search alerting pattern a production engine pairs
with its streaming ingest (the reference has neither streams nor stored
queries; this extends its search algebra to the alerting direction).

Semantics: a stored query is a set of terms (query_id, term) with
CONJUNCTIVE match — the document must contain every term (the classic
boolean-alert contract: an alert that fires on a subset match is
noise). Terms are compared under the index tokenizer rules; a stored
query with zero lexable terms never matches.

Plan shape (scale): the registered query set is small relative to the
document stream, so it BROADCASTS; each incoming document tokenizes
once (the same map-only Arrow kernel as indexing) into distinct
(docid, term) rows, the broadcast join emits only (doc, query) pairs
that share a term, and one partial-aggregated count-distinct == need
filter finishes the conjunction. Nothing corpus-sized shuffles; cost
is per-batch, independent of index size. The streaming face wraps the
same batch operator in foreachBatch like search_stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def percolate(docs: DataFrame, stored: DataFrame) -> DataFrame:
    """docs (docid, docno, content) x stored (query_id, term[, negated
    bool]) -> (docid, query_id): every registered query whose positive
    terms ALL occur in the document and whose negated terms (alert
    suppressions — '-term' in the alert definition) occur NOT AT ALL.
    Both sides' multiplicities are irrelevant (set semantics on terms).
    A stored query with no positive terms raises: a pure-negative alert
    names (almost) the whole stream — define it positively instead."""
    from jassjr_spark.functions.tokenize import doc_term_frequencies

    has_neg = "negated" in stored.columns
    pos = stored.filter(~F.col("negated")) if has_neg else stored
    q = pos.select("query_id", "term").distinct()
    if has_neg:
        dead = (
            stored.select("query_id").distinct()
            .join(q.select("query_id").distinct(), "query_id", "left_anti")
            .collect()
        )
        if dead:
            raise ValueError(
                "stored queries with no positive terms: "
                f"{sorted(r.query_id for r in dead)}"
            )
    doc_terms = doc_term_frequencies(docs, prepend_docno=False) \
        .select("docid", "term")
    need = q.groupBy("query_id").agg(
        F.countDistinct("term").cast("long").alias("need")
    )
    hits = (
        doc_terms.join(F.broadcast(q), "term")
        .groupBy("docid", "query_id")
        .agg(F.countDistinct("term").cast("long").alias("matched"))
        .join(F.broadcast(need), "query_id")
        .filter(F.col("matched") == F.col("need"))
        .select("docid", "query_id")
    )
    if has_neg:
        neg = stored.filter(F.col("negated")) \
            .select("query_id", "term").distinct()
        suppressed = doc_terms.join(F.broadcast(neg), "term") \
            .select("docid", "query_id").distinct()
        hits = hits.join(suppressed, ["docid", "query_id"], "left_anti")
    return hits


def start_percolate_stream(
    spark: SparkSession,
    doc_stream: DataFrame,
    stored: DataFrame,
    output_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """doc_stream: streaming DataFrame with (docid, docno, content).
    Appends (docid, query_id) parquet per micro-batch — the alert feed.
    The stored-query set — INCLUDING suppression flags — is materialized
    ONCE at stream start (alert registries change rarely; restart the
    stream to re-register) so a mutated source table cannot silently
    change alerting mid-stream; a pure-negative registration fails here,
    at start, not per batch."""
    has_neg = "negated" in stored.columns
    cols = ["query_id", "term"] + (["negated"] if has_neg else [])
    reg = stored.select(*cols).distinct().collect()
    schema = "query_id long, term string" + (
        ", negated boolean" if has_neg else ""
    )
    stored_rows = spark.createDataFrame([tuple(r) for r in reg], schema)
    if has_neg:
        with_pos = {r.query_id for r in reg if not r.negated}
        dead = sorted({r.query_id for r in reg} - with_pos)
        if dead:
            raise ValueError(
                f"stored queries with no positive terms: {dead}"
            )

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        percolate(batch, stored_rows).write.mode("append") \
            .parquet(output_path)

    writer = doc_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

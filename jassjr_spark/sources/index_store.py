"""Persisted index store — the CIvocab/CIpostings analogue (SURVEY.md §2 I10,
§7 stage 2).

Layout on disk (all Parquet):

    {path}/postings/bucket=NN/...   (term, docid, tf, dl) term-bucket-hashed,
                                    sorted (term, docid) within files
    {path}/dictionary/              (term, df, cf)
    {path}/doc_lengths/             (docid, len)
    {path}/docids/                  (docid, docno)
    {path}/stats/                   (n_docs, avgdl, total_terms, vocab_size)
    {path}/blocks/bucket=NN/...     optional compressed+blocked postings
                                    (see functions/compression.py)

Why this layout scales:
* ``bucket = md5(term) % n_buckets`` is computable engine-side (Column
  expr) AND driver-side (hashlib) — so at query time the searcher maps its
  handful of query terms to bucket ids in Python and filters
  ``bucket IN (...)``: Spark prunes whole directories before any I/O
  (partition pruning), the distributed analogue of the reference's
  per-term fseek (JASSjr_search.cpp:197-202).
* within a bucket, files are sorted by (term, docid): Parquet row-group
  min/max stats on ``term`` prune the remaining pages (``term IN``
  pushdown shows up as PushedFilters in the scan), and postings for one
  term are contiguous and docid-ascending — the reference's
  postings-contiguity invariant (JASSjr_index.cpp:201-218) recovered on a
  column store.
* buckets also bound shuffle fan-in for index *merges*: two indexes with
  the same bucketing merge bucket-by-bucket with no global shuffle.

md5 (not Spark's murmur ``F.hash``) keeps the bucket function portable
across engines and stable across Spark versions — bucket placement is part
of the on-disk contract.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import Index

DEFAULT_BUCKETS = 32


def term_bucket_py(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver-side bucket id; MUST equal term_bucket_col for every term."""
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def term_bucket_col(term_col, n_buckets: int = DEFAULT_BUCKETS):
    """Engine-side bucket id: md5 hex prefix -> int -> mod."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


# Version of the compressed blocks PAYLOAD layout (functions/compression):
#   1 = varbyte(n) ++ varbyte(gaps) ++ varbyte(tfs)            (round 1)
#   2 = format 1 ++ varbyte(dls)  (dl rides in the payload so the WAND
#       kernel never joins doc_lengths)                        (round 2+)
# Recorded in _meta so a reader can refuse a store written under an older
# layout with a clear message instead of failing mid-decode with an
# opaque array-length error (ADVICE r2).
BLOCKS_FORMAT = 2


def write_meta(
    spark: SparkSession, path: str, n_buckets: int, block_span: int = 0,
    blocks_format: int | None = None,
) -> None:
    """Layout metadata is part of the on-disk contract: a reader hashing
    query terms with a different modulus would prune the wrong buckets."""
    if blocks_format is None:
        blocks_format = BLOCKS_FORMAT if block_span else 0
    spark.createDataFrame(
        [(n_buckets, block_span, blocks_format)],
        "n_buckets int, block_span int, blocks_format int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_meta")


def read_meta(spark: SparkSession, path: str) -> dict:
    """n_buckets=0 on a missing/corrupt ``_meta`` — a guessed modulus would
    make pruned_postings hash query terms into the WRONG bucket directories
    and silently drop matching postings; 0 disables bucket pruning and the
    reader falls back to the (always-correct) term filter alone.

    A pre-versioning _meta (no blocks_format column) that has blocks is
    format 1 by definition — it predates the column AND the dl payload."""
    try:
        df = spark.read.parquet(f"{path}/_meta")
        row = df.first()
        if "blocks_format" in df.columns:
            fmt = row.blocks_format
        else:
            fmt = 1 if row.block_span else 0
        return {"n_buckets": row.n_buckets, "block_span": row.block_span,
                "blocks_format": fmt}
    except Exception:
        return {"n_buckets": 0, "block_span": 0, "blocks_format": 0}


def check_blocks_format(meta: dict, path: str = "") -> None:
    """Fail loudly (and actionably) when a persisted blocks table was
    written under a different payload layout than this engine decodes."""
    fmt = meta.get("blocks_format", 0)
    if meta.get("block_span") and fmt != BLOCKS_FORMAT:
        raise ValueError(
            f"persisted blocks at {path!r} use payload format {fmt}; this "
            f"engine decodes format {BLOCKS_FORMAT}. Rebuild the blocks "
            "stage (plans/build_job.py) or query without --wand."
        )


def write_index(index: Index, path: str, n_buckets: int = DEFAULT_BUCKETS) -> None:
    # _meta first: a crash mid-write leaves a meta whose modulus matches
    # whatever postings eventually land; a reader of a half-written index
    # may see missing rows but never wrong-bucket pruning.
    write_meta(index.postings.sparkSession, path, n_buckets)
    (
        index.postings
        .withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "docid")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    index.dictionary.write.mode("overwrite").parquet(f"{path}/dictionary")
    index.doc_lengths.write.mode("overwrite").parquet(f"{path}/doc_lengths")
    index.docids.write.mode("overwrite").parquet(f"{path}/docids")
    index.stats.write.mode("overwrite").parquet(f"{path}/stats")


def read_index(spark: SparkSession, path: str) -> Index:
    meta = read_meta(spark, path)
    return Index(
        postings=spark.read.parquet(f"{path}/postings"),
        dictionary=spark.read.parquet(f"{path}/dictionary"),
        doc_lengths=spark.read.parquet(f"{path}/doc_lengths"),
        docids=spark.read.parquet(f"{path}/docids"),
        stats=spark.read.parquet(f"{path}/stats"),
        n_buckets=meta["n_buckets"],
    )


def pruned_postings(index: Index, terms: list[str]) -> DataFrame:
    """Postings restricted to ``terms`` with bucket-directory pruning.

    The ``bucket IN`` predicate prunes partitions at planning time; the
    ``term IN`` predicate pushes into the Parquet scan (row-group min/max
    on the sorted term column). Works on any Index whose postings carry a
    ``bucket`` column (modulus from index.n_buckets, recorded at write
    time); falls back to the term filter alone otherwise.
    """
    p = index.postings
    if "bucket" in p.columns and index.n_buckets > 0:
        buckets = sorted({term_bucket_py(t, index.n_buckets) for t in terms})
        p = p.filter(F.col("bucket").isin(buckets))
    return p.filter(F.col("term").isin(list(terms)))


def merged_postings(a: Index, b: Index, offset: int) -> DataFrame:
    """The zero-shuffle postings merge plan (see merge_indexes): union +
    docid offset + in-task sort — no Exchange anywhere (plan-gated)."""
    shift = (F.col("docid") + F.lit(offset)).cast("long").alias("docid")
    return (
        a.postings.unionByName(b.postings.withColumn("docid", shift))
        .sortWithinPartitions("term", "docid")
    )


def merge_indexes(
    spark: SparkSession, path_a: str, path_b: str, dst: str
) -> None:
    """Merge two persisted indexes into a third WITHOUT a global shuffle
    on the postings — the payoff of the shared bucket layout (module
    docstring: "two indexes with the same bucketing merge bucket-by-
    bucket"). The sharded-build shape at 10^12 docs: index disjoint
    corpus shards independently (each a spark-submit job), then merge —
    the merge moves no postings row across the network.

    * docids: shard B's are offset by shard A's n_docs, so the merged
      docid space is the concatenation A ++ B (callers own docno
      uniqueness across shards, as with any sharded build).
    * postings/doc_lengths/docids: union + map (the offset), per-task
      sort within files, written back under the same bucket dirs — scan
      tasks are per-file, sortWithinPartitions is in-task, and the
      partitionBy write needs no exchange: ZERO shuffles (plan-gated in
      tests).
    * dictionary: full-outer merge summing df/cf — the one shuffle, and
      it is vocab-sized, not postings-sized.
    * stats: recomputed from the merged scalars (exact: avgdl is a
      weighted mean of the shard avgdls).

    Requires both inputs bucketed with the same modulus (the on-disk
    contract makes any other merge silently wrong, so it raises).
    """
    meta_a, meta_b = read_meta(spark, path_a), read_meta(spark, path_b)
    if not meta_a["n_buckets"] or meta_a["n_buckets"] != meta_b["n_buckets"]:
        raise ValueError(
            f"bucket moduli differ or are unset ({meta_a['n_buckets']} vs "
            f"{meta_b['n_buckets']}); rebuild one side with a matching "
            "n_buckets — merging across moduli would interleave terms "
            "into wrong bucket directories"
        )
    n_buckets = meta_a["n_buckets"]
    a, b = read_index(spark, path_a), read_index(spark, path_b)
    offset = int(a.stats.first().n_docs)

    write_meta(spark, dst, n_buckets)
    shift = (F.col("docid") + F.lit(offset)).cast("long").alias("docid")
    (
        merged_postings(a, b, offset)
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{dst}/postings")
    )
    (
        a.doc_lengths.unionByName(b.doc_lengths.withColumn("docid", shift))
        .write.mode("overwrite").parquet(f"{dst}/doc_lengths")
    )
    (
        a.docids.unionByName(b.docids.withColumn("docid", shift))
        .write.mode("overwrite").parquet(f"{dst}/docids")
    )
    (
        a.dictionary.join(
            b.dictionary.withColumnsRenamed({"df": "df_b", "cf": "cf_b"}),
            "term", "full_outer",
        )
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("df_b", F.lit(0)))
            .alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.coalesce("cf_b", F.lit(0)))
            .cast("long").alias("cf"),
        )
        .write.mode("overwrite").parquet(f"{dst}/dictionary")
    )
    sa, sb = a.stats.first(), b.stats.first()
    n = int(sa.n_docs) + int(sb.n_docs)
    total = int(sa.total_terms) + int(sb.total_terms)
    vocab = spark.read.parquet(f"{dst}/dictionary").count()
    spark.createDataFrame(
        [(n, total / n if n else 0.0, total, vocab)],
        "n_docs long, avgdl double, total_terms long, vocab_size long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{dst}/stats")

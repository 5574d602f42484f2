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
    # Crash ordering for IN-PLACE rewrites: delete any existing _meta
    # first and write the new one LAST, so meta presence certifies a
    # complete store. (Meta-first was only safe for a FRESH path — on a
    # rebuild with a different n_buckets, a crash mid-write would leave
    # the NEW modulus over the OLD bucket layout and pruned_postings
    # would silently prune the wrong directories. With meta absent,
    # read_meta degrades to n_buckets=0 = no bucket pruning, which is
    # always correct.) Stale delete tombstones from a previous LSM life
    # of the path are removed too: read_index applies any _tombstones it
    # finds by docno, which would silently mask freshly written docs.
    spark = index.postings.sparkSession
    _rm_store_dir(spark, f"{path}/_meta")
    _rm_store_dir(spark, f"{path}/_tombstones")
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
    write_meta(spark, path, n_buckets)  # last: certifies a complete store


def _rm_store_dir(spark: SparkSession, p: str) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    fs = jpath.getFileSystem(conf)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def tombstones_df(spark: SparkSession, path: str) -> DataFrame | None:
    """The delete-tombstone table (docno, tomb_epoch) at ``{path}/_tombstones``
    (written by streaming.incremental.delete_documents), or None when the
    index has no deletes pending. Underscore-prefixed, so segment-table
    partition discovery never sees it."""
    try:
        t = spark.read.parquet(f"{path}/_tombstones")
        t.schema  # force resolution now, not at first action
        return t
    except Exception:
        return None


def masked_docid_set(spark: SparkSession, path: str) -> DataFrame | None:
    """docids masked by pending tombstones, or None when there are none.

    LSM versioned-delete semantics: a tombstone written when the index's
    last applied epoch was E masks occurrences of its docno in segments
    with epoch <= E only — a LATER re-append of the same docno gets a new
    docid in a newer epoch and stays visible. Resolution is docno -> docid
    through the docids table, so masking downstream tables is a docid
    anti-join (every segment table is keyed by docid). On an epoch-less
    (batch write_index) store the mask is by docno alone: no epochs means
    no re-append ordering to preserve.
    """
    tombs = tombstones_df(spark, path)
    if tombs is None:
        return None
    docids = spark.read.parquet(f"{path}/docids")
    if "epoch" in docids.columns:
        cond = (docids["docno"] == tombs["docno"]) & (
            docids["epoch"] <= tombs["tomb_epoch"]
        )
        hit = docids.join(tombs, cond, "left_semi")
    else:
        hit = docids.join(tombs.select("docno"), "docno", "left_semi")
    return hit.select("docid").distinct()


def read_index(spark: SparkSession, path: str,
               as_of: int | None = None) -> Index:
    """Load the persisted index; when delete tombstones are pending the
    row tables come back masked (docid anti-join against the resolved
    masked set — per-doc BM25 independence means surviving docs' scores
    are unchanged by masking). Dictionary/stats stay as written: deleted
    docs keep counting toward df/N/avgdl until a compaction physically
    purges them — the documented deleted-docs-in-stats staleness every
    segmented search engine accepts between delete and merge. The masked
    set is deletes-sized, so AQE broadcasts the anti-joins at scale.

    ``as_of=E`` time-travels: the LOGICAL snapshot at epoch E — exactly
    the documents appended at epochs <= E and not tombstoned by deletes
    issued at or before E (an Iceberg-style snapshot read over the LSM
    epoch layout). Epoch-partition pruning does the filtering; the
    dictionary/stats are recomputed over the snapshot's live rows (so,
    unlike a physical reader at the time, the snapshot never carries the
    pre-compaction stats staleness — it is the index as if built from
    the then-live documents). Compaction is snapshot expiry: epochs at
    or below a merged run's label — and, for purging merges, below the
    purged tombstones' horizon — are gone (streaming.incremental.
    snapshot_floor); reads below the floor raise rather than silently
    serving a partial snapshot.
    """
    meta = read_meta(spark, path)
    if as_of is not None:
        return _read_index_as_of(spark, path, meta, as_of)
    postings = spark.read.parquet(f"{path}/postings")
    doc_lengths = spark.read.parquet(f"{path}/doc_lengths")
    docids = spark.read.parquet(f"{path}/docids")
    masked = masked_docid_set(spark, path)
    if masked is not None:
        postings = postings.join(masked, "docid", "left_anti")
        doc_lengths = doc_lengths.join(masked, "docid", "left_anti")
        docids = docids.join(masked, "docid", "left_anti")
    return Index(
        postings=postings,
        dictionary=spark.read.parquet(f"{path}/dictionary"),
        doc_lengths=doc_lengths,
        docids=docids,
        stats=spark.read.parquet(f"{path}/stats"),
        n_buckets=meta["n_buckets"],
    )


def _read_index_as_of(
    spark: SparkSession, path: str, meta: dict, as_of: int,
) -> Index:
    """The as-of snapshot assembly behind read_index(as_of=): epoch-cut
    segment tables, epoch-cut tombstone mask, recomputed dictionary/stats.
    The epoch cut is a partition-directory prune (epoch is a partition
    column), so the scan reads only the snapshot's segments."""
    from jassjr_spark.streaming.incremental import snapshot_floor

    postings = spark.read.parquet(f"{path}/postings")
    if "epoch" not in postings.columns:
        raise ValueError(
            f"index at {path!r} is not epoch-segmented (batch write_index "
            "layout) — as_of reads need the streaming append layout"
        )
    floor = snapshot_floor(spark, path)
    if floor is not None and as_of < floor:
        raise ValueError(
            f"snapshot at epoch {as_of} is no longer reconstructable: "
            f"compaction folded history up to epoch {floor} (the "
            "expire-snapshots tradeoff) — oldest readable snapshot is "
            f"{floor}"
        )
    cut = F.col("epoch") <= as_of
    postings = postings.filter(cut).drop("epoch")
    doc_lengths = spark.read.parquet(f"{path}/doc_lengths").filter(cut) \
        .drop("epoch")
    docids_e = spark.read.parquet(f"{path}/docids").filter(cut)

    tombs = tombstones_df(spark, path)
    if tombs is not None:
        tombs = tombs.filter(F.col("tomb_epoch") <= as_of)
        cond = (docids_e["docno"] == tombs["docno"]) & (
            docids_e["epoch"] <= tombs["tomb_epoch"]
        )
        masked = docids_e.join(tombs, cond, "left_semi") \
            .select("docid").distinct()
        postings = postings.join(masked, "docid", "left_anti")
        doc_lengths = doc_lengths.join(masked, "docid", "left_anti")
        docids_e = docids_e.join(masked, "docid", "left_anti")

    dictionary = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    stats = doc_lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.sum("len").cast("long").alias("total_terms"),
    ).crossJoin(dictionary.agg(F.count(F.lit(1)).alias("vocab_size")))
    return Index(
        postings=postings,
        dictionary=dictionary,
        doc_lengths=doc_lengths,
        docids=docids_e.drop("epoch"),
        stats=stats,
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


def _shifted(df: DataFrame, offset: int) -> DataFrame:
    if offset == 0:
        return df
    return df.withColumn(
        "docid", (F.col("docid") + F.lit(offset)).cast("long")
    )


def unioned_shards(dfs: list[DataFrame], offsets: list[int]) -> DataFrame:
    """k-way zero-shuffle union with per-shard docid offsets: union +
    map (the offset) only — scan tasks stay per-file, no Exchange."""
    out = _shifted(dfs[0], offsets[0])
    for df, off in zip(dfs[1:], offsets[1:]):
        out = out.unionByName(_shifted(df, off))
    return out


def merged_postings(
    indexes: "Index | list[Index]", b: "Index | None" = None,
    offset: int = 0, offsets: list[int] | None = None,
) -> DataFrame:
    """The zero-shuffle k-way postings merge plan (see merge_indexes):
    union + docid offset + in-task sort — no Exchange anywhere
    (plan-gated). Accepts a list of Index + ``offsets``, or the legacy
    two-index form ``merged_postings(a, b, offset)``."""
    if b is not None:
        indexes, offsets = [indexes, b], [0, offset]
    return unioned_shards(
        [i.postings for i in indexes], offsets
    ).sortWithinPartitions("term", "docid")


def merge_indexes(
    spark: SparkSession, srcs, dst: str, _legacy_dst: str | None = None,
    check_docnos: bool = False,
) -> None:
    """Merge k persisted shard indexes into one WITHOUT a global shuffle
    on the postings — the payoff of the shared bucket layout (module
    docstring: "two indexes with the same bucketing merge bucket-by-
    bucket"). The sharded-build shape at 10^12 docs: index disjoint
    corpus shards independently (each a spark-submit job), then ONE
    k-way merge — a 1000-shard build is a single merge generation, not
    the ~log2(1000)=10 pairwise rewrite generations of a binary merge
    tree (VERDICT r3 What's-missing #3). The merge moves no postings
    row across the network.

    ``srcs`` is a list of shard paths in concatenation order (the legacy
    2-ary form ``merge_indexes(spark, a, b, dst)`` still works).

    * docids: shard i's are offset by the total docid SPAN
      (max docid + 1) of shards 0..i-1, so the merged docid space is
      the shard concatenation. Span, not n_docs: a shard that was
      itself produced by a purging merge keeps its surviving docids
      (holes; max docid + 1 > n_docs), and an n_docs offset would
      overlap the next shard's range — duplicate docids across
      different documents, silent corruption no docno check can see.
      For dense shards span == n_docs and the two are identical. A
      purged-merge output therefore has docid holes: every join and
      scorer works on docid VALUES so results stay correct; the
      strict 0..N-1 ordinal is only restored by a rebuild, and fsck's
      docids_dense check reports the holes honestly. Callers own docno
      uniqueness across shards (as with any sharded build);
      ``check_docnos=True`` verifies it with one distinct-count over the
      merged docids table and raises on a collision.
    * postings/doc_lengths/docids: k-way union + map (the offset),
      per-task sort within files, written back under the same bucket
      dirs — scan tasks are per-file, sortWithinPartitions is in-task,
      and the partitionBy write needs no exchange: ZERO shuffles
      (plan-gated in tests).
    * dictionary: union + groupBy(term) summing df/cf — the one shuffle,
      and it is vocab-sized, not postings-sized.
    * stats: recomputed from the shard scalars (exact: avgdl is the
      docs-weighted mean of shard avgdls).
    * ``_meta`` is written LAST: its presence certifies every table
      above landed, so a crash mid-merge leaves a destination that
      read_meta reports as unbucketed/incomplete instead of silently
      serving a truncated index (mirrors append_documents'
      watermark-last ordering).

    Requires every input bucketed with the same modulus (the on-disk
    contract makes any other merge silently wrong, so it raises).
    """
    if isinstance(srcs, str):  # legacy merge_indexes(spark, a, b, dst)
        if _legacy_dst is None:
            raise TypeError("merge_indexes: pass a list of source paths")
        srcs, dst = [srcs, dst], _legacy_dst
    if len(srcs) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")
    metas = [read_meta(spark, p) for p in srcs]
    moduli = {m["n_buckets"] for m in metas}
    if 0 in moduli or len(moduli) != 1:
        raise ValueError(
            f"bucket moduli differ or are unset ({sorted(moduli)}); rebuild "
            "with a matching n_buckets — merging across moduli would "
            "interleave terms into wrong bucket directories"
        )
    n_buckets = metas[0]["n_buckets"]
    # a reused dst may carry a previous life's meta/tombstones: clear
    # them up front so a crash mid-merge can never leave an old meta
    # "certifying" a half-written merge, or stale tombstones masking
    # merged docs
    _rm_store_dir(spark, f"{dst}/_meta")
    _rm_store_dir(spark, f"{dst}/_tombstones")
    shards = [read_index(spark, p) for p in srcs]
    stats_rows = [s.stats.first() for s in shards]
    spans = [
        int(s.docids.agg(F.max("docid")).first()[0] or 0) + 1
        if int(r.n_docs) else 0
        for s, r in zip(shards, stats_rows)
    ]
    offsets, acc = [], 0
    for sp in spans:
        offsets.append(acc)
        acc += sp

    (
        merged_postings(shards, offsets=offsets)
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{dst}/postings")
    )
    (
        unioned_shards([s.doc_lengths for s in shards], offsets)
        .write.mode("overwrite").parquet(f"{dst}/doc_lengths")
    )
    (
        unioned_shards([s.docids for s in shards], offsets)
        .write.mode("overwrite").parquet(f"{dst}/docids")
    )
    if check_docnos:
        row = spark.read.parquet(f"{dst}/docids").agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("docno").alias("u"),
        ).first()
        if row.n != row.u:
            raise ValueError(
                f"duplicate docnos across shards ({row.n - row.u} "
                "collisions); shard corpora must be disjoint"
            )
    # a shard with pending delete tombstones loads MASKED (read_index), so
    # the merged row tables above are already physically purged — the merge
    # doubles as the compaction that applies deletes. Its dictionary/stats,
    # though, can no longer be the shard-scalar sum (those still count the
    # purged docs): recompute from the merged tables. That one
    # postings-sized aggregation is the price of purging; tombstone-free
    # merges keep the cheap scalar path.
    any_tombs = any(tombstones_df(spark, p) is not None for p in srcs)
    if any_tombs:
        (
            spark.read.parquet(f"{dst}/postings")
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"),
                 F.sum("tf").cast("long").alias("cf"))
            .write.mode("overwrite").parquet(f"{dst}/dictionary")
        )
        dl = spark.read.parquet(f"{dst}/doc_lengths")
        vocab = spark.read.parquet(f"{dst}/dictionary").count()
        (
            dl.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg("len").alias("avgdl"),
                F.sum("len").cast("long").alias("total_terms"),
            )
            .select("n_docs", "avgdl", "total_terms",
                    F.lit(vocab).cast("long").alias("vocab_size"))
            .coalesce(1).write.mode("overwrite").parquet(f"{dst}/stats")
        )
    else:
        dicts = shards[0].dictionary
        for s in shards[1:]:
            dicts = dicts.unionByName(s.dictionary)
        (
            dicts.groupBy("term")
            # long, matching build_index's persisted df schema — an int
            # cast would both drift the on-disk schema and silently wrap
            # for df >= 2^31 at the shard scale this module advertises
            .agg(F.sum("df").cast("long").alias("df"),
                 F.sum("cf").cast("long").alias("cf"))
            .write.mode("overwrite").parquet(f"{dst}/dictionary")
        )
        n = sum(int(r.n_docs) for r in stats_rows)
        total = sum(int(r.total_terms) for r in stats_rows)
        vocab = spark.read.parquet(f"{dst}/dictionary").count()
        spark.createDataFrame(
            [(n, total / n if n else 0.0, total, vocab)],
            "n_docs long, avgdl double, total_terms long, vocab_size long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{dst}/stats")
    write_meta(spark, dst, n_buckets)  # last: certifies a complete merge


def write_positions_store(
    positions: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Persist a positional side-table (operators/positional.py:
    build_positions output: term, docid, positions, tf) under the SAME
    term-bucket layout as the tf postings:

        {path}/positions/bucket=NN/...   sorted (term, docid) in-file

    Phrase / proximity / span queries at corpus scale must not
    re-tokenize the corpus per query — they need the positional table
    to be a write-once artifact with the same two-level pushdown as
    pruned_postings: bucket-directory pruning planned from the query's
    terms (driver-side md5, no I/O) + a term IN predicate into the
    Parquet row-group stats. A phrase query touching 3 terms then reads
    at most 3 bucket directories of position lists, never the corpus.

    _meta (shared schema with the tf store, block_span=0) is written
    FIRST for the same crash-ordering reason as write_index: a reader
    of a half-written store may see missing rows but never wrong-bucket
    pruning."""
    write_meta(positions.sparkSession, path, n_buckets)
    (
        positions
        .withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "docid")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/positions")
    )


def read_positions(spark: SparkSession, path: str) -> DataFrame:
    """The full persisted positional table (term, docid, positions, tf
    [, bucket]). Feed it to phrase_search / span_near_occurrences /
    proximity_occurrences directly, or through pruned_positions for the
    per-query scan."""
    return spark.read.parquet(f"{path}/positions")


def pruned_positions(
    spark: SparkSession, path: str, terms: list[str]
) -> DataFrame:
    """Positions restricted to ``terms`` with bucket-directory pruning +
    term pushdown — the positional twin of pruned_postings. Falls back
    to the (always-correct) term filter alone when _meta is unreadable
    (n_buckets=0: a guessed modulus would prune the WRONG directories
    and silently drop phrase matches).

    Term contract: unlike pruned_postings (which filters on terms
    EXACTLY as given), this normalizes each term with the indexer's
    lowercase + MAX_TOKEN_LEN truncation — phrase callers pass raw
    query words, and a positional row can only ever exist under the
    normalized form."""
    from jassjr_spark.constants import MAX_TOKEN_LEN

    meta = read_meta(spark, path)
    p = read_positions(spark, path)
    norm = sorted({t.lower()[:MAX_TOKEN_LEN] for t in terms})
    if meta["n_buckets"] > 0:
        buckets = sorted({term_bucket_py(t, meta["n_buckets"]) for t in norm})
        p = p.filter(F.col("bucket").isin(buckets))
    return p.filter(F.col("term").isin(norm))


# ----------------------------------------------------------------- fsck


def fsck_index(spark: SparkSession, path: str) -> list[dict]:
    """Offline integrity check of a persisted index — the production
    fsck a 100-TB deployment runs after a merge/compaction/restore
    before putting an index back in the serving path. Verifies every
    cross-table invariant the engine RELIES on but never re-checks at
    query time:

      meta                 _meta readable, modulus recorded
      docids_unique        docid and docno each appear once
      docids_dense         docids are exactly 0..N-1 (ordinal contract
                           of assign_docids; dl/postings join on it)
      doc_lengths_cover    doc_lengths and docids hold the SAME docid set
      postings_docids      every posting's docid exists in docids
      postings_dl          the dl riding in each posting row equals
                           doc_lengths.len (the WAND kernel trusts it)
      dictionary           df/cf equal a full recompute from postings
      stats                n_docs/avgdl/total_terms/vocab_size equal
                           their definitions
      bucket_layout        every postings row sits in the bucket its
                           term hashes to under _meta's modulus (wrong
                           placement = silently invisible to pruned
                           scans)
      tf_positive          no zero/negative term frequencies

    Returns [{check, ok, detail}] — report, don't raise: an operator
    wants the full damage list, not the first failure. Each check is
    one aggregate or anti-join over the audited tables (a handful of
    full scans total — an offline maintenance cost, never a query-path
    one). Live (LSM) indexes pass too: appends keep docids dense and
    masking is a read-time overlay, so the physical tables audited here
    must satisfy the same invariants between compactions.
    """
    out: list[dict] = []

    def report(check: str, ok: bool, detail: str = "") -> None:
        out.append({"check": check, "ok": bool(ok), "detail": detail})

    def guarded(checks, fn) -> None:
        # corruption includes SCHEMA corruption: a check that cannot even
        # run (missing table/column, type clash) is a failed check with
        # the error as its detail, never an fsck crash. ``checks`` names
        # EVERY check the closure would report, so a crashed closure
        # still yields one (failed) row per check — the report's shape
        # never depends on which failure mode occurred.
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — report everything
            names = [checks] if isinstance(checks, str) else list(checks)
            for c in names:
                report(c, False, f"error: {type(e).__name__}: {e}"[:300])

    meta = read_meta(spark, path)
    report("meta", meta["n_buckets"] > 0,
           f"n_buckets={meta['n_buckets']} block_span={meta['block_span']}")

    def _docids_profile():
        docids = spark.read.parquet(f"{path}/docids")
        r = docids.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("docid").alias("nd"),
            F.countDistinct("docno").alias("nn"),
            F.min("docid").alias("lo"),
            F.max("docid").alias("hi"),
        ).first()
        report("docids_unique", r.n == r.nd == r.nn,
               f"rows={r.n} distinct_docid={r.nd} distinct_docno={r.nn}")
        report("docids_dense", r.n == 0 or (r.lo == 0 and r.hi == r.n - 1),
               f"min={r.lo} max={r.hi} n={r.n}")

    guarded(("docids_unique", "docids_dense"), _docids_profile)

    def _cover():
        docids = spark.read.parquet(f"{path}/docids")
        dl = spark.read.parquet(f"{path}/doc_lengths")
        only_dl = dl.join(docids, "docid", "left_anti").count()
        only_ids = docids.join(dl, "docid", "left_anti").count()
        report("doc_lengths_cover", only_dl == 0 and only_ids == 0,
               f"doc_lengths_orphans={only_dl} "
               f"docids_without_length={only_ids}")

    guarded("doc_lengths_cover", _cover)

    def _orphans():
        docids = spark.read.parquet(f"{path}/docids")
        postings = spark.read.parquet(f"{path}/postings")
        n = (
            postings.select("docid").distinct()
            .join(docids, "docid", "left_anti").count()
        )
        report("postings_docids", n == 0, f"orphan_docids={n}")

    guarded("postings_docids", _orphans)

    def _dl_payload():
        postings = spark.read.parquet(f"{path}/postings")
        dl = spark.read.parquet(f"{path}/doc_lengths")
        n = postings.join(dl, "docid").filter(
            F.col("dl") != F.col("len")
        ).count()
        report("postings_dl", n == 0, f"dl_mismatch_rows={n}")

    guarded("postings_dl", _dl_payload)

    def _dictionary():
        postings = spark.read.parquet(f"{path}/postings")
        dictionary = spark.read.parquet(f"{path}/dictionary")
        recomputed = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df2"),
            F.sum("tf").cast("long").alias("cf2"),
        )
        n = (
            dictionary.join(recomputed, "term", "full_outer")
            .filter(
                F.col("df").isNull() | F.col("df2").isNull()
                | (F.col("df") != F.col("df2"))
                | (F.col("cf") != F.col("cf2"))
            ).count()
        )
        report("dictionary", n == 0, f"term_mismatches={n}")

    guarded("dictionary", _dictionary)

    def _stats():
        dl = spark.read.parquet(f"{path}/doc_lengths")
        stats = spark.read.parquet(f"{path}/stats").first()
        n_docs = spark.read.parquet(f"{path}/docids").count()
        tt = dl.agg(F.sum("len").cast("long").alias("tt")).first().tt or 0
        vocab = spark.read.parquet(f"{path}/dictionary").count()
        ok = (
            stats.n_docs == n_docs
            and stats.total_terms == tt
            and stats.vocab_size == vocab
            and (n_docs == 0 or abs(stats.avgdl - tt / n_docs) < 1e-9)
        )
        report("stats", ok,
               f"stats=({stats.n_docs},{stats.avgdl},{stats.total_terms},"
               f"{stats.vocab_size}) recomputed=({n_docs},"
               f"{tt / n_docs if n_docs else 0},{tt},{vocab})")

    guarded("stats", _stats)

    def _buckets():
        if meta["n_buckets"] <= 0:
            return  # unbucketed store: nothing to audit ("meta" flags it)
        postings = spark.read.parquet(f"{path}/postings")
        if "bucket" not in postings.columns:
            # the exact corruption pruned scans go blind on: a bucketed
            # meta over unbucketed postings MUST fail, not skip
            report("bucket_layout", False,
                   "postings table has no bucket column but _meta says "
                   f"n_buckets={meta['n_buckets']}")
            return
        n = postings.filter(
            F.col("bucket")
            != term_bucket_col(F.col("term"), meta["n_buckets"])
        ).count()
        report("bucket_layout", n == 0, f"misplaced_rows={n}")

    guarded("bucket_layout", _buckets)

    def _tf():
        postings = spark.read.parquet(f"{path}/postings")
        n = postings.filter(F.col("tf") < 1).count()
        report("tf_positive", n == 0, f"nonpositive_tf_rows={n}")

    guarded("tf_positive", _tf)

    def _block_stats():
        # optional table (plans/build_job.py block_stats stage): when
        # present, the driver-local WAND gate trusts its per-term block
        # counts and quantile tops (stale => quietly wrong PLANS), and —
        # higher stakes — MaxScore's term-bound phase trusts imp_max as
        # a SAFETY bound (operators/maxscore.py:term_upper_bounds_local):
        # a stale imp_max that under-bounds an epoch appended after the
        # stats were built could prune a genuine top-k document. fsck is
        # the gate that catches both before an index re-enters the
        # serving path.
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/block_stats")
        if not p.getFileSystem(conf).exists(p):
            return  # stage never run: gate falls back to the exact probe
        st = spark.read.parquet(f"{path}/block_stats")
        blk = spark.read.parquet(f"{path}/blocks").groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("nb2"),
            F.max("max_impact").alias("mx2"),
        )
        # terms absent from stats are fine (a deployment's min_blocks
        # floor; the gate models them from df) — what must never happen
        # is a stats row contradicting the blocks it summarizes
        staleness = (
            F.col("nb2").isNull() | (F.col("n_blocks") != F.col("nb2"))
        )
        if "imp_max" in st.columns:
            # only the exact-max column is contractually comparable: a
            # quantile sketch's p=1.0 point is NOT the exact maximum
            # (the same contract build_block_stats states), so a table
            # without imp_max is checked on block counts alone
            staleness = staleness | (
                F.abs(F.col("imp_max") - F.col("mx2")) > 1e-9
            )
        n = st.join(blk, "term", "left").filter(staleness).count()
        report("block_stats", n == 0, f"stale_terms={n}")

    guarded("block_stats", _block_stats)
    return out

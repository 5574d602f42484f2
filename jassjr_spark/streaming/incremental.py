"""Incremental (streaming) index maintenance.

The reference is strictly batch (SURVEY.md §2.4: no streaming anywhere), so
this is an additive capability: keep the persisted index current as new
documents arrive, without rebuilding.

Design — LSM-style segment append under the same on-disk contract as the
batch store (sources/index_store.py):

* a Structured Streaming query over the incoming documents feeds
  ``foreachBatch``; each micro-batch (epoch) runs the SAME Arrow
  tokenize+combine kernel as the batch build and APPENDS bucket-partitioned
  postings / doc_lengths / docids segment files. Parquet append per
  partition directory is the segment write; epochs are serialized by the
  streaming engine, so docid assignment (a per-epoch row_number offset by
  the persisted high-water mark) is race-free.
* ``docid`` high-water mark lives in ``{path}/_watermark`` and is advanced
  atomically per epoch AFTER the segment lands — an epoch that crashes
  mid-write is re-run by the engine with the same input (foreachBatch
  replay) and simply overwrites its segment (epoch-id-named files), giving
  effectively-once semantics.
* ``dictionary`` and ``stats`` are derived tables; appends invalidate
  them. ``refresh_derived`` recomputes both from the postings union (the
  compaction step). Searches between refreshes can either call it or
  accept the staleness — rank math only needs N/avgdl/df, so staleness is
  a recall question for NEW docs, never wrong scores for old ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.functions.tokenize import doc_term_frequencies
from jassjr_spark.operators.index_build import assign_docids
from jassjr_spark.sources.index_store import (
    DEFAULT_BUCKETS,
    read_meta,
    term_bucket_col,
    tombstones_df,
    write_meta,
)


def _read_watermark(spark: SparkSession, path: str) -> tuple[int, int | None]:
    """-> (next_docid high-water mark, max applied epoch id or None).

    Tolerates pre-epoch watermark files (no epoch_id column) WITHOUT
    resetting the high-water mark — a blanket except here would assign
    duplicate docids to the next append."""
    try:
        wm = spark.read.parquet(f"{path}/_watermark")
    except Exception:
        return 0, None  # no watermark yet: a fresh index
    aggs = [F.max("next_docid")]
    if "epoch_id" in wm.columns:
        aggs.append(F.max("epoch_id"))
    row = wm.agg(*aggs).first()
    return row[0] or 0, (row[1] if len(row) > 1 else None)


def _write_watermark(
    spark: SparkSession, path: str, next_docid: int, epoch_id: int | None
) -> None:
    spark.createDataFrame(
        [(next_docid, epoch_id)], "next_docid long, epoch_id long"
    ).coalesce(1).write.mode("append").parquet(f"{path}/_watermark")


def append_documents(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    prepend_docno: bool = True,
    n_buckets: int | None = None,
    epoch_id: int | None = None,
    maintain_positions: bool | None = None,
) -> int:
    """Append one batch of (docno, content) documents to the index at
    ``path``; returns the number of docs appended. This is the foreachBatch
    body — also usable directly for batch increments (epoch_id=None).

    Effectively-once: with an ``epoch_id``, segment data lands in
    epoch-named directories written with mode("overwrite") — a foreachBatch
    replay of a crashed epoch re-derives the SAME docid base (the watermark,
    written last, never advanced) and overwrites its own partial segment.
    A replay of a *completed* epoch is skipped via the applied-epoch mark in
    ``_watermark``. Do not mix epoch-ful and epoch-less appends in one
    index: partition discovery needs a consistent directory depth.

    ``maintain_positions``: also write the batch's positional side-table
    segment ({path}/positions, operators/positional.py layout, term-
    bucketed like postings) so phrase/span/proximity queries run against
    the LIVE index (live_positions). Default None = maintain iff the
    table already exists. A positional table with epoch holes silently
    loses phrase matches, so: enabling it on an index that already has
    appends raises (rebuild, or enable from the first append), and
    explicitly passing False while the table exists raises too.
    """
    if n_buckets is None:
        n_buckets = read_meta(spark, path)["n_buckets"] or DEFAULT_BUCKETS
    base, last_epoch = _read_watermark(spark, path)
    has_pos = _exists(spark, f"{path}/positions")
    if maintain_positions is None:
        maintain_positions = has_pos
    elif maintain_positions and not has_pos and base > 0:
        raise ValueError(
            "positions can only be maintained from the FIRST append: this "
            "index already has documents without a positional table "
            "(a table with epoch holes would silently lose phrase matches)"
        )
    elif not maintain_positions and has_pos:
        raise ValueError(
            "this index maintains a positional table; appending without "
            "it would leave an epoch hole (pass maintain_positions=None "
            "or True)"
        )
    if epoch_id is not None and last_epoch is not None and epoch_id <= last_epoch:
        return 0  # replay of an already-applied epoch
    seg = f"/epoch={epoch_id}" if epoch_id is not None else ""
    mode = "overwrite" if epoch_id is not None else "append"
    staged: list = []
    batch = assign_docids(batch, ["docno"], base=base, cleanup=staged).cache()
    n = batch.count()
    if n == 0:
        for df in staged:
            df.unpersist()
        batch.unpersist()
        return 0

    postings = doc_term_frequencies(batch, prepend_docno=prepend_docno)
    (
        postings.withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "docid")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{path}/postings{seg}")
    )
    (
        batch.select("docid")
        .join(postings.groupBy("docid").agg(F.min("dl").alias("len")),
              "docid", "left")
        .select("docid", F.coalesce("len", F.lit(0)).alias("len"))
        .write.mode(mode).parquet(f"{path}/doc_lengths{seg}")
    )
    batch.select("docid", "docno").write.mode(mode).parquet(f"{path}/docids{seg}")
    if maintain_positions:
        from jassjr_spark.operators.positional import build_positions

        (
            build_positions(batch.select("docid", "content"))
            .withColumn("bucket", term_bucket_col(F.col("term"), n_buckets))
            .repartition(n_buckets, "bucket")
            .sortWithinPartitions("term", "docid")
            .write.mode(mode)
            .partitionBy("bucket")
            .parquet(f"{path}/positions{seg}")
        )
    # watermark last: its presence certifies every segment above landed
    _write_watermark(spark, path, base + n, epoch_id)
    # release the per-batch caches: a long-running stream must not pin
    # one batch-sized cache entry per epoch
    for df in staged:
        df.unpersist()
    batch.unpersist()
    _refresh_reader_caches(spark, path)
    return n


def delete_documents(spark: SparkSession, path: str,
                     docnos: "list[str] | DataFrame") -> int:
    """Tombstone-delete documents by docno — the LSM delete the append/
    compact lifecycle was missing (a training-data pipeline must be able
    to pull contaminated docs without a rebuild). Returns len(docnos).

    A tombstone is (docno, tomb_epoch) appended to ``{path}/_tombstones``;
    tomb_epoch is the index's last APPLIED epoch at delete time, so the
    tombstone masks every occurrence of the docno in segments with
    epoch <= tomb_epoch and nothing after — a later re-append of the same
    docno (new docid, newer epoch) is visible again, the standard
    versioned-delete ordering. On an epoch-less batch store the mask is
    by docno alone (sources/index_store.masked_docid_set).

    Deletion is MASKING, immediately visible to every read_index reader:
    deleted docs vanish from results while surviving docs' scores are
    byte-unchanged (BM25 is per-doc; only the global df/N/avgdl still
    count the deleted docs, the documented staleness every segmented
    engine accepts between delete and merge). The physical purge — and
    the dictionary/stats correction — happens in compact_segments.
    Persisted WAND ``blocks`` tables do not see masks; load_persisted
    refuses a store with pending tombstones + blocks (rebuild blocks
    after compacting).

    Tombstone-table size is bounded by deletes since the last compaction
    that covered them (compact_segments GCs fully-applied tombstones).
    Concurrency: like compaction, call between triggers — the
    foreachBatch slot — never during an in-flight append.

    ``docnos`` is a list of docno strings, or a DataFrame with a
    ``docno`` column for large delete sets (written distributed — no
    driver-side collect)."""
    _, last_epoch = _read_watermark(spark, path)
    tomb_epoch = -1 if last_epoch is None else int(last_epoch)
    if isinstance(docnos, DataFrame):
        tomb = docnos.select("docno").distinct().select(
            "docno", F.lit(tomb_epoch).cast("long").alias("tomb_epoch")
        )
        n = tomb.count()
        tomb.write.mode("append").parquet(f"{path}/_tombstones")
        try:
            spark.catalog.refreshByPath(f"{path}/_tombstones")
        except Exception:
            pass
        _refresh_reader_caches(spark, path)
        return n
    spark.createDataFrame(
        [(d, tomb_epoch) for d in docnos], "docno string, tomb_epoch long"
    ).coalesce(1).write.mode("append").parquet(f"{path}/_tombstones")
    try:
        spark.catalog.refreshByPath(f"{path}/_tombstones")
    except Exception:
        pass
    _refresh_reader_caches(spark, path)
    return len(docnos)


def upsert_documents(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    epoch_id: int,
    prepend_docno: bool = True,
    n_buckets: int | None = None,
) -> int:
    """Delete-then-append upsert: re-ingesting a batch of (docno, content)
    replaces any existing version of each docno — the old version is
    tombstone-masked immediately and physically purged at the next
    compaction, the new one lands in this epoch. Completes the index's
    CRUD lifecycle (append / delete / upsert / compact) for pipelines
    that re-crawl or re-clean documents in place.

    Requires the epoch-named layout (``epoch_id`` mandatory): the
    tombstone's horizon is the PRE-append watermark, so it masks old
    epochs and never this batch's — on an epoch-less store it would mask
    the new version too. Effectively-once like append_documents: a replay
    of an applied epoch is skipped before writing anything; a replay of a
    crashed one re-writes duplicate tombstones (harmless — the mask
    distincts) and overwrites its own segment. Caller owns intra-batch
    docno uniqueness (as with append)."""
    _, last_epoch = _read_watermark(spark, path)
    if last_epoch is not None and epoch_id <= last_epoch:
        return 0  # replay of an already-applied epoch
    delete_documents(spark, path, batch.select("docno"))
    return append_documents(
        spark, batch, path, prepend_docno=prepend_docno,
        n_buckets=n_buckets, epoch_id=epoch_id,
    )


def live_positions(
    spark: SparkSession, path: str, terms: list[str] | None = None
) -> DataFrame:
    """The positional table of a LIVE incremental index (term, docid,
    positions, tf), tombstone-masked — feed it to phrase_search /
    span_near_occurrences / proximity_occurrences for phrase queries
    over the streaming index. With ``terms`` the scan is pruned to the
    query terms' bucket directories + a pushed term predicate
    (index_store.pruned_positions); masking is the same docid anti-join
    every other segment-table read applies, so a deleted document can
    never resurrect through a phrase match."""
    from jassjr_spark.sources.index_store import (
        masked_docid_set, pruned_positions, read_positions,
    )

    p = (
        pruned_positions(spark, path, terms)
        if terms is not None
        else read_positions(spark, path)
    )
    mask = masked_docid_set(spark, path)
    if mask is not None:
        p = p.join(mask, "docid", "left_anti")
    return p


def _refresh_reader_caches(spark: SparkSession, path: str) -> None:
    """Invalidate session caches over the segment tables after an
    external file change (append/compaction): Spark's CacheManager
    substitutes any matching cached plan into later queries, so a reader
    that cached read_index() earlier in the session would silently keep
    serving the pre-mutation snapshot (stale stats => wrong scores)."""
    for t in _SEGMENT_TABLES + ("positions", "dictionary", "stats", "blocks"):
        try:
            spark.catalog.refreshByPath(f"{path}/{t}")
        except Exception:
            pass  # table may not exist yet (fresh index)


def refresh_derived(spark: SparkSession, path: str,
                    incremental: bool = True) -> None:
    """Recompute dictionary + stats (the compaction step after appends).

    Incremental mode (epoch-named segment layout only): the dictionary
    delta aggregates ONLY epochs newer than the last refresh (marker in
    ``_refreshed``) and full-outer-merges into the existing dictionary —
    at 10^12 postings a full re-aggregation per compaction is a full-index
    scan; the delta is proportional to what arrived. Falls back to the
    full recompute when there is no epoch column or no prior dictionary.
    Stats stay a full pass over doc_lengths (one small int per doc).
    A no-op on an index with no appended segments yet.

    Crash safety: only epochs at or below the APPLIED watermark are
    aggregated and the refresh marker never advances past it — a
    partially-written epoch (crash mid-append; the watermark is written
    last) will be overwritten by the foreachBatch replay, so counting it
    now and marking it refreshed would skip the recount forever
    (permanent df/cf undercount). Residual window: a crash between the
    dictionary overwrite and the marker write double-counts the delta on
    the next incremental refresh — recover with
    ``refresh_derived(path, incremental=False)`` (the full recompute is
    idempotent and re-seats the marker); ``index_job --fsck`` detects
    the drift either way."""
    if not _exists(spark, f"{path}/postings"):
        return
    postings = spark.read.parquet(f"{path}/postings")
    dl = spark.read.parquet(f"{path}/doc_lengths")

    _, applied = _read_watermark(spark, path)
    if "epoch" in postings.columns and applied is not None:
        postings = postings.filter(F.col("epoch") <= applied)
        if "epoch" in dl.columns:
            dl = dl.filter(F.col("epoch") <= applied)

    last = _read_refresh_marker(spark, path)
    can_increment = (
        incremental and "epoch" in postings.columns
        and _exists(spark, f"{path}/dictionary") and last is not None
    )
    if can_increment:
        delta = (
            postings.filter(F.col("epoch") > last)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("d_df"),
                 F.sum("tf").cast("long").alias("d_cf"))
        )
        old = spark.read.parquet(f"{path}/dictionary")
        dictionary = (
            old.join(delta, "term", "full_outer")
            .select(
                "term",
                (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0)))
                .alias("df"),
                (F.coalesce("cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0)))
                .cast("long").alias("cf"),
            )
        )
        # the old dictionary is an input of the overwrite target: stage
        # through a swap directory so the read completes before the delete
        dictionary.write.mode("overwrite").parquet(f"{path}/dictionary_next")
        spark.read.parquet(f"{path}/dictionary_next").write.mode(
            "overwrite"
        ).parquet(f"{path}/dictionary")
        _rm_dir(spark, f"{path}/dictionary_next")  # staging, not layout
    else:
        dictionary = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cf")
        )
        # overwrite via temp-and-swap semantics: parquet overwrite is
        # atomic enough here because readers re-list files per query
        dictionary.write.mode("overwrite").parquet(f"{path}/dictionary")
    if "epoch" in postings.columns:
        # postings is already capped at the applied watermark above, so
        # the marker can never advance past an epoch whose replay is
        # still owed
        hi = postings.agg(F.max("epoch")).first()[0]
        if hi is not None:
            _write_refresh_marker(spark, path, int(hi))

    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.sum("len").cast("long").alias("total_terms"),
    ).crossJoin(
        spark.read.parquet(f"{path}/dictionary").agg(
            F.count(F.lit(1)).alias("vocab_size")
        )
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")
    _refresh_reader_caches(spark, path)


def refresh_blocks(
    spark: SparkSession, path: str, block_span: int | None = None,
) -> int:
    """Bring the compressed WAND ``blocks`` table up to date with the
    epoch-segmented postings: build blocks for every postings epoch that
    has none (one pass over the NEW postings only — never the index), and
    drop orphaned blocks epochs a compaction superseded. Returns how many
    epoch block segments were built.

    This makes block-max WAND serve the LIVE streaming index: blocks are
    per-epoch directories (``blocks/epoch=N/bucket=M``), so the maintained
    cost tracks the append rate. Docid-range block ids stay globally
    aligned across epochs (docids are globally increasing), and a block id
    that spans an epoch boundary simply yields one partial row per epoch —
    every WAND phase operates per row with per-row bounds, so partial
    rows only loosen pruning, never correctness. Rank safety under avgdl
    drift comes from the (max_tf, min_dl) metadata build_blocks records:
    wand recomputes the bound under the CURRENT avgdl at query time, so a
    block written when the corpus was younger can never under-bound a
    posting (operators/wand.py:_block_upper_bounds).

    Call after refresh_derived (needs current stats; raises without them),
    in the same between-triggers maintenance slot as compaction. Pending
    delete tombstones still gate the WAND load (blocks bake docids);
    compact first, then refresh_blocks rebuilds the merged run's blocks.
    """
    from jassjr_spark.functions.compression import (
        DEFAULT_BLOCK_SPAN,
        build_blocks,
    )

    meta = read_meta(spark, path)
    n_buckets = meta["n_buckets"] or DEFAULT_BUCKETS
    if block_span is None:
        block_span = meta["block_span"] or DEFAULT_BLOCK_SPAN
    if not _exists(spark, f"{path}/stats"):
        raise ValueError(
            f"index at {path!r} has no stats table; run refresh_derived "
            "before refresh_blocks (block impacts need avgdl)"
        )
    avgdl = float(spark.read.parquet(f"{path}/stats").first().avgdl)
    post_epochs = set(_epoch_dirs(spark, f"{path}/postings"))
    _, applied = _read_watermark(spark, path)
    if applied is not None:
        # same crash-safety cap as refresh_derived: an epoch past the
        # applied watermark is a partial segment awaiting replay —
        # baking blocks from it now would leave them stale (and never
        # rebuilt) after the replay overwrites the postings
        post_epochs = {e for e in post_epochs if e <= applied}
    blk_epochs = set(_epoch_dirs(spark, f"{path}/blocks"))
    for e in sorted(blk_epochs - post_epochs):  # superseded by compaction
        _rm_dir(spark, f"{path}/blocks/epoch={e}")
    built = 0
    for e in sorted(post_epochs - blk_epochs):
        seg = spark.read.parquet(f"{path}/postings/epoch={e}")
        blocks = build_blocks(
            seg.select("term", "docid", "tf", "dl"), avgdl, block_span
        )
        (
            blocks.withColumn(
                "bucket", term_bucket_col(F.col("term"), n_buckets)
            )
            .repartition(n_buckets, "bucket")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/blocks/epoch={e}")
        )
        built += 1
    if built or (blk_epochs - post_epochs):
        write_meta(spark, path, n_buckets, block_span=block_span)
        try:
            spark.catalog.refreshByPath(f"{path}/blocks")
        except Exception:
            pass
    return built


def _exists(spark: SparkSession, p: str) -> bool:
    try:
        spark.read.parquet(p).schema
        return True
    except Exception:
        return False


def _read_refresh_marker(spark: SparkSession, path: str) -> int | None:
    try:
        return spark.read.parquet(f"{path}/_refreshed").agg(
            F.max("epoch_id")
        ).first()[0]
    except Exception:
        return None


def _write_refresh_marker(spark: SparkSession, path: str, epoch_id: int) -> None:
    spark.createDataFrame([(epoch_id,)], "epoch_id long").coalesce(1).write.mode(
        "append"
    ).parquet(f"{path}/_refreshed")


def snapshot_floor(spark: SparkSession, path: str) -> int | None:
    """The oldest epoch whose as-of snapshot is still reconstructable
    (``{path}/_snapshot_floor``, advanced by compact_segments), or None
    when the store has never compacted — every epoch readable. Stores
    compacted by builds predating this marker have no floor recorded;
    their pre-compaction snapshots would read silently incomplete, so
    time-travel there is only sound from the store's current max epoch."""
    try:
        return spark.read.parquet(f"{path}/_snapshot_floor").agg(
            F.max("epoch_id")
        ).first()[0]
    except Exception:
        return None


def _write_floor_marker(spark: SparkSession, path: str, epoch_id: int) -> None:
    spark.createDataFrame([(epoch_id,)], "epoch_id long").coalesce(1).write.mode(
        "append"
    ).parquet(f"{path}/_snapshot_floor")


def start_indexing_stream(
    spark: SparkSession,
    stream: DataFrame,
    path: str,
    checkpoint: str,
    prepend_docno: bool = True,
    n_buckets: int | None = None,
    trigger_available_now: bool = True,
    compact_every: int = 0,
    size_ratio: float = 4.0,
    max_segments: int = 8,
    maintain_blocks: bool = False,
    block_span: int | None = None,
    maintain_positions: bool = False,
):
    """Attach the incremental indexer to a streaming documents source
    (columns docno, content). Returns the StreamingQuery.

    ``compact_every=N`` (0 = off) runs refresh_derived + compact_segments
    inside the foreachBatch handler every N applied epochs — the
    production maintenance hook: epochs are serialized by the streaming
    engine, so maintenance between appends is the documented
    concurrency-safe slot, and file counts stay bounded over the
    stream's lifetime instead of growing one directory set per epoch.
    ``size_ratio``/``max_segments`` tune the tiered policy
    (pick_compaction_run): per-compaction I/O is bounded by the merged
    run's size, live segments by ``max_segments``.

    ``maintain_blocks=True`` keeps the compressed WAND blocks current:
    after every applied epoch (and after each compaction, which drops
    the merged run's block segments) refresh_blocks builds the missing
    per-epoch block segments — one pass over that epoch's postings, so
    maintenance cost tracks the append rate. Implies a refresh_derived
    per epoch (block impacts need current stats), which is delta-sized.

    ``maintain_positions=True`` additionally writes each epoch's
    positional side-table segment so phrase/span queries run against
    the live index (live_positions); compaction merges and purges it
    with the other segment tables. Must be set from the stream's FIRST
    epoch (append_documents refuses epoch holes).

    ``n_buckets``: only consulted when the store has no ``_meta`` yet
    (a NEW index; default DEFAULT_BUCKETS). Attaching/restarting over
    an EXISTING store adopts its layout — _meta is the on-disk contract
    (a reader hashing terms with a different modulus prunes the wrong
    bucket dirs and silently drops postings; rewriting it would also
    zero block_span, hiding persisted WAND blocks) — and an explicit
    mismatching n_buckets raises instead of mixing moduli.
    """
    meta_buckets = read_meta(spark, path)["n_buckets"]
    if meta_buckets:
        if n_buckets is not None and n_buckets != meta_buckets:
            raise ValueError(
                f"index at {path!r} is bucketed mod {meta_buckets}; "
                f"restarting the stream with n_buckets={n_buckets} would "
                "mix moduli across segments — omit n_buckets (the store's "
                "layout is adopted) or rebuild"
            )
        n_buckets = meta_buckets
    else:
        n_buckets = n_buckets or DEFAULT_BUCKETS
        write_meta(spark, path, n_buckets)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        n = append_documents(
            spark, batch.select("docno", "content"), path,
            prepend_docno=prepend_docno, n_buckets=n_buckets,
            epoch_id=epoch_id,
            maintain_positions=maintain_positions or None,
        )
        compacted = False
        if compact_every and n and epoch_id % compact_every == 0:
            refresh_derived(spark, path)
            compact_segments(spark, path, n_buckets=n_buckets,
                             size_ratio=size_ratio,
                             max_segments=max_segments)
            compacted = True
        if maintain_blocks and n:
            if not compacted:
                refresh_derived(spark, path)
            refresh_blocks(spark, path, block_span=block_span)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------------------- compaction

_SEGMENT_TABLES = ("postings", "doc_lengths", "docids")


def _fs(spark: SparkSession, p: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _epoch_dirs(spark: SparkSession, table_path: str) -> list[int]:
    fs, jvm = _fs(spark, table_path)
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("epoch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _compact_marker_table(spark: SparkSession, tpath: str) -> None:
    """Collapse an append-per-epoch single-row marker table (one small
    file per epoch) to one file holding its aggregate. Append-then-delete
    ordering: the new file carries the max values, so a crash at any
    point leaves a readable table whose aggregate is unchanged."""
    fs, jvm = _fs(spark, tpath)
    root = jvm.org.apache.hadoop.fs.Path(tpath)
    if not fs.exists(root):
        return
    old_files = [
        st.getPath() for st in fs.listStatus(root)
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]
    if len(old_files) <= 1:
        return
    df = spark.read.parquet(tpath)
    agg = df.agg(*[F.max(c).alias(c) for c in df.columns])
    agg.coalesce(1).write.mode("append").parquet(tpath)
    for f in old_files:
        fs.delete(f, False)


def _segment_sizes(spark: SparkSession, table_path: str) -> dict[int, int]:
    """epoch id -> total bytes of its segment directory."""
    fs, jvm = _fs(spark, table_path)
    P = jvm.org.apache.hadoop.fs.Path
    out = {}
    for e in _epoch_dirs(spark, table_path):
        out[e] = fs.getContentSummary(P(f"{table_path}/epoch={e}")).getLength()
    return out


def pick_compaction_run(
    epochs: list[int], sizes: dict[int, int],
    size_ratio: float, max_segments: int,
) -> list[int]:
    """The size-tiered merge policy: choose the contiguous run of NEWEST
    segments to merge, never dragging a large old segment into a merge of
    small young ones.

    Walk newest -> oldest, accumulating a tail; admit the next-older
    segment only while its size is <= size_ratio x the accumulated tail
    (merging it would then cost at most (1 + size_ratio)/size_ratio times
    the tail's own bytes). A big compacted segment is therefore rewritten
    only once the younger data has grown to within a factor of it — each
    byte is rewritten O(log_ratio(total/epoch)) times over the index's
    lifetime instead of once per compaction (the r3 full-rewrite policy's
    quadratic total I/O, VERDICT r3 What's-wrong #1).

    ``max_segments`` bounds the live segment count by a constant: when the
    ratio walk alone would leave more than that many segments, the run is
    extended (oldest segments get pulled in) until the post-merge count
    fits — the occasional forced big merge that keeps file listings and
    per-query segment fan-in bounded.
    """
    if len(epochs) < 2:
        return []
    newest_first = sorted(epochs, reverse=True)
    run = [newest_first[0]]
    tail_bytes = sizes.get(newest_first[0], 0)
    for e in newest_first[1:]:
        if sizes.get(e, 0) <= size_ratio * max(tail_bytes, 1):
            run.append(e)
            tail_bytes += sizes.get(e, 0)
        else:
            break
    # bound the post-merge segment count: len(epochs) - len(run) + 1
    need = len(epochs) - max_segments + 1
    if need > len(run):
        run = newest_first[:need]
    return [] if len(run) < 2 else sorted(run)


def compact_segments(
    spark: SparkSession, path: str, n_buckets: int | None = None,
    size_ratio: float = 4.0, max_segments: int = 8, full: bool = False,
) -> int:
    """Merge a size-tiered run of epoch segment directories into one;
    returns how many epoch dirs were merged (0 = nothing to do).

    The LSM append layout (append_documents) accumulates one directory
    set PER EPOCH forever — at one epoch per minute that is ~500k
    directories a year of small files, a failure mode the reference's
    single contiguous postings file (JASSjr_index.cpp:201-218) does not
    have. Compaction recovers that property over time, amortized: the
    ``pick_compaction_run`` size-tiered policy merges only the newest
    run of similar-scale segments (``full=True`` forces the everything-
    up-to-cutoff merge), so bytes rewritten per call are bounded by the
    merged segments' size — never the index size — while the live
    segment count stays <= ``max_segments``. The merged run [lo..hi] is
    rewritten as ONE segment directory (``epoch=<hi>``, bucket layout
    preserved, files re-sorted by (term, docid)), and the
    ``_watermark``/``_refreshed`` marker tables collapse to one file
    each.

    Only epochs <= min(last applied epoch, last *refreshed* epoch) are
    eligible: never past the watermark (a crashed in-flight epoch dir
    must stay separate so its replay can overwrite it), and never past
    the dictionary refresh marker (refresh_derived's incremental delta
    filters on ``epoch > marker``; merging unrefreshed epochs below
    refreshed ones would double-count their postings in the next delta).
    Epochs beyond the cutoff are untouched. Call refresh_derived first
    to make everything compactable.

    Not concurrency-safe with an in-flight append: run it between
    triggers (foreachBatch epochs are serialized — e.g. call it inside
    the handler every N epochs, after append_documents returns).

    Crash safety: the merged segment is staged under a hidden
    ``_compact_tmp_<lo>_<hi>`` directory (Spark's file listing ignores
    underscore-prefixed paths), source epoch dirs in [lo, hi] are
    deleted only after the staged write completed (_SUCCESS), and the
    rename to ``epoch=<hi>`` is last. An interrupted compaction is
    finished (or a half-written stage discarded) by the next call via
    _recover.
    """
    if n_buckets is None:
        n_buckets = read_meta(spark, path)["n_buckets"] or DEFAULT_BUCKETS
    # the optional positional side-table compacts exactly like the core
    # segment tables: keyed by docid (purge anti-join applies) and
    # term-bucketed (postings-style rewrite)
    tables = _SEGMENT_TABLES + (
        ("positions",) if _exists(spark, f"{path}/positions") else ()
    )
    for t in tables:
        _recover_compaction(spark, f"{path}/{t}")
    # stale purge staging from a crashed previous compaction: discard.
    # NOT applying an orphaned delta is always safe — the dictionary/stats
    # merely keep overcounting the deleted docs (the documented staleness)
    # and the tombstones that produced it are still in place, so no reader
    # ever sees a deleted doc; the next purging compaction re-derives it.
    for tmp in (f"{path}/_purge_delta_tmp", f"{path}/_purge_docids_tmp"):
        _rm_dir(spark, tmp)

    _, last_epoch = _read_watermark(spark, path)
    marker = _read_refresh_marker(spark, path)
    if last_epoch is None or marker is None:
        return 0
    cutoff = min(last_epoch, marker)
    epochs = [e for e in _epoch_dirs(spark, f"{path}/postings") if e <= cutoff]
    if full:
        run = epochs if len(epochs) >= 2 else []
    else:
        sizes = _segment_sizes(spark, f"{path}/postings")
        run = pick_compaction_run(epochs, sizes, size_ratio, max_segments)
    if not run:
        return 0
    lo, hi = run[0], run[-1]

    # ---- delete purge: resolve which docids in the run are tombstoned,
    # and stage (a) that docid set and (b) its per-term postings counts
    # BEFORE the swaps delete the source files (Spark reads are lazy).
    tombs = tombstones_df(spark, path)
    purge = None
    if tombs is not None:
        in_run = (F.col("epoch") >= lo) & (F.col("epoch") <= hi)
        dmask = spark.read.parquet(f"{path}/docids").filter(in_run)
        cond = (dmask["docno"] == tombs["docno"]) & (
            dmask["epoch"] <= tombs["tomb_epoch"]
        )
        masked_run = dmask.join(tombs, cond, "left_semi").select(
            "docid"
        ).distinct()
        masked_run.write.mode("overwrite").parquet(
            f"{path}/_purge_docids_tmp"
        )
        purge = spark.read.parquet(f"{path}/_purge_docids_tmp")
        if purge.limit(1).count() == 0:
            purge = None
            _rm_dir(spark, f"{path}/_purge_docids_tmp")
        else:
            (
                spark.read.parquet(f"{path}/postings").filter(in_run)
                .join(purge, "docid", "left_semi")
                .groupBy("term")
                .agg(F.count(F.lit(1)).alias("d_df"),
                     F.sum("tf").cast("long").alias("d_cf"))
                .write.mode("overwrite")
                .parquet(f"{path}/_purge_delta_tmp")
            )

    # Snapshot floor (time-travel contract, index_store.read_index as_of=):
    # this merge folds epochs [lo, hi] into one dir, and a purging merge
    # additionally destroys rows that were still VISIBLE at epochs up to
    # the purged tombstones' horizon — so record the first epoch whose
    # snapshot remains reconstructable. Written BEFORE the first
    # destructive swap: a crash in between leaves the floor conservatively
    # high (a reconstructable snapshot may be refused; never the reverse).
    floor = hi
    if purge is not None:
        mt = tombs.agg(F.max("tomb_epoch")).first()[0]
        if mt is not None:
            floor = max(floor, int(mt))
    _write_floor_marker(spark, path, floor)

    for t in tables:
        tpath = f"{path}/{t}"
        tmp = f"{tpath}/_compact_tmp_{lo}_{hi}"
        merged = (
            spark.read.parquet(tpath)
            .filter((F.col("epoch") >= lo) & (F.col("epoch") <= hi))
            .drop("epoch")
        )
        if purge is not None:
            merged = merged.join(purge, "docid", "left_anti")
        if t in ("postings", "positions"):
            (
                merged.repartition(n_buckets, "bucket")
                .sortWithinPartitions("term", "docid")
                .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
            )
        else:
            merged.coalesce(max(1, n_buckets // 4)).write.mode(
                "overwrite"
            ).parquet(tmp)
        _swap_in_segment(spark, tpath, tmp, lo, hi)

    # blocks epochs covering the merged run are superseded (and, after a
    # purge, would resurrect deleted docs through the WAND path): drop
    # them — refresh_blocks rebuilds ONE segment from the merged postings
    for e in _epoch_dirs(spark, f"{path}/blocks"):
        if lo <= e <= hi:
            _rm_dir(spark, f"{path}/blocks/epoch={e}")

    if tombs is not None:
        _apply_purge_and_gc(spark, path, purged=purge is not None)
    _compact_marker_table(spark, f"{path}/_watermark")
    _compact_marker_table(spark, f"{path}/_refreshed")
    _compact_marker_table(spark, f"{path}/_snapshot_floor")
    _refresh_reader_caches(spark, path)
    return len(run)


def _apply_purge_and_gc(spark: SparkSession, path: str, purged: bool) -> None:
    """After a purging swap: subtract the purged postings' per-term counts
    from the dictionary (delta-sized, never an index scan), recompute the
    scalar stats from the live doc_lengths, and GC tombstones no live
    segment can match. Runs AFTER the segment swaps — a crash in between
    leaves the stats conservatively stale (purged docs still counted, the
    same staleness every reader already tolerates pre-compaction) and the
    tombstones in place, so results are never wrong; the staging is
    discarded on the next compaction."""
    if purged:
        if _exists(spark, f"{path}/dictionary"):
            delta = spark.read.parquet(f"{path}/_purge_delta_tmp")
            old = spark.read.parquet(f"{path}/dictionary")
            patched = (
                old.join(delta, "term", "left")
                .select(
                    "term",
                    (F.col("df") - F.coalesce("d_df", F.lit(0)))
                    .cast("long").alias("df"),
                    (F.col("cf") - F.coalesce("d_cf", F.lit(0)))
                    .cast("long").alias("cf"),
                )
                .filter(F.col("df") > 0)
            )
            # the old dictionary is an input of its own overwrite: stage
            patched.write.mode("overwrite").parquet(f"{path}/dictionary_next")
            spark.read.parquet(f"{path}/dictionary_next").write.mode(
                "overwrite"
            ).parquet(f"{path}/dictionary")
            _rm_dir(spark, f"{path}/dictionary_next")
        if _exists(spark, f"{path}/stats"):
            dl = spark.read.parquet(f"{path}/doc_lengths")
            stats = dl.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg("len").alias("avgdl"),
                F.sum("len").cast("long").alias("total_terms"),
            ).crossJoin(
                spark.read.parquet(f"{path}/dictionary").agg(
                    F.count(F.lit(1)).alias("vocab_size")
                )
            )
            stats.write.mode("overwrite").parquet(f"{path}/stats")
    # GC: a tombstone masks only segments with epoch <= tomb_epoch; once
    # every live epoch is newer it can never match again (the compaction
    # that removed those epochs purged whatever it matched).
    live = _epoch_dirs(spark, f"{path}/postings")
    tombs = tombstones_df(spark, path)
    if tombs is not None and live:
        lo_live = min(live)
        keep = tombs.filter(F.col("tomb_epoch") >= lo_live)
        if keep.limit(1).count() == 0:
            _rm_dir(spark, f"{path}/_tombstones")
        elif keep.count() < tombs.count():
            keep.write.mode("overwrite").parquet(f"{path}/_tombstones_next")
            spark.read.parquet(f"{path}/_tombstones_next").coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{path}/_tombstones")
            _rm_dir(spark, f"{path}/_tombstones_next")
    for tmp in (f"{path}/_purge_delta_tmp", f"{path}/_purge_docids_tmp"):
        _rm_dir(spark, tmp)


def _rm_dir(spark: SparkSession, p: str) -> None:
    fs, jvm = _fs(spark, p)
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _swap_in_segment(
    spark: SparkSession, table_path: str, tmp: str, lo: int | None, hi: int
) -> None:
    """Replace epoch dirs in [lo, hi] (lo=None: every epoch <= hi, the
    pre-tiering layout) with the staged merged segment as epoch=<hi>."""
    fs, jvm = _fs(spark, table_path)
    P = jvm.org.apache.hadoop.fs.Path
    for e in _epoch_dirs(spark, table_path):
        if e <= hi and (lo is None or e >= lo):
            fs.delete(P(f"{table_path}/epoch={e}"), True)
    fs.rename(P(tmp), P(f"{table_path}/epoch={hi}"))


def _recover_compaction(spark: SparkSession, table_path: str) -> None:
    """Finish (or discard) a compaction interrupted mid-swap: a leftover
    _compact_tmp_<lo>_<hi> with a _SUCCESS marker supersedes the epochs
    in [lo, hi] (it is a complete merged snapshot of them); without
    _SUCCESS the stage is a half-written discard. Legacy single-number
    stages (_compact_tmp_<N>, written before the tiered policy)
    supersede every epoch <= N."""
    fs, jvm = _fs(spark, table_path)
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("_compact_tmp_")):
            continue
        parts = name[len("_compact_tmp_"):].split("_")
        lo, hi = (None, int(parts[0])) if len(parts) == 1 else (
            int(parts[0]), int(parts[1])
        )
        ok = fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{table_path}/{name}/_SUCCESS")
        )
        if ok:
            _swap_in_segment(spark, table_path, f"{table_path}/{name}", lo, hi)
        else:
            fs.delete(st.getPath(), True)


def export_snapshot(
    spark: SparkSession, src: str, dst: str, as_of: int | None = None,
    n_buckets: int | None = None,
) -> None:
    """Materialize a (time-travel) snapshot of the LSM index at ``src``
    as a STANDALONE batch store at ``dst`` — the reproducible-pipeline
    primitive: pin the exact index a training run searched, free of the
    source's ongoing appends/deletes/compactions. ``as_of=None`` exports
    the current live view (tombstones applied, like any reader).

    The export is an ordinary ``write_index`` (term-bucketed sorted
    postings, _meta contract), so the result serves every batch surface
    — search, WAND block builds, shard merges — and carries no epochs,
    no tombstones, no markers. Dictionary/stats come from the snapshot's
    LIVE rows (read_index(as_of=) semantics), so the export never
    inherits the source's pre-compaction stats staleness.
    """
    from jassjr_spark.sources.index_store import read_index, write_index

    if n_buckets is None:
        n_buckets = read_meta(spark, src)["n_buckets"] or DEFAULT_BUCKETS
    snap = read_index(spark, src, as_of=as_of)
    if as_of is None:
        # live view keeps the persisted dictionary/stats (which still
        # count masked-but-unpurged docs); a standalone export should be
        # self-consistent instead — recompute from the live rows
        p = snap.postings
        dictionary = p.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        stats = snap.doc_lengths.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("len").alias("avgdl"),
            F.sum("len").cast("long").alias("total_terms"),
        ).crossJoin(
            dictionary.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
        )
        from jassjr_spark.operators.index_build import Index

        snap = Index(postings=p, dictionary=dictionary,
                     doc_lengths=snap.doc_lengths, docids=snap.docids,
                     stats=stats, n_buckets=0)
    # drop the LSM partition columns from EVERY segment table the live
    # view may still carry them on (not just postings): an export with
    # an epoch column on doc_lengths/docids breaks the "carries no
    # epochs" contract and fails merge_indexes' unionByName against
    # batch-built shards
    for tbl in ("postings", "doc_lengths", "docids"):
        df = getattr(snap, tbl)
        for col in ("epoch", "bucket"):
            if col in df.columns:
                df = df.drop(col)
        setattr(snap, tbl, df)
    write_index(snap, dst, n_buckets=n_buckets)

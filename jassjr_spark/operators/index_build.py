"""Index build — SURVEY.md §2 ops I1-I10 as one declarative Spark job.

The reference (`JASSjr_index.py`, `JASSjr_index.cpp:97-224`) is a
single-threaded forward scan producing four artifacts: a vocabulary
(term -> postings pointer), contiguous (docid, tf) postings, per-document
lengths, and the docno list. We produce the same *information* as four
DataFrames/tables, but the layout is chosen for a 1000-executor cluster:

* ``postings``   (term, docid, tf, dl)    — EXPLODED rows, bucket-hashed by
  term and sorted (term, docid) within files. Exploded (not
  array-per-term) is the load-bearing scale decision: a stopword-like term
  at 10^12 docs has ~10^12 postings, and a ``collect_list`` building one
  array row per term would OOM a single task (aggregation skew that AQE
  does NOT fix — AQE splits skewed *joins*, not skewed groups). Exploded
  rows make heavy terms just... more rows, evenly spread across term-hash
  buckets, while Parquet run-length/dict encoding of the repeated ``term``
  column gives back the compactness of the array layout. Per-term
  contiguity (the reference's 1-seek-1-read property,
  JASSjr_search.cpp:197-202) is recovered by the bucket-by-term +
  sortWithinPartitions layout: one term = one run inside one bucket, and
  min/max page stats prune everything else.
* ``doc_lengths`` (docid, len)            — I9; also denormalized as ``dl``
  onto postings so scoring needs no query-time join (the analogue of the
  reference's doc_lengths[docid] array probe, JASSjr_search.py:81).
* ``docids``      (docid, docno)          — I4.
* ``stats``       (n_docs, avgdl, total_terms, vocab_size) — S2 scalars,
  broadcast at query time.
* ``dictionary``  (term, df, cf)          — the vocab (I10), df = postings
  length the searcher divides by (JASSjr_search.py:68-75).

docid assignment (I3): dense 0-based ordinal in a caller-specified total
order — ``row_number() over (order by ...) - 1``. NOT
``monotonically_increasing_id`` (non-ordinal, partition-dependent); the
rank tie-break (SURVEY.md §1.4 item 6) makes ordinality observable. At
true 10^12 scale the global sort for row_number would itself be a job; the
standard cluster recipe (zipWithIndex-style per-partition offsets over an
already-sorted source) plugs in behind the same function without changing
any downstream semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jassjr_spark.functions.tokenize import doc_term_frequencies


@dataclass
class Index:
    """The in-memory handle to the four index artifacts (SURVEY.md §1.1)."""

    postings: DataFrame     # term, docid, tf, dl [, bucket]
    dictionary: DataFrame   # term, df, cf
    doc_lengths: DataFrame  # docid, len
    docids: DataFrame       # docid, docno
    stats: DataFrame        # n_docs, avgdl, total_terms, vocab_size
    # bucket-count of the persisted postings layout (on-disk contract;
    # pruned_postings must hash query terms with the SAME modulus)
    n_buckets: int = 0      # 0 = unbucketed/in-memory

    def cache(self) -> "Index":
        for df in (self.postings, self.dictionary, self.doc_lengths,
                   self.docids, self.stats):
            df.cache()
        return self

    def scalar_stats(self) -> dict:
        row = self.stats.first()
        return {k: row[k] for k in ("n_docs", "avgdl", "total_terms", "vocab_size")}


class _StagedCleanup:
    """Cleanup handle for a checkpointed staged frame (see assign_docids):
    frees the checkpoint's actual storage, which ``DataFrame.unpersist``
    does not touch. Call ``unpersist()`` only after every action over the
    assign_docids result has completed — the pinned partitions are what
    make repeated passes see one docid assignment."""

    def __init__(self, df: DataFrame):
        self.df = df

    def unpersist(self, blocking: bool = False) -> None:
        try:
            # after Dataset.checkpoint()/localCheckpoint() the analyzed
            # plan is a LogicalRDD holding the checkpointed internal RDD;
            # df.rdd would derive a NEW RDD whose unpersist frees nothing
            jrdd = self.df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            self.df.unpersist(blocking)
            return
        try:
            opt = jrdd.getCheckpointFile()
            if opt.isDefined():  # reliable checkpoint: delete its files
                sc = self.df.sparkSession.sparkContext
                p = sc._jvm.org.apache.hadoop.fs.Path(opt.get())
                p.getFileSystem(sc._jsc.hadoopConfiguration()).delete(p, True)
        except Exception:
            pass
        try:
            jrdd.unpersist(blocking)  # localCheckpoint block storage
        except Exception:
            pass


def assign_docids(
    docs: DataFrame, order_cols: list[str], base: int = 0,
    cleanup: list | None = None,
) -> DataFrame:
    """Dense ordinal docid (0-based, + ``base``) over a deterministic total
    order. Mirrors the reference's docid++ on each <DOC>
    (JASSjr_index.py:33-39): docid = position in corpus order.
    ``order_cols`` must be a unique key.

    Scale path (no single-task global sort): range-partition on the order
    key (partition i holds keys strictly below partition i+1), stamp
    partition ids, collect ONE count per partition, then docid =
    cumulative-offset[pid] + row_number within the pid — the window is
    partitioned, so each partition sorts independently. Identical output
    to ``row_number() over (order by ...)`` (asserted in tests), but the
    sort parallelizes across the cluster instead of funnelling 10^12 rows
    through one task.

    ``cleanup``: the internal staged frame must stay materialized until
    the RESULT is fully computed (range-partition bounds are sampled; the
    counts pass and the final pass must see the same assignment).
    Repeated callers (streaming micro-batches) pass a list to receive a
    handle and call its ``unpersist()`` after their action — otherwise
    each call would pin one batch-sized entry for the session's lifetime.
    The handle releases the REAL storage: it unpersists the checkpointed
    internal RDD's blocks (a plain ``DataFrame.unpersist`` is a
    CacheManager no-op on a checkpointed frame) and deletes the reliable-
    checkpoint files, which Spark never cleans by default
    (spark.cleaner.referenceTracking.cleanCheckpoints=false) — without
    this, a long-running indexing stream with a checkpoint dir leaks one
    batch-sized checkpoint directory per epoch (ADVICE r3).
    """
    spark = docs.sparkSession
    # Partition membership must be IDENTICAL between the counts job and
    # the assignment job, but repartitionByRange SAMPLES its bounds — a
    # lost cached partition would re-execute the exchange under freshly
    # sampled bounds and silently shift rows across partitions (duplicate
    # or skipped docids). CHECKPOINT the staged frame instead of caching
    # it: the materialized partitions are pinned, so recomputation under
    # different bounds is impossible. With a context checkpoint dir set
    # (spark.sparkContext.setCheckpointDir — do this on a real cluster;
    # it is also the engine's build-resume location) the checkpoint is
    # reliable and survives executor loss; without one, localCheckpoint
    # stores partitions on executors and a loss FAILS the job loudly
    # rather than producing divergent docids.
    staged = (
        docs.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    # eager=False: materialization happens during the counts collect just
    # below (one pass, like cache) instead of a separate eager job —
    # measured 2s/17% off the 16-core build leg; safety is identical once
    # materialized (within the materializing job, task retries share the
    # job's sampled bounds, so partition membership cannot diverge).
    if spark.sparkContext.getCheckpointDir():
        staged = staged.checkpoint(eager=False)
    else:
        staged = staged.localCheckpoint(eager=False)
    if cleanup is not None:
        cleanup.append(_StagedCleanup(staged))
    counts = {
        r._pid: r.n
        for r in staged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], base
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, base)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        staged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "docid",
            (F.col("_off") + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_pid", "_off")
    )


def build_index(
    docs: DataFrame,
    order_cols: list[str] | None = None,
    prepend_docno: bool = True,
    tokenizer_mode: str = "arrow",
) -> Index:
    """documents(docno, content[, ...]) -> Index.

    If ``order_cols`` is given, docids are assigned by that order;
    otherwise the input must already carry a ``docid`` column.
    tokenizer_mode: "arrow" (map-only pandas UDF, default — fastest
    measured) or "jvm" (pure built-ins) — identical output, see
    tokenize.py.
    """
    if order_cols is not None:
        docs = assign_docids(docs, order_cols)

    # Scale-adaptive scan spreading: an unsplittable single-row-group
    # parquet source serializes the tokenizer — and every downstream
    # cached artifact — on 1-2 cores; see functions/spread.py. Every
    # index artifact is an order-independent aggregation, so output is
    # unchanged (tests assert identity).
    from jassjr_spark.functions.spread import spread

    docs = spread(docs)

    postings = doc_term_frequencies(
        docs, prepend_docno=prepend_docno, mode=tokenizer_mode
    )

    # Per-doc length (every non-tag token counts, JASSjr_index.py:69). dl is
    # already on each posting row; min() just picks the constant without a
    # second tokenizer pass. Left join keeps zero-token docs (possible only
    # when prepend_docno=False) with len 0, matching the reference's
    # doc_lengths array which has an entry for every document.
    doc_lengths = (
        docs.select("docid")
        .join(postings.groupBy("docid").agg(F.min("dl").alias("len")),
              "docid", "left")
        .select("docid", F.coalesce("len", F.lit(0)).alias("len"))
    )

    dictionary = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cf")
    )

    docids = docs.select("docid", "docno")

    stats = doc_lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.sum("len").cast("long").alias("total_terms"),
    ).crossJoin(dictionary.agg(F.count(F.lit(1)).alias("vocab_size")))

    return Index(postings, dictionary, doc_lengths, docids, stats)


def top_df_stopwords(index: Index, n: int = 20) -> list[str]:
    """The corpus's own top-``n`` document-frequency terms — the
    classic collection-derived stopword list (ties: term asc, so the
    list is deterministic and any engine re-derives it identically)."""
    return [
        r.term for r in index.dictionary
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(n).collect()
    ]


def stopworded_index(index: Index, stopwords: list[str]) -> Index:
    """Derive the stopword-filtered index from a surface index — the
    index-time stop-filter analyzer as a relational remap, no
    re-tokenization: postings for stoplisted terms are dropped, document
    lengths are RECOMPUTED over the surviving postings (an index built
    without stopwords never counted them toward dl — BM25's length
    normalization must see the filtered lengths), and dictionary/stats
    rebuild from the remap. Queries need no special handling: a
    stoplisted query term is simply out-of-vocabulary.

    Scale shape: one postings-sized filter, one per-doc re-aggregation
    + docid-keyed join to ride the new dl back onto the postings rows
    (the same co-partitioning as the index build's own dl join), one
    vocab-sized dictionary rebuild. The result is an ordinary Index —
    searchable, persistable, WAND-able."""
    if not stopwords:
        return index
    p0 = index.postings.filter(~F.col("term").isin(list(stopwords)))
    dl2 = p0.groupBy("docid").agg(F.sum("tf").cast("int").alias("len"))
    doc_lengths = (
        index.docids.select("docid")
        .join(dl2, "docid", "left")
        .select("docid", F.coalesce("len", F.lit(0)).alias("len"))
    )
    # keep the bucket column when the source is a persisted store:
    # filtering rows never moves a term between buckets, so the derived
    # index stays bucket-prunable (dropping it would force every
    # stopworded query to scan all bucket dirs)
    cols = ["term", "docid", "tf", "dl"] + (
        ["bucket"] if "bucket" in index.postings.columns else []
    )
    p = p0.drop("dl").join(
        dl2.withColumnRenamed("len", "dl"), "docid"
    ).select(*cols)
    d = p.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    stats = doc_lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len").alias("avgdl"),
        F.sum("len").cast("long").alias("total_terms"),
    ).crossJoin(d.agg(F.count(F.lit(1)).cast("long").alias("vocab_size")))
    return Index(postings=p, dictionary=d, doc_lengths=doc_lengths,
                 docids=index.docids, stats=stats,
                 n_buckets=index.n_buckets)

"""Persisted trigram store — the grep analogue of the term index store.

Layout (all Parquet, mirroring sources/index_store.py's contract):

    {path}/grams/bucket=NN/...  (gram, docid), gram-bucket-hashed,
                                sorted (gram, docid) within files
    {path}/gram_df/             (gram, df) — the rarest-first statistic
    {path}/_meta                (n_buckets, ...) layout contract

Why this layout scales (10^12 files, the Zoekt/Code-Search shard shape):

* ``bucket = md5(gram) % n_buckets`` is the SAME portable hash as the
  term store (index_store.term_bucket_py/col), computable driver-side —
  a needle's <= max_grams trigrams map to bucket ids in Python and the
  scan prunes to those directories before any I/O.
* within a bucket, files sort by (gram, docid): row-group min/max stats
  on gram prune pages under the ``gram IN`` pushdown, and one gram's
  postings are contiguous — grep's per-gram fseek.
* the df probe is driver-side over gram_df restricted to the needle's
  grams (a <= max_grams-row lookup), so gram selection costs no job over
  the postings; hot-gram postings (the Zipf head) are never read at all
  once rarest-first selection skips them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.operators.grep import grep, needle_grams
from jassjr_spark.sources.index_store import (
    read_meta,
    term_bucket_col,
    term_bucket_py,
    write_meta,
)

DEFAULT_BUCKETS = 32


@dataclass
class TrigramStore:
    path: str
    grams: DataFrame  # (gram, docid, bucket)
    n_buckets: int

    @property
    def spark(self) -> SparkSession:
        return self.grams.sparkSession


def write_trigram_store(
    tri: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Persist a (gram, docid) relation from grep.build_trigram_index.

    _meta first (same rationale as write_index: a half-written store may
    be missing rows but can never prune the WRONG bucket)."""
    write_meta(tri.sparkSession, path, n_buckets)
    (
        tri.withColumn("bucket", term_bucket_col(F.col("gram"), n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("gram", "docid")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/grams")
    )
    (
        tri.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        .write.mode("overwrite").parquet(f"{path}/gram_df")
    )


def read_trigram_store(spark: SparkSession, path: str) -> TrigramStore:
    meta = read_meta(spark, path)
    return TrigramStore(
        path=path,
        grams=spark.read.parquet(f"{path}/grams"),
        n_buckets=meta["n_buckets"],
    )


def pruned_grams(store: TrigramStore, grams: list[str]) -> DataFrame:
    """Gram postings restricted to ``grams``: bucket-directory pruning
    (planning time) + gram IN pushdown (row-group min/max)."""
    p = store.grams
    if store.n_buckets > 0:
        buckets = sorted({term_bucket_py(g, store.n_buckets) for g in grams})
        p = p.filter(F.col("bucket").isin(buckets))
    return p.filter(F.col("gram").isin(list(grams)))


def local_gram_dfs(
    store: TrigramStore, max_grams: int = 2_000_000
) -> dict[str, int] | None:
    """Driver-resident (gram -> df) snapshot of the store's dictionary —
    the grep analogue of operators/search.local_dictionary (the
    reference-style startup-loaded vocab). Removes the per-needle df
    probe JOB entirely for repeated queries over one store. Budget-gated:
    None above ``max_grams`` distinct trigrams (at web scale the
    per-needle filtered probe over the sorted gram_df table is the right
    plan and this snapshot must not be attempted)."""
    df = store.spark.read.parquet(f"{store.path}/gram_df")
    if df.count() > max_grams:
        return None
    return {r.gram: r.df for r in df.collect()}


def probe_gram_dfs(store: TrigramStore, needle: str) -> dict[str, int]:
    """(gram -> df) for the needle's grams only — a tiny driver-side
    lookup against the persisted gram_df table. Grams absent from the
    corpus are absent here; grep_candidates treats them as df 0 (they
    sort first and correctly empty the intersection)."""
    grams = needle_grams(needle)
    if not grams:
        return {}
    rows = (
        store.spark.read.parquet(f"{store.path}/gram_df")
        .filter(F.col("gram").isin(grams))
        .collect()
    )
    return {r.gram: r.df for r in rows}


def grep_persisted(
    docs: DataFrame,
    needle: str,
    store: TrigramStore,
    max_grams: int = 8,
    id_col: str = "docid",
    content_col: str = "content",
    gram_dfs: dict[str, int] | None = None,
) -> DataFrame:
    """grep against the persisted store: df probe -> rarest-first gram
    selection -> bucket/gram-pruned candidate scan -> exact verify over
    ``docs``. Answer identical to the unindexed scan (asserted in tests);
    only the plan changes.

    ``gram_dfs``: an already-resident (gram -> df) snapshot (from
    local_gram_dfs) — skips the per-needle probe job; the rarest-first
    selection reads the same df values either way, so the plan and the
    answer are unchanged."""
    from jassjr_spark.operators.grep import select_grams

    dfs = gram_dfs if gram_dfs is not None else probe_gram_dfs(store, needle)
    # the SAME selection helper the candidate join applies — the pruned
    # index must contain exactly the grams grep will count
    chosen = select_grams(needle, max_grams, dfs)
    if chosen:
        index = pruned_grams(store, chosen)
    else:
        index = None  # needle < 3 chars: full-scan fallback inside grep
    return grep(
        docs, needle, index=index, max_grams=max_grams, gram_dfs=dfs,
        id_col=id_col, content_col=content_col,
    )


def grep_many_persisted(
    docs: DataFrame,
    needles: list[str],
    store: TrigramStore,
    max_grams: int = 8,
    id_col: str = "docid",
    content_col: str = "content",
    gram_dfs: dict[str, int] | None = None,
) -> DataFrame:
    """Batched grep over the persisted store: N needles cost ONE
    gram_df probe (union of every needle's grams), ONE bucket/gram-
    pruned candidate scan (union of the selected grams only), and one
    verify join — the job count stays constant in N, the scan stays
    pruned to exactly the grams the per-needle rarest-first selection
    would touch. Answers match grep_persisted needle-by-needle
    (asserted in tests)."""
    from jassjr_spark.operators.grep import grep_many, needle_grams

    all_grams = sorted({g for n in needles for g in needle_grams(n)})
    if not all_grams:
        return grep_many(docs, needles, index=None,
                         id_col=id_col, content_col=content_col)
    if gram_dfs is not None:
        dfs = gram_dfs  # resident snapshot: same df values, no probe job
    else:
        rows = (
            store.spark.read.parquet(f"{store.path}/gram_df")
            .filter(F.col("gram").isin(all_grams))
            .collect()
        )
        dfs = {r.gram: r.df for r in rows}
    from jassjr_spark.operators.grep import select_grams
    # union of the per-needle selections, via the SAME helper grep_many
    # applies per needle
    selected = sorted({
        g for n in needles for g in select_grams(n, max_grams, dfs)
    })
    return grep_many(
        docs, needles, index=pruned_grams(store, selected),
        max_grams=max_grams, gram_dfs=dfs,
        id_col=id_col, content_col=content_col,
    )

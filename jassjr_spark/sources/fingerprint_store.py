"""Persisted corpus fingerprint store — incremental dedup at crawl scale.

The batch dedup operators (operators/dedup.py) compare a corpus against
itself. At 100 TB the operational shape is different: an existing corpus's
fingerprints are computed ONCE, persisted, and every *new* crawl batch is
checked against the store — re-fingerprinting 10^12 existing docs per
batch would dwarf the batch itself. This module is the text analogue of
the persisted ANN stores (sources/vector_store.py):

    {path}/bands/band=B/bh_bucket=K/...  (bh, docid) banded-MinHash
                                         buckets, partitioned so a probe
                                         batch prunes to its own buckets
    {path}/sigs/                         (docid, sig) full signatures for
                                         estimated-Jaccard verification
    {path}/shas/sha_bucket=K/...         (sha, docid) exact-dup hashes
    {path}/_fp_meta/                     n, num_hashes, bands, n_buckets

Writes are append-able (new corpus batches extend the store with
mode=append — partition dirs gain files, no rewrite). Probing:

1. The new batch's signatures/bands/shas are computed (batch-sized).
2. The store side is pruned: the probe batch's distinct (band, bh_bucket)
   and sha_bucket keys — at most ``bands × batch`` values, collected
   driver-side exactly like the postings bucket probe — become partition
   filters, so store I/O is proportional to the BATCH, not the corpus.
3. Candidates join on (band, bh); verification joins full signatures and
   scores estimated Jaccard = fraction of agreeing minhash positions.
   Exact duplicates short-circuit on sha equality.

Everything is md5-derived string math (dedup.minhash_signatures), so the
store is engine-portable and the DuckDB oracle reproduces probes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassjr_spark.operators.dedup import minhash_signatures

DEFAULT_BUCKETS = 16


def _fp_meta_path(path: str) -> str:
    return f"{path}/_fp_meta"


def _banded(sig_df: DataFrame, num_hashes: int, bands: int,
            n_buckets: int) -> DataFrame:
    """(docid, sig) -> (docid, band, bh, bh_bucket)."""
    rows = num_hashes // bands
    return sig_df.select(
        "docid",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.array_join(F.slice("sig", b * rows + 1, rows), "|")
                    ).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("x"),
    ).select(
        "docid",
        "x.band",
        "x.bh",
        F.pmod(F.conv(F.substring("x.bh", 1, 4), 16, 10).cast("long"),
               F.lit(n_buckets)).alias("bh_bucket"),
    )


def _shas(docs: DataFrame, n_buckets: int) -> DataFrame:
    sha = F.sha2("content", 256)
    return docs.select(
        "docid",
        sha.alias("sha"),
        F.pmod(F.conv(F.substring(sha, 1, 4), 16, 10).cast("long"),
               F.lit(n_buckets)).alias("sha_bucket"),
    )


def write_fingerprint_store(
    docs: DataFrame,
    path: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Fingerprint ``docs`` (docid, content) and persist the store.

    ``mode="append"`` extends an existing store with a new corpus batch
    (the caller owns docid uniqueness across batches); partition layout
    means appends only add files inside existing bucket dirs.
    """
    spark = docs.sparkSession
    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    if mode == "append":
        meta = read_fp_meta(spark, path)
        if (meta["n"], meta["num_hashes"], meta["bands"],
                meta["n_buckets"]) != (n, num_hashes, bands, n_buckets):
            raise ValueError(
                f"append params {(n, num_hashes, bands, n_buckets)} != "
                f"store meta {meta}"
            )
    sigs = minhash_signatures(docs, n=n, num_hashes=num_hashes)
    (_banded(sigs, num_hashes, bands, n_buckets)
        .write.mode(mode).partitionBy("band", "bh_bucket")
        .parquet(f"{path}/bands"))
    sigs.write.mode(mode).parquet(f"{path}/sigs")
    (_shas(docs, n_buckets)
        .select("sha", "docid", "sha_bucket")
        .write.mode(mode).partitionBy("sha_bucket")
        .parquet(f"{path}/shas"))
    if mode != "append":
        spark.createDataFrame(
            [(n, num_hashes, bands, n_buckets)],
            "n int, num_hashes int, bands int, n_buckets int",
        ).coalesce(1).write.mode("overwrite").parquet(_fp_meta_path(path))


def read_fp_meta(spark: SparkSession, path: str) -> dict:
    r = spark.read.parquet(_fp_meta_path(path)).first()
    return {k: int(r[k]) for k in ("n", "num_hashes", "bands", "n_buckets")}


def dedup_against_store(
    new_docs: DataFrame,
    spark: SparkSession,
    path: str,
    *,
    est_threshold: float = 0.5,
    include_batch_pairs: bool = False,
) -> DataFrame:
    """Check a new crawl batch against the persisted corpus fingerprints.

    -> (docid, match_docid, n_bands, est_jaccard, exact): one row per
    (new doc, stored doc) pair that either shares a sha (``exact`` true,
    est_jaccard 1.0) or collides in >= 1 LSH band AND has estimated
    Jaccard (agreeing signature positions / num_hashes, rounded 4dp)
    >= ``est_threshold``.

    ``include_batch_pairs=True`` additionally reports WITHIN-batch
    pairs (same sha / band-colliding + verified, oriented docid >
    match_docid so min-docid wins under the streaming admission rule) —
    without it, two identical novel docs arriving in one micro-batch
    both look novel (the store has neither) and both get admitted.
    Reuses the batch signatures already computed for the store probe.

    The sha short-circuit runs INDEPENDENTLY of the banded path, so a
    batch whose docs have no tokens (empty shingle set -> no signatures)
    is still checked for byte-identical copies. Self-pairs (docid ==
    match_docid — possible only when a foreachBatch replay probes a
    store that already absorbed this batch) are filtered, making the
    probe idempotent under replay.

    Store I/O is pruned to the batch's own partition keys: the distinct
    (band, bh_bucket) / sha_bucket values of the BATCH are collected
    driver-side (bounded by bands × batch rows) and applied as partition
    filters before the joins. Batch signatures are materialized once via
    an eager localCheckpoint — unlike cache(), checkpointed blocks are
    released by the ContextCleaner when the frame is GC'd, so a
    long-running per-batch caller leaks nothing.
    """
    meta = read_fp_meta(spark, path)
    n, num_hashes = meta["n"], meta["num_hashes"]
    bands, n_buckets = meta["bands"], meta["n_buckets"]

    sigs_new = minhash_signatures(
        new_docs, n=n, num_hashes=num_hashes
    ).localCheckpoint(eager=True)
    # cheap posexplode over the checkpointed signatures; re-derived per use
    banded_new = _banded(sigs_new, num_hashes, bands, n_buckets)
    probe_buckets = [
        r["bh_bucket"]
        for r in banded_new.select("bh_bucket").distinct().collect()
    ]

    # verify: estimated jaccard = agreeing positions / num_hashes
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("q_sig", "s_sig", lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(num_hashes)),
        4,
    )

    def _verify(cand: DataFrame, s_sigs: DataFrame) -> DataFrame:
        return (
            cand.join(sigs_new.withColumnRenamed("sig", "q_sig"), "docid")
            .join(
                s_sigs.select(
                    F.col("docid").alias("match_docid"),
                    F.col("sig").alias("s_sig"),
                ),
                "match_docid",
            )
            .select("docid", "match_docid", "n_bands",
                    est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= est_threshold)
        )

    verified = spark.createDataFrame(
        [],
        "docid long, match_docid long, n_bands long, est_jaccard double",
    )
    if probe_buckets:
        # simple-predicate isin keeps the filter partition-prunable; the
        # value set is bounded by n_buckets regardless of batch size
        store_bands = spark.read.parquet(f"{path}/bands").filter(
            F.col("bh_bucket").isin(probe_buckets)
        )
        cand = (
            banded_new.alias("q")
            .join(store_bands.alias("s"), ["band", "bh"])
            .groupBy(
                F.col("q.docid").alias("docid"),
                F.col("s.docid").alias("match_docid"),
            )
            .agg(F.count("*").cast("long").alias("n_bands"))
        )
        verified = _verify(cand, spark.read.parquet(f"{path}/sigs"))
    if include_batch_pairs:
        cand_b = (
            banded_new.alias("q")
            .join(banded_new.alias("s"), ["band", "bh"])
            .filter(F.col("q.docid") > F.col("s.docid"))
            .groupBy(
                F.col("q.docid").alias("docid"),
                F.col("s.docid").alias("match_docid"),
            )
            .agg(F.count("*").cast("long").alias("n_bands"))
        )
        verified = verified.unionByName(_verify(cand_b, sigs_new))

    # exact short-circuit: sha equality, pruned the same way — and never
    # skipped: token-less docs have no signatures but do have a sha
    shas_new = _shas(new_docs, n_buckets).localCheckpoint(eager=True)
    sha_keys = [
        r["sha_bucket"]
        for r in shas_new.select("sha_bucket").distinct().collect()
    ] or [-1]  # zero-row batch: a never-hashable key keeps isin well-formed
    store_shas = spark.read.parquet(f"{path}/shas").filter(
        F.col("sha_bucket").isin(sha_keys)
    )
    exact_shape = (
        F.lit(int(bands)).cast("long").alias("n_bands"),
        F.lit(1.0).alias("est_jaccard"),
        F.lit(True).alias("exact"),
    )
    exact = (
        shas_new.alias("q")
        .join(store_shas.alias("s"), "sha")
        .select(
            F.col("q.docid").alias("docid"),
            F.col("s.docid").alias("match_docid"),
            *exact_shape,
        )
    )
    if include_batch_pairs:
        exact = exact.unionByName(
            shas_new.alias("q")
            .join(shas_new.alias("s"), "sha")
            .filter(F.col("q.docid") > F.col("s.docid"))
            .select(
                F.col("q.docid").alias("docid"),
                F.col("s.docid").alias("match_docid"),
                *exact_shape,
            )
        )
    out = (
        verified.join(
            exact.select("docid", "match_docid", F.lit(True).alias("is_exact")),
            ["docid", "match_docid"],
            "left",
        )
        .filter(F.col("is_exact").isNull())  # exact rows reported once below
        .select(
            "docid", "match_docid", "n_bands", "est_jaccard",
            F.lit(False).alias("exact"),
        )
        .unionByName(exact)
    )
    # self-pairs arise only when a replay probes a store that already
    # absorbed this batch (docids are caller-unique); dropping them makes
    # the probe idempotent — a replayed batch reports nothing new
    return out.filter(F.col("docid") != F.col("match_docid"))

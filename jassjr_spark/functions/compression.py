"""Blocked, delta+varbyte-compressed postings (SURVEY.md §7 stage 2; the
north-star's compression/impact layer — the reference stores raw int32
pairs, JASSjr_index.cpp:195-208, so this layer is additive and must decode
back to exactly the uncompressed postings).

Blocking strategy: ``block_id = docid // block_span`` — docid-RANGE blocks,
not count blocks. Two load-bearing properties at 10^12 scale:

* building them from exploded (term, docid, tf) rows is ONE skew-free
  ``groupBy(term, block_id)``: a stopword's 10^9 postings spread across
  10^9/span keys instead of one giant collect_list per term (a count-based
  blocking needs a per-term ordinal — a window over the skewed term key).
* blocks are docid-ALIGNED ACROSS TERMS, so a per-block score upper bound
  can be summed across a query's terms per block_id — exactly the skip
  condition of block-max WAND (operators/wand.py).

Each block row carries delta+varbyte payloads (docid gaps within the
block, then tfs, then doc lengths — dl rides along so the blocks path is
self-contained for scoring: no doc_lengths join at query time) plus the
block metadata WAND needs: n, max_impact = max over postings of the
idf-free BM25 factor (tf*(k1+1))/(tf + k1*(1-b+b*dl/avgdl)) — monotone in
tf, so the true per-doc contribution is always <= idf * max_impact.

Encode/decode run as Arrow-batched pandas UDFs over BinaryType; the
varbyte kernels are numpy-vectorized (one pass per 7-bit group, <= 10
groups for 64-bit ints — never per-int Python in the hot path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jassjr_spark.constants import B, K1

DEFAULT_BLOCK_SPAN = 1024

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_docid", T.LongType(), False),
        T.StructField("max_impact", T.DoubleType(), False),
        # avgdl-drift-safe bound ingredients: contrib is monotone
        # increasing in tf and decreasing in dl, so idf * contrib(max_tf,
        # min_dl) upper-bounds every posting under ANY avgdl; avgdl0
        # records the avgdl the baked max_impact froze, letting the query
        # rescale it safely (contrib growth under avgdl a1 > a0 is capped
        # by a1/a0) and take the TIGHTER of the two bounds — exactly the
        # baked bound on an undrifted batch store, still rank-safe on an
        # incrementally grown one (operators/wand.py:_block_upper_bounds)
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
        T.StructField("avgdl0", T.DoubleType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte (VByte) encode non-negative ints: 7 data bits per byte,
    high bit set on the final byte of each value. Vectorized: one numpy
    pass per 7-bit group (<= 10 for int64), no per-int Python loop."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value = number of 7-bit groups
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    shifted = v.copy()
    for i in range(int(nb.max())):
        mask = nb > i
        out[(ends - nb + i)[mask]] = (shifted[mask] & np.uint64(0x7F)).astype(
            np.uint8
        )
        shifted >>= np.uint64(7)
    out[ends - 1] |= 0x80  # terminator bit on each value's last byte
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Inverse of vb_encode. Vectorized: np.frombuffer + one pass per
    byte-position within a value (values are found by their high bits)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(b & 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(lengths.max())):
        mask = lengths > i
        vals[mask] |= (b[starts[mask] + i].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * i)
    return vals.astype(np.int64)


def encode_block(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, base: int
) -> bytes:
    """docid-ascending postings of one (term, block) -> payload bytes:
    varbyte(n) ++ varbyte(gaps) ++ varbyte(tfs) ++ varbyte(dls),
    gaps[0] = docids[0] - base."""
    gaps = np.diff(docids, prepend=base)
    head = vb_encode(np.asarray([len(docids)], dtype=np.int64))
    return head + vb_encode(gaps) + vb_encode(tfs) + vb_encode(dls)


def decode_block(
    payload: bytes, base: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    vals = vb_decode(payload)
    n = int(vals[0])
    gaps = vals[1 : n + 1]
    tfs = vals[n + 1 : 2 * n + 1]
    dls = vals[2 * n + 1 : 3 * n + 1]
    return base + np.cumsum(gaps), tfs, dls


def build_blocks(
    postings: DataFrame, avgdl: float, block_span: int = DEFAULT_BLOCK_SPAN
) -> DataFrame:
    """(term, docid, tf, dl) -> BLOCK_SCHEMA rows.

    One groupBy(term, block_id) with in-group sort — group size is bounded
    by block_span regardless of term skew. The per-posting impact is
    computed JVM-side before grouping (pure Column math); the struct list
    is split into aligned primitive arrays JVM-side too, so the Arrow pack
    kernel only sees numpy int arrays (no per-posting dict access)."""
    tf = F.col("tf").cast("double")
    impact = (tf * (K1 + 1.0)) / (
        tf + K1 * (1.0 - B + B * (F.col("dl").cast("double") / F.lit(float(avgdl))))
    )
    grouped = (
        postings.withColumn("block_id", (F.col("docid") / block_span).cast("long"))
        .withColumn("impact", impact)
        .groupBy("term", "block_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("docid", "tf", "dl"))
            ).alias("pl"),
            F.max("impact").alias("max_impact"),
            F.max("tf").cast("int").alias("max_tf"),
            F.min("dl").cast("int").alias("min_dl"),
        )
        .select(
            "term",
            "block_id",
            F.col("pl.docid").alias("pl_docids"),
            F.col("pl.tf").alias("pl_tfs"),
            F.col("pl.dl").alias("pl_dls"),
            "max_impact",
            "max_tf",
            "min_dl",
        )
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for term, block_id, ds, ts, ls, mx, mtf, mdl in zip(
                pdf["term"], pdf["block_id"], pdf["pl_docids"],
                pdf["pl_tfs"], pdf["pl_dls"], pdf["max_impact"],
                pdf["max_tf"], pdf["min_dl"]
            ):
                docids = np.asarray(ds, dtype=np.int64)
                tfs = np.asarray(ts, dtype=np.int64)
                dls = np.asarray(ls, dtype=np.int64)
                base = int(block_id) * block_span
                rows.append(
                    (term, int(block_id), len(docids), int(docids[0]),
                     float(mx), int(mtf), int(mdl), float(avgdl),
                     encode_block(docids, tfs, dls, base))
                )
            yield pd.DataFrame(
                rows,
                columns=["term", "block_id", "n", "first_docid",
                         "max_impact", "max_tf", "min_dl", "avgdl0",
                         "payload"],
            )

    return grouped.mapInPandas(pack, schema=BLOCK_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("docid", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def decode_blocks(
    blocks: DataFrame, block_span: int = DEFAULT_BLOCK_SPAN
) -> DataFrame:
    """BLOCK_SCHEMA rows -> exploded (term, docid, tf, dl): the round-trip
    inverse of build_blocks. Only (term, block_id, payload) columns are
    read — callers should filter blocks BEFORE calling so the payload scan
    is pruned (operators/wand.py does)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docids, tfs, dls = [], [], [], []
            for term, block_id, payload in zip(
                pdf["term"], pdf["block_id"], pdf["payload"]
            ):
                d, t, l = decode_block(bytes(payload), int(block_id) * block_span)
                terms.extend([term] * len(d))
                docids.append(d)
                tfs.append(t)
                dls.append(l)
            if terms:
                yield pd.DataFrame(
                    {
                        "term": terms,
                        "docid": np.concatenate(docids),
                        "tf": np.concatenate(tfs).astype("int32"),
                        "dl": np.concatenate(dls).astype("int32"),
                    }
                )
            else:
                yield pd.DataFrame({"term": pd.Series(dtype=object),
                                    "docid": pd.Series(dtype="int64"),
                                    "tf": pd.Series(dtype="int32"),
                                    "dl": pd.Series(dtype="int32")})

    return blocks.select("term", "block_id", "payload").mapInPandas(
        unpack, schema=DECODED_SCHEMA
    )


# Quantile grid for the per-term block-impact summary (build_block_stats):
# 17 evenly spaced CDF points reconstruct a term's impact distribution
# accurately enough for the adaptive gate's plan choice (the choice never
# affects results — operators/wand.py scores identically either way).
BLOCK_STATS_FRACTIONS = tuple(i / 16 for i in range(17))


def build_block_stats(blocks: DataFrame, min_blocks: int = 1) -> DataFrame:
    """-> (term, n_blocks, avgdl0, imp_q): one tiny row per term
    summarizing how that term's per-block impact bound (``max_impact``)
    is distributed across its blocks.

    This is the index-time metadata that lets the query-time adaptive
    WAND gate (operators/wand.py) decide blocks-vs-postings on the
    DRIVER — the same architecture as the reference, which loads its
    entire vocabulary into a hash map at startup (JASSjr_search.py:65-75)
    so per-query decisions never touch the index files.

    Scale shape: the table is one row per term that appears in >=
    ``min_blocks`` blocks. Under a Zipf vocabulary the terms with MANY
    blocks (the only ones whose distribution matters to the gate — a
    term in a handful of blocks contributes to a vanishing fraction of
    any query's candidate blocks) are few, so a deployment at 10^12 docs
    raises ``min_blocks`` to keep the driver-resident table bounded;
    terms below the floor are modeled conservatively from their df
    (wand.py:_missing_term_model)."""
    agg = [
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.percentile_approx(
            "max_impact", F.array(*[F.lit(f) for f in BLOCK_STATS_FRACTIONS]),
            F.lit(10_000),
        ).alias("imp_q"),
        # exact max, separate from the sketch: MaxScore's term bound is a
        # SAFETY bound (operators/maxscore.py), and a quantile sketch's
        # p=1.0 point is not contractually the exact maximum
        F.max("max_impact").alias("imp_max"),
    ]
    if "avgdl0" in blocks.columns:
        # a multi-epoch (LSM) store bakes each epoch's blocks under the
        # avgdl of ITS refresh (streaming/incremental.py:refresh_blocks),
        # so avgdl0 varies per block WITHIN a term. Keep the per-term
        # range (lo/hi, for the gate's drift refusal) plus the one extra
        # scalar that makes the driver-resident SAFETY bound exact for
        # any query-time avgdl:
        #   max_b[imp_b * max(1, avgdl/avgdl0_b)]
        #     = max(max_b imp_b,  avgdl * max_b(imp_b / avgdl0_b))
        # null-avgdl0 blocks (undrifted batch writes) contribute to
        # imp_max only — the same scale-1.0 treatment the collect side
        # has always given them.
        agg.append(F.min("avgdl0").alias("avgdl0"))
        agg.append(F.max("avgdl0").alias("avgdl0_hi"))
        agg.append(
            F.max(F.col("max_impact") / F.col("avgdl0"))
            .alias("imp_per_avgdl0")
        )
    else:  # legacy store: batch-written with its own stats, undrifted
        agg.append(F.lit(None).cast("double").alias("avgdl0"))
        agg.append(F.lit(None).cast("double").alias("avgdl0_hi"))
        agg.append(F.lit(None).cast("double").alias("imp_per_avgdl0"))
    out = blocks.groupBy("term").agg(*agg).select(
        "term", "n_blocks", "avgdl0", "avgdl0_hi", "imp_q", "imp_max",
        "imp_per_avgdl0",
    )
    if min_blocks > 1:
        out = out.filter(F.col("n_blocks") >= min_blocks)
    return out


def collect_block_stats(stats_df: DataFrame) -> dict:
    """Materialize a build_block_stats table into the driver-resident
    form the gate consumes: {"avgdl0": float|None, "avgdl0_range":
    (lo, hi)|None, "terms": {term: (n_blocks, np.ndarray quantiles,
    imp_max, imp_per_avgdl0|None)}}. One Spark job, run once per store
    at engine startup (mirrors the reference's vocab load).

    "avgdl0" is the store's single bake avgdl when it HAS one;
    multi-epoch stores (distinct bake avgdls across blocks) surface as
    avgdl0=None with a widened avgdl0_range, which makes both driver
    consumers conservative: the WAND gate refuses its local estimate on
    any drift against either end, and MaxScore's local bound falls back
    to the Spark bound scan unless the exact per-term imp_per_avgdl0
    scalar is present (operators/maxscore.py:term_upper_bounds_local)."""
    terms: dict[str, tuple[int, np.ndarray, float, float | None]] = {}
    lo = hi = None
    has_max = "imp_max" in stats_df.columns
    has_hi = "avgdl0_hi" in stats_df.columns
    has_ratio = "imp_per_avgdl0" in stats_df.columns
    for r in stats_df.collect():
        q = np.asarray(r["imp_q"], dtype=np.float64)
        ratio = (float(r["imp_per_avgdl0"])
                 if has_ratio and r["imp_per_avgdl0"] is not None else None)
        terms[r["term"]] = (
            int(r["n_blocks"]), q,
            float(r["imp_max"]) if has_max else float(q[-1]),
            ratio,
        )
        if r["avgdl0"] is not None:
            a = float(r["avgdl0"])
            b = (float(r["avgdl0_hi"])
                 if has_hi and r["avgdl0_hi"] is not None else a)
            lo = a if lo is None else min(lo, a)
            hi = b if hi is None else max(hi, b)
    # exact_max: whether imp_max came from an exact F.max (required for
    # MaxScore's SAFETY bound; a pre-imp_max table's sketch top point is
    # good enough for the WAND gate's plan choice but not for pruning)
    return {
        "avgdl0": lo if lo == hi else None,
        "avgdl0_range": (lo, hi) if lo is not None else None,
        "terms": terms,
        "exact_max": has_max,
    }

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
block, then tfs) plus the block metadata WAND needs: n, max_impact =
max over postings of the idf-free BM25 factor
(tf*(k1+1))/(tf + k1*(1-b+b*dl/avgdl)) — monotone in tf, so the true
per-doc contribution is always <= idf * max_impact.

Encode/decode run as Arrow-batched pandas UDFs over BinaryType.
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
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte (VByte) encode non-negative ints: 7 data bits per byte,
    high bit set on the final byte of each value."""
    out = bytearray()
    for v in values:
        v = int(v)
        while v >= 128:
            out.append(v & 0x7F)
            v >>= 7
        out.append(v | 0x80)
    return bytes(out)


def vb_decode(buf: bytes) -> np.ndarray:
    out = []
    cur = 0
    shift = 0
    for b in buf:
        if b & 0x80:
            out.append(cur | ((b & 0x7F) << shift))
            cur = 0
            shift = 0
        else:
            cur |= b << shift
            shift += 7
    return np.asarray(out, dtype=np.int64)


def encode_block(docids: np.ndarray, tfs: np.ndarray, base: int) -> bytes:
    """docid-ascending postings of one (term, block) -> payload bytes:
    varbyte(gaps) ++ varbyte(tfs), gaps[0] = docids[0] - base."""
    gaps = np.diff(docids, prepend=base)
    head = vb_encode(np.asarray([len(docids)], dtype=np.int64))
    return head + vb_encode(gaps) + vb_encode(tfs)


def decode_block(payload: bytes, base: int) -> tuple[np.ndarray, np.ndarray]:
    vals = vb_decode(payload)
    n = int(vals[0])
    gaps, tfs = vals[1 : n + 1], vals[n + 1 : 2 * n + 1]
    return base + np.cumsum(gaps), tfs


def build_blocks(
    postings: DataFrame, avgdl: float, block_span: int = DEFAULT_BLOCK_SPAN
) -> DataFrame:
    """(term, docid, tf, dl) -> BLOCK_SCHEMA rows.

    One groupBy(term, block_id) with in-group sort — group size is bounded
    by block_span regardless of term skew. The per-posting impact is
    computed JVM-side before grouping (pure Column math); the varbyte pack
    is an Arrow UDF over the collected block arrays.
    """
    tf = F.col("tf").cast("double")
    impact = (tf * (K1 + 1.0)) / (
        tf + K1 * (1.0 - B + B * (F.col("dl").cast("double") / F.lit(float(avgdl))))
    )
    grouped = (
        postings.withColumn("block_id", (F.col("docid") / block_span).cast("long"))
        .withColumn("impact", impact)
        .groupBy("term", "block_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("docid", "tf"))).alias("pl"),
            F.max("impact").alias("max_impact"),
        )
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for term, block_id, pl, mx in zip(
                pdf["term"], pdf["block_id"], pdf["pl"], pdf["max_impact"]
            ):
                docids = np.asarray([p["docid"] for p in pl], dtype=np.int64)
                tfs = np.asarray([p["tf"] for p in pl], dtype=np.int64)
                base = int(block_id) * block_span
                rows.append(
                    (term, int(block_id), len(docids), int(docids[0]),
                     float(mx), encode_block(docids, tfs, base))
                )
            yield pd.DataFrame(
                rows,
                columns=["term", "block_id", "n", "first_docid",
                         "max_impact", "payload"],
            )

    return grouped.mapInPandas(pack, schema=BLOCK_SCHEMA)


def decode_blocks(
    blocks: DataFrame, block_span: int = DEFAULT_BLOCK_SPAN
) -> DataFrame:
    """BLOCK_SCHEMA rows -> exploded (term, docid, tf): the round-trip
    inverse of build_blocks (minus dl/impact, which are derived)."""
    out_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("docid", T.LongType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, docids, tfs = [], [], []
            for term, block_id, payload in zip(
                pdf["term"], pdf["block_id"], pdf["payload"]
            ):
                d, t = decode_block(bytes(payload), int(block_id) * block_span)
                terms.extend([term] * len(d))
                docids.append(d)
                tfs.append(t)
            if terms:
                yield pd.DataFrame(
                    {
                        "term": terms,
                        "docid": np.concatenate(docids),
                        "tf": np.concatenate(tfs).astype("int32"),
                    }
                )
            else:
                yield pd.DataFrame({"term": pd.Series(dtype=object),
                                    "docid": pd.Series(dtype="int64"),
                                    "tf": pd.Series(dtype="int32")})

    return blocks.select("term", "block_id", "payload").mapInPandas(
        unpack, schema=out_schema
    )

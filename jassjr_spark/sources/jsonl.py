"""JSONL (newline-delimited JSON) source + sink for document corpora.

The reference ingests exactly one format — TREC XML on a local path
(JASSjr_index.cpp:299-320 reads the whole file into memory). A training
-data deployment of the same engine needs the interchange format the
LLM-data world actually uses: JSON lines, usually gzip'd, one document
object per line. This module is that connector, with the scale
discipline Spark's generic ``spark.read.json`` does NOT give you by
default:

* **Explicit schema, never inference.** Schema inference is a full
  extra pass over the data (at 100 TB: a second 100-TB scan before the
  first real one) and silently widens types from whatever it samples.
  Readers here require a schema (default: the documents-table shape).
* **Quarantine, don't crash, don't silently drop.** PERMISSIVE mode
  with a captured ``_corrupt_record`` column; ``read_jsonl_docs``
  returns (good, quarantined) so a pipeline can count/route bad lines
  instead of discovering them as NULL rows three stages later.
* **Bounded output files.** The writer composes with
  ``plans/data_pipeline.pack_shards``: partition by the shard column so
  every output directory is one bounded-token training shard, written
  in a single pass (no driver-side file juggling).

gzip/zstd transparency comes from Spark's codec layer on both read
(by file extension) and write (``compression=``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the synthetic documents-table shape (TESTDATA.md)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL under ``path`` -> (good_rows, quarantined_lines).

    good_rows has exactly ``schema``'s columns; quarantined_lines is
    (line string) — raw text of every line that failed to parse as an
    object of the schema. Malformed lines never become half-NULL rows.

    Scale shape: one distributed scan, split by Spark's line reader
    (gzip'd files are splittable only per-file — shard exports into
    many files, which pack_shards layouts already do). The corrupt
    column is pruned from the good path, so the common all-clean case
    pays nothing for the quarantine.
    """
    # text scan + from_json, NOT spark.read.json: Spark 4 forbids
    # queries that reference only the file relation's internal corrupt
    # column (SPARK-21610) unless the whole read is cached — a non-
    # starter at corpus scale. Parsing as an expression over a text
    # scan sidesteps that; from_json's own columnNameOfCorruptRecord
    # captures the raw line on parse OR type failure, and a legitimate
    # "{}" line stays good (all-null fields, null corrupt).
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("r")
    )
    good = parsed.filter(F.col(f"r.{_CORRUPT}").isNull()).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = (
        parsed.filter(F.col(f"r.{_CORRUPT}").isNotNull())
        .select(F.col(f"r.{_CORRUPT}").alias("line"))
    )
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    shard_col: str | None = None,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as JSON lines under ``path``.

    With ``shard_col`` (e.g. pack_shards' ``shard``), the export is
    partitioned into ``{path}/{shard_col}={k}/`` directories — one
    bounded training shard per directory, each readable on its own.
    Note partitionBy drops the shard column from the line payload (it
    lives in the path), matching parquet partitioning semantics.
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if shard_col is not None:
        w = w.partitionBy(shard_col)
    w.json(path)


def stream_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming face of the reader: watch ``path`` for new
    JSONL files and emit GOOD rows of ``schema`` per micro-batch.

    The parse is the same from_json expression as the batch reader, so
    the two faces accept byte-identical input. Malformed lines are
    DROPPED here (a streaming sink can't return two frames); pipelines
    that must audit rejects run the batch reader over the same files —
    the whole point of sharing the expression is that the verdicts
    can't diverge.

    ``max_files_per_trigger`` bounds each micro-batch (ingest-rate
    control on a 10^12-file feed). Feed the result straight to
    streaming/incremental.start_indexing_stream after mapping to its
    (docno, content) contract.
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    lines = reader.text(path)
    parsed = lines.select(
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("r")
    )
    return parsed.filter(F.col(f"r.{_CORRUPT}").isNull()).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )

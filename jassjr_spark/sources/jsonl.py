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


def _parse_lines(lines: DataFrame, schema: T.StructType) -> DataFrame:
    """(value string) lines -> one ``r`` struct column: the schema's
    fields plus the corrupt capture. SHARED by the batch and streaming
    readers so their parse verdicts cannot diverge.

    Blank / whitespace-only lines are dropped BEFORE parsing: from_json
    returns an all-NULL struct with a NULL corrupt field for them, which
    would otherwise pass the quarantine as phantom all-NULL "good" rows.
    Separator blank lines are standard JSONL tolerance — neither
    documents nor corruption.

    text scan + from_json, NOT spark.read.json: Spark 4 forbids queries
    that reference only the file relation's internal corrupt column
    (SPARK-21610) unless the whole read is cached — a non-starter at
    corpus scale. Parsing as an expression sidesteps that; from_json's
    own columnNameOfCorruptRecord captures the raw line on parse OR
    type failure, and a legitimate "{}" line stays good (all-null
    fields, null corrupt)."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    return lines.filter(F.trim(F.col("value")) != "").select(
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("r")
    )


def _good_rows(parsed: DataFrame, schema: T.StructType) -> DataFrame:
    return parsed.filter(F.col(f"r.{_CORRUPT}").isNull()).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )


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
    parsed = _parse_lines(spark.read.text(path), schema)
    good = _good_rows(parsed, schema)
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
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return _good_rows(_parse_lines(reader.text(path), schema), schema)

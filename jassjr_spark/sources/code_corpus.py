"""Source-code corpus: the BASELINE.json ``input_hint`` table shape.

The north rule's input is "an Iceberg table of source-code repositories
with columns (repo, path, commit, lang, content)" carrying a per-row
``sha256(content)`` integrity invariant. This module gives the engine a
first-class path over exactly that shape:

* :func:`synthesize_code_corpus` — a DETERMINISTIC generator deriving a
  (repo, path, commit, lang, content) table from the driver's
  ``documents`` table, every column a pure SQL expression (md5 / concat /
  mod) so the DuckDB oracle reconstructs the identical table and every
  downstream result stays hash-checkable. No randomness, no wall clock.
* :func:`code_documents` — maps the corpus into the engine's
  (docid, docno, content) contract with the production docno scheme
  ``repo:path@commit8`` (globally unique: one row per (repo, path,
  commit)).
* :func:`content_fingerprints` / :func:`verify_content_sha` — the
  per-row sha256 invariant: fingerprint any (docno, content) relation and
  anti-join two of them to prove an ingest/roundtrip preserved every byte.
* :func:`clone_pairs` — MOSS-style code-clone candidates: same-language
  file pairs sharing >= ``min_shared`` winnowing fingerprints
  (textstats.winnow_fingerprints supplies the guarantee that any shared
  token run of >= k + w - 1 tokens shares a fingerprint).

Scale notes (10^12 files): the corpus table partitions naturally by
``lang`` (low cardinality, stable) and bucket-by-``repo`` for per-tenant
scans — tests assert PartitionFilters reach the parquet scan when written
that way. ``clone_pairs`` self-joins on fingerprint, which is quadratic
in a fingerprint's document frequency, so hot fingerprints (boilerplate
grams: license headers, ``for (int i = 0``) are dropped by a ``max_fp_df``
stop-gram filter BEFORE the join — same banding-selectivity argument as
dedup.simhash_pairs' block-width guard; pairs lost this way are exactly
the pairs every near-dup bander drops for tractability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jassjr_spark.operators.textstats import winnow_fingerprints

# doc_id % 5 -> programming language + extension (deterministic, mirrors
# the CASE expression in the DuckDB oracle verbatim)
CODE_LANGS: list[tuple[str, str]] = [
    ("python", ".py"),
    ("java", ".java"),
    ("go", ".go"),
    ("rust", ".rs"),
    ("cpp", ".cc"),
]
N_REPOS = 13
N_MODULES = 17


def synthesize_code_corpus(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """documents -> (doc_id, repo, path, commit, lang, content).

    Every column is a deterministic function of ``doc_id`` (+ the text
    itself), expressible identically in Spark and DuckDB SQL:

    repo   = 'repo-' || doc_id % 13
    lang   = CODE_LANGS[doc_id % 5]
    path   = 'src/m' || doc_id % 17 || '/file_' || doc_id || ext(lang)
    commit = md5('commit:' || repo)   (one snapshot commit per repo)
    """
    i = F.col(id_col).cast("long")
    repo = F.concat(F.lit("repo-"), (i % N_REPOS).cast("string"))
    lang = F.lit(None).cast("string")
    ext = F.lit(None).cast("string")
    for j, (lg, ex) in enumerate(CODE_LANGS):
        lang = F.when(i % len(CODE_LANGS) == j, F.lit(lg)).otherwise(lang)
        ext = F.when(i % len(CODE_LANGS) == j, F.lit(ex)).otherwise(ext)
    path = F.concat(
        F.lit("src/m"), (i % N_MODULES).cast("string"),
        F.lit("/file_"), i.cast("string"), ext,
    )
    commit = F.md5(F.concat(F.lit("commit:"), repo))
    return docs.select(
        i.alias("doc_id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        F.col(text_col).alias("content"),
    )


def code_docno_col() -> Column:
    """The production docno scheme over input_hint columns:
    ``repo:path@commit8``. Unique per (repo, path, commit) row; carries
    enough to locate the source row without a lookup table."""
    return F.concat(
        F.col("repo"), F.lit(":"), F.col("path"),
        F.lit("@"), F.substring(F.col("commit"), 1, 8),
    )


def code_documents(corpus: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """corpus -> (docid, docno, content, repo, lang): the engine's document
    contract plus the metadata columns query-time scoping filters use.

    When the corpus has no numeric id (the raw input_hint shape),
    ``operators.index_build.assign_docids(order_cols=["repo", "path",
    "commit"])`` supplies the dense ordinal — that path is exercised by
    index_job --input-parquet."""
    return corpus.select(
        F.col(id_col).cast("long").alias("docid"),
        code_docno_col().alias("docno"),
        "content", "repo", "lang",
    )


def content_fingerprints(
    df: DataFrame, key_col: str = "docno", content_col: str = "content"
) -> DataFrame:
    """-> (key, sha): the BASELINE.json per-row integrity invariant,
    sha256 hex of the raw content bytes (identical hex in Spark/DuckDB)."""
    return df.select(
        F.col(key_col).alias(key_col),
        F.sha2(F.col(content_col).cast("string"), 256).alias("sha"),
    )


def verify_content_sha(
    ingested: DataFrame, source: DataFrame,
    key_col: str = "docno", content_col: str = "content",
) -> DataFrame:
    """Prove an ingest / storage roundtrip preserved every row byte-exactly.

    -> rows violating the invariant (missing key or differing sha), i.e.
    EMPTY iff ``sha256(content)`` matches per-row between the two
    relations. A full-outer join on the key keeps rows lost by either
    side visible instead of silently dropping them (a semi-join would
    report "all matched" on a truncated ingest)."""
    a = content_fingerprints(ingested, key_col, content_col).alias("a")
    b = content_fingerprints(source, key_col, content_col).alias("b")
    return (
        a.join(b, on=key_col, how="full_outer")
        .filter(
            F.col("a.sha").isNull()
            | F.col("b.sha").isNull()
            | (F.col("a.sha") != F.col("b.sha"))
        )
        .select(key_col, F.col("a.sha").alias("ingested_sha"),
                F.col("b.sha").alias("source_sha"))
    )


def clone_pairs(
    corpus: DataFrame,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_fp_df: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS-style same-language clone candidates over source files.

    -> (docid_a, docid_b, lang, shared_fps) with docid_a < docid_b, both
    files the same ``lang``, sharing >= ``min_shared`` winnowing
    fingerprints after stop-gram filtering.

    Shape for 10^12 files: winnow per doc (bounded by doc length), drop
    fingerprints with document frequency > ``max_fp_df`` (the quadratic
    stop-gram guard — a license-header gram in 10^8 files would otherwise
    produce 10^16 candidate rows from this join alone), then a
    fingerprint-bucketed self-join whose per-bucket fan-out is capped at
    max_fp_df^2. Both the filter and the join are plain shuffles on
    ``fp``; nothing is ever all-pairs in N.
    """
    docs = corpus.select(
        F.col(id_col).cast("long").alias("docid"), "lang", "content"
    )
    fps = winnow_fingerprints(docs.select("docid", "content"), k=k, w=w)
    rare = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("fp_df"))
        .filter(F.col("fp_df") <= max_fp_df)
        .select("fp"),
        "fp",
    )
    tagged = rare.join(docs.select("docid", "lang"), "docid")
    a = tagged.select(
        F.col("docid").alias("docid_a"), F.col("lang").alias("lang_a"), "fp"
    )
    b = tagged.select(
        F.col("docid").alias("docid_b"), F.col("lang").alias("lang_b"), "fp"
    )
    return (
        a.join(b, "fp")
        .filter(
            (F.col("docid_a") < F.col("docid_b"))
            & (F.col("lang_a") == F.col("lang_b"))
        )
        .groupBy("docid_a", "docid_b", F.col("lang_a").alias("lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )

"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's capabilities (SURVEY.md §2.4 lists them as
absent) with the operations a 100 TB corpus pipeline needs: token counting,
quality scoring, language-ID heuristics, and document fingerprinting. All
are pure Column expressions or Arrow-batched UDFs — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.constants import TOKEN_RE
from jassjr_spark.functions.tokenize import tokenize_udf

# A tiny embedded English stopword list for the language-ID heuristic and
# quality scoring; deterministic and shared with the DuckDB oracle SQL.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def token_counts(docs: DataFrame) -> DataFrame:
    """(docid, content) -> (docid, n_tokens, n_chars).

    Token = the engine's lexer token (TOKEN_RE); counted JVM-side with
    regexp_count — no Python in the plan at all.
    """
    return docs.select(
        F.col("docid"),
        F.regexp_count("content", F.lit(TOKEN_RE)).cast("long").alias("n_tokens"),
        F.length("content").cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(docid, content) -> per-doc quality features:

    n_tokens, mean_token_len, stopword_ratio (fraction of tokens in a fixed
    stopword list), distinct_ratio (type/token ratio). These are the
    standard cheap quality gates of web-corpus pipelines (length filters,
    stopword density, repetitiveness) computed as whole-stage-codegen
    Column math over a tokenized array.
    """
    toks = F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    d = docs.select("docid", toks.alias("toks"))
    n = F.size("toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t)))
    mean_len = F.when(
        n > 0,
        F.aggregate("toks", F.lit(0.0), lambda acc, t: acc + F.length(t))
        / n.cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        "docid",
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(
            F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n > 0, F.size(F.array_distinct("toks")).cast("double") / n.cast("double"))
            .otherwise(0.0),
            4,
        ).alias("distinct_ratio"),
    )


def langid_heuristic(docs: DataFrame, threshold: float = 0.08) -> DataFrame:
    """(docid, content) -> (docid, lang_guess): 'en' when the stopword
    density clears a threshold, else 'unk'. An n-gram/stopword-overlap
    heuristic — the real model call would slot into the same Column shape.
    """
    q = quality_scores(docs)
    return q.select(
        "docid",
        F.when(F.col("stopword_ratio") >= threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("lang_guess"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(docid, content) -> (docid, sha, fp): exact-dup fingerprints.

    sha = sha256 of raw content (the BASELINE.json per-row invariant hash);
    fp = md5 of the *normalized* token stream (lowercased tokens joined by
    one space) — robust to whitespace/case-only edits. Both are JVM-side
    built-ins; md5/sha256 hex output is identical across Spark and DuckDB,
    which makes these oracle-checkable.
    """
    norm = F.array_join(
        F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0), " "
    )
    return docs.select(
        "docid",
        F.sha2("content", 256).alias("sha"),
        F.md5(norm).alias("fp"),
    )

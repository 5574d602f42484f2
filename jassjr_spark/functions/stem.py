"""S-stemming: an optional light analyzer over the engine's vocabulary.

The reference indexes surface forms only (``JASSjr_index.py:53-56``
lowercases and truncates, nothing else) — exact parity keeps that as
the DEFAULT analyzer. Production engines offer light stemming as an
opt-in; the classic minimal-risk choice is Harman's "S stemmer"
(Donna Harman, *How effective is suffixing?*, JASIS 1991): three
suffix rules that conflate English plurals and nothing else:

    ...ies -> ...y     unless ending in  aies / eies
    ...es  -> ...e     unless ending in  aes / ees / oes
    ...s   -> (drop)   unless ending in  us / ss

Each rule is TERMINAL (Harman's else-if chain): a word that ends in an
exception suffix passes through unchanged rather than falling to the
next rule; words shorter than the rule's guard pass through. The whole
stemmer is ONE Column CASE expression —
JVM-side, whole-stage-codegen, and expressible verbatim in the DuckDB
oracle — so a *stemmed index* is a pure relational DERIVATION of the
surface index: remap postings.term, re-aggregate (term, docid), rebuild
the dictionary. Document lengths and N are analyzer-independent and
carry over unchanged; only tf/df/cf move.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import Index


def s_stem(term: Column) -> Column:
    """Harman S-stemmer as one Column expression (see module doc)."""
    n = F.length(term)
    end = lambda k: F.substring(term, -k, k)  # noqa: E731 — suffix probe
    return (
        F.when(
            (n > 3) & (end(3) == "ies"),
            F.when(end(4).isin("aies", "eies"), term).otherwise(
                F.concat(term.substr(F.lit(1), n - 3), F.lit("y"))
            ),
        )
        .when(
            (n > 3) & (end(2) == "es"),
            F.when(end(3).isin("aes", "ees", "oes"), term).otherwise(
                term.substr(F.lit(1), n - 1)
            ),
        )
        .when(
            (n > 2) & (end(1) == "s"),
            F.when(end(2).isin("us", "ss"), term).otherwise(
                term.substr(F.lit(1), n - 1)
            ),
        )
        .otherwise(term)
    )


SQL_S_STEM = """CASE
  WHEN length({t}) > 3 AND {t} LIKE '%ies'
    THEN CASE WHEN {t} LIKE '%aies' OR {t} LIKE '%eies' THEN {t}
              ELSE substr({t}, 1, length({t}) - 3) || 'y' END
  WHEN length({t}) > 3 AND {t} LIKE '%es'
    THEN CASE WHEN {t} LIKE '%aes' OR {t} LIKE '%ees' OR {t} LIKE '%oes'
              THEN {t}
              ELSE substr({t}, 1, length({t}) - 1) END
  WHEN length({t}) > 2 AND {t} LIKE '%s'
    THEN CASE WHEN {t} LIKE '%us' OR {t} LIKE '%ss' THEN {t}
              ELSE substr({t}, 1, length({t}) - 1) END
  ELSE {t}
END"""


def sql_s_stem(col: str) -> str:
    """The identical stemmer as ANSI SQL (for the DuckDB oracle)."""
    return SQL_S_STEM.format(t=col)


def stemmed_index(index: Index) -> Index:
    """Derive the S-stemmed index from a surface index — a relational
    remap, no re-tokenization: postings terms are stemmed and
    re-aggregated per (term, docid) (tf adds; dl is analyzer-independent
    and rides along via max — all rows of a docid share it), and the
    dictionary recomputes df/cf from the remapped postings. docids,
    doc_lengths, N, avgdl carry over unchanged, so BM25 scores over the
    stemmed index differ ONLY through tf/df conflation — exactly the
    stemming semantics of a production analyzer.

    Scale shape: one hash re-aggregation over postings (combiner-
    friendly; stem conflation SHRINKS groups) + one vocab-sized
    dictionary rebuild. The result is an ordinary Index — searchable,
    persistable, WAND-able — provided queries stem their terms with the
    same s_stem (callers do: stem_query_terms)."""
    p = (
        index.postings
        .withColumn("term", s_stem(F.col("term")))
        .groupBy("term", "docid")
        .agg(F.sum("tf").cast("int").alias("tf"),
             F.max("dl").cast("int").alias("dl"))
    )
    d = (
        p.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"),
             F.sum("tf").cast("long").alias("cf"))
    )
    stats = (
        index.stats.drop("vocab_size")
        .crossJoin(d.agg(F.count(F.lit(1)).cast("long").alias("vocab_size")))
    )
    return Index(postings=p, dictionary=d, doc_lengths=index.doc_lengths,
                 docids=index.docids, stats=stats, n_buckets=0)


def stem_words(words: list[str]) -> list[str]:
    """Driver-side twin of s_stem for query terms (bit-for-bit the same
    rules; queries must stem exactly like the index did)."""
    out = []
    for w in words:
        if len(w) > 3 and w.endswith("ies"):
            out.append(w if w.endswith(("aies", "eies")) else w[:-3] + "y")
        elif len(w) > 3 and w.endswith("es"):
            out.append(w if w.endswith(("aes", "ees", "oes")) else w[:-1])
        elif len(w) > 2 and w.endswith("s"):
            out.append(w if w.endswith(("us", "ss")) else w[:-1])
        else:
            out.append(w)
    return out

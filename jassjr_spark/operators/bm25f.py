"""BM25F: fielded ranking with per-field weights and normalization.

The reference scores one flat token stream (``JASSjr_index.py:53-79``
concatenates everything); real corpora have structure — for source code,
a term hit in the file PATH is worth more than one in the body. BM25F
(Zaragoza et al., CIKM 2004) is the standard answer: per-field term
frequencies are length-normalized and weight-combined into one pseudo
frequency, then saturated once:

    tfn(t, d) = sum_f  w_f * tf_f / (1 - b_f + b_f * dl_f / avgdl_f)
    score(q, d) = sum_t  ln(N / df_t) * tfn / (k1 + tfn)

where df_t counts documents containing t in ANY field (so a path-only
match still scores) and the field order in the tfn sum is the fixed
``fields`` order — float-deterministic and mirrored verbatim by the
DuckDB oracle.

Spark-first shape: each field runs the SAME map-only Arrow tokenizer as
the main index (one pass per field over only that column), the per-field
postings meet in ONE full-outer join on (term, docid) — co-partitioned
by the join keys, no extra shuffle beyond the per-field combines — and
scoring reuses the broadcast-query + ordered-fold pipeline. Per-field
avgdl/N are driver scalars (exact integer sums, one CPython division
each).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.constants import K1
from jassjr_spark.functions.tokenize import doc_term_frequencies
from jassjr_spark.operators.search import top_k


@dataclass(frozen=True)
class Field:
    column: str      # text column of the docs frame
    weight: float    # w_f
    b: float         # per-field length-normalization strength


DEFAULT_FIELDS = (Field("content", 1.0, 0.4), Field("path", 3.0, 0.5))


@dataclass
class FieldedIndex:
    postings: DataFrame    # term, docid, tf_<col>/dl_<col> per field
    dictionary: DataFrame  # term, df  (df = docs matching in ANY field)
    docids: DataFrame      # docid, docno
    fields: tuple[Field, ...]
    n_docs: int
    avgdl: dict[str, float]

    def cache(self) -> "FieldedIndex":
        for df in (self.postings, self.dictionary, self.docids):
            df.cache()
        return self


def build_fielded_index(
    docs: DataFrame, fields: tuple[Field, ...] = DEFAULT_FIELDS
) -> FieldedIndex:
    """docs(docid, docno, <field columns>...) -> FieldedIndex."""
    n_docs = docs.count()
    per_field, length_frames, avgdl = [], [], {}
    for f in fields:
        tfd = doc_term_frequencies(
            docs.select(
                "docid", "docno", F.col(f.column).alias("content")
            ),
            prepend_docno=False,
        ).cache()
        per_field.append(
            tfd.select(
                "term", "docid",
                F.col("tf").alias(f"tf_{f.column}"),
            )
        )
        lengths = tfd.groupBy("docid").agg(
            F.min("dl").alias(f"dl_{f.column}")
        )
        length_frames.append(lengths)
        # zero-token docs are absent from tfd; their length is 0 and the
        # integer total is unaffected, so avgdl needs no left join here
        total = lengths.agg(F.sum(f"dl_{f.column}")).first()[0] or 0
        avgdl[f.column] = total / n_docs
    combined = reduce(
        lambda a, b: a.join(b, ["term", "docid"], "full_outer"), per_field
    )
    # per-doc field lengths ride the postings like dl does in the flat
    # index (denormalized once, no query-time length join)
    for lengths in length_frames:
        combined = combined.join(lengths, "docid", "left")
    combined = combined.select(
        "term", "docid",
        *[F.coalesce(f"tf_{f.column}", F.lit(0)).alias(f"tf_{f.column}")
          for f in fields],
        *[F.coalesce(f"dl_{f.column}", F.lit(0)).alias(f"dl_{f.column}")
          for f in fields],
    )
    dictionary = combined.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return FieldedIndex(
        postings=combined,
        dictionary=dictionary,
        docids=docs.select("docid", "docno"),
        fields=tuple(fields),
        n_docs=n_docs,
        avgdl=avgdl,
    )


def bm25f_search(
    index: FieldedIndex, queries: DataFrame, k: int = 10, k1: float = K1
) -> DataFrame:
    """(query_id, docno, rank, rsv) under BM25F. Same S4/S6/S7 driver
    probe discipline as the flat engine (CPython log; df==N elision;
    OOV drop), same ordered rsv fold, same top-k tie-breaks."""
    spark = queries.sparkSession
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    pairs = [
        (r.term, r.df)
        for r in index.dictionary.filter(F.col("term").isin(qterms)).collect()
    ]
    idf = [
        (t, math.log(index.n_docs / df)) for t, df in pairs
        if df < index.n_docs
    ]
    q = queries.join(
        F.broadcast(spark.createDataFrame(idf, "term string, idf double")),
        "term",
    )
    tfn = reduce(
        lambda acc, f: acc
        + F.lit(f.weight) * F.col(f"tf_{f.column}").cast("double")
        / (
            F.lit(1.0 - f.b)
            + F.lit(f.b)
            * (F.col(f"dl_{f.column}").cast("double") / F.lit(index.avgdl[f.column]))
        ),
        index.fields,
        F.lit(0.0),
    )
    scored = (
        index.postings.join(
            F.broadcast(q.select("query_id", "pos", "term", "idf")), "term"
        )
        .withColumn("tfn", tfn)
        .select(
            "query_id", "docid", "pos",
            # grouping matters for float identity with the SQL oracle:
            # idf * (tfn / (k1 + tfn)), never (idf * tfn) / (k1 + tfn)
            (F.col("idf")
             * (F.col("tfn") / (F.lit(float(k1)) + F.col("tfn"))))
            .alias("contrib"),
        )
    )
    acc = (
        scored.groupBy("query_id", "docid")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "contrib"))),
                F.lit(0.0),
                lambda a, x: a + x["contrib"],
            ).alias("rsv")
        )
    )
    ranked = top_k(acc, k)
    return index.docids.join(F.broadcast(ranked), "docid").select(
        "query_id", "docno", "rank", "rsv"
    )


def dismax_search(
    index: FieldedIndex, queries: DataFrame, k: int = 10,
    tie: float = 0.0, k1: float = K1,
) -> DataFrame:
    """Disjunction-max fielded ranking (Lucene's DisjunctionMaxQuery):
    per query term a document scores the MAX of its per-field BM25
    scores plus ``tie`` times the rest —

        s_f = w_f * (idf * (tf_f (k1+1)) / (tf_f + k1 (1 - b_f + b_f dl_f/avgdl_f)))
        contrib = max_f s_f + tie * (sum_f s_f - max_f s_f)

    — the "best field wins" alternative to BM25F's tf blending: BM25F
    normalizes-then-sums tf across fields into one saturated pseudo
    frequency, dismax keeps the fields as competing whole scorers, so a
    term matching a file's path AND its body takes the stronger signal
    instead of compounding. tie=0 is pure max; tie=1 degenerates to the
    weighted per-field sum. Same any-field df / CPython idf / elision
    discipline, ordered fold, and tie-breaks as bm25f_search; the
    operator grouping above is mirrored verbatim by the SQL oracle."""
    spark = queries.sparkSession
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    pairs = [
        (r.term, r.df)
        for r in index.dictionary.filter(F.col("term").isin(qterms)).collect()
    ]
    idf = [
        (t, math.log(index.n_docs / df)) for t, df in pairs
        if df < index.n_docs
    ]
    q = queries.join(
        F.broadcast(spark.createDataFrame(idf, "term string, idf double")),
        "term",
    )

    def field_score(f: Field):
        tf = F.col(f"tf_{f.column}").cast("double")
        return F.lit(f.weight) * (
            F.col("idf")
            * ((tf * (k1 + 1.0))
               / (tf + k1 * (1.0 - f.b + f.b
                             * (F.col(f"dl_{f.column}").cast("double")
                                / F.lit(index.avgdl[f.column])))))
        )

    scores = [field_score(f) for f in index.fields]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    total = reduce(lambda a, s: a + s, scores[1:], scores[0])
    contrib = best + F.lit(float(tie)) * (total - best)
    scored = (
        index.postings.join(
            F.broadcast(q.select("query_id", "pos", "term", "idf")), "term"
        )
        .select("query_id", "docid", "pos", contrib.alias("contrib"))
    )
    acc = (
        scored.groupBy("query_id", "docid")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "contrib"))),
                F.lit(0.0),
                lambda a, x: a + x["contrib"],
            ).alias("rsv")
        )
    )
    ranked = top_k(acc, k)
    return index.docids.join(F.broadcast(ranked), "docid").select(
        "query_id", "docno", "rank", "rsv"
    )

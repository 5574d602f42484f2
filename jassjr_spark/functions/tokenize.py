"""Tokenization — SURVEY.md §2 ops I2 (lex), I6 (lowercase), I7 (truncate).

Reference semantics (all verified against /root/reference):
* a token is a maximal ``[a-zA-Z0-9][a-zA-Z0-9-]*`` run
  (JASSjr_index.py:23; C++ lexer JASSjr_index.cpp:32-63),
* lowercased at index time (JASSjr_index.py:53, JASSjr_index.cpp:144-148),
* truncated to 255 chars (JASSjr_index.py:56, JASSjr_index.cpp:151-154),
* the DOCNO primary key is itself indexed as a normal lowercased term and
  counts toward document length (JASSjr_index.py:43-47 falls through to
  :53-69; explicit in JASSjr_index.exs:57-58) — callers prepend
  ``lower(docno)`` via ``prepend_docno=True``.

Everything is Arrow-batched (``mapInPandas`` / ``pandas_udf``): the regex
scan runs per document inside a pandas batch; the per-document term-frequency
aggregation happens *inside the same batch* with one vectorized pandas
groupby, so what leaves the Python worker — and what gets shuffled — is
already ``(term, docid, tf)``, never raw tokens. That in-UDF combine is the
map-side partial aggregation step of the index build (SURVEY.md §2 I8): at
10^12-document scale it cuts shuffle bytes by the average term frequency and
removes the need for a separate ``groupBy(term, docid).count()`` shuffle
(each docid lives in exactly one batch, so (term, docid) rows are globally
unique by construction).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jassjr_spark.constants import MAX_TOKEN_LEN, TOKEN_RE

_LEXER = re.compile(TOKEN_RE)

# Output schema of the tokenize+count stage; dl (document length, I9) is
# denormalized onto every posting so query-time scoring needs no join
# against a doc_lengths table (the Spark analogue of the reference's O(1)
# doc_lengths[docid] array probe, JASSjr_search.py:81).
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("docid", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def tokenize_series(content: pd.Series, docno: pd.Series | None = None) -> pd.Series:
    """Series of document strings -> Series of lists of normalized tokens.

    If ``docno`` is given, its lowercased value is prepended to each list
    (reference indexes the primary key, SURVEY.md §1.4 item 1).
    """
    lists = content.fillna("").map(_LEXER.findall)
    if docno is not None:
        lists = pd.Series(
            [[d] + toks for d, toks in zip(docno.astype(str), lists)],
            index=lists.index,
        )
    return lists


def _batch_to_postings(pdf: pd.DataFrame, prepend_docno: bool) -> pd.DataFrame:
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            {"term": pd.Series(dtype=object), "docid": pd.Series(dtype="int64"),
             "tf": pd.Series(dtype="int32"), "dl": pd.Series(dtype="int32")}
        )
    toks = tokenize_series(pdf["content"], pdf["docno"] if prepend_docno else None)
    lens = toks.map(len).to_numpy(dtype=np.int64)
    flat_docid = np.repeat(pdf["docid"].to_numpy(dtype=np.int64), lens)
    flat_term = pd.Series(
        [t for lst in toks for t in lst], dtype=object, copy=False
    )
    # normalize: lowercase + truncate (vectorized, C-backed pandas str ops)
    flat_term = flat_term.str.lower().str.slice(0, MAX_TOKEN_LEN)
    # one vectorized groupby per Arrow batch = map-side combine
    grouped = (
        pd.DataFrame({"docid": flat_docid, "term": flat_term})
        .groupby(["docid", "term"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    dl_by_doc = pd.Series(lens, index=pdf["docid"].to_numpy(dtype=np.int64))
    grouped["dl"] = dl_by_doc.reindex(grouped["docid"]).to_numpy(dtype=np.int32)
    grouped["tf"] = grouped["tf"].astype("int32")
    return grouped[["term", "docid", "tf", "dl"]]


def doc_term_frequencies(
    docs: DataFrame, prepend_docno: bool = True
) -> DataFrame:
    """(docid, docno, content) -> (term, docid, tf, dl), one row per distinct
    (term, doc) pair. Rows are globally unique without any further groupBy.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch_to_postings(pdf, prepend_docno)

    return docs.select("docid", "docno", "content").mapInPandas(
        gen, schema=POSTINGS_SCHEMA
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(content: pd.Series) -> pd.Series:
    """content -> array<string> of normalized tokens (no docno prepend).

    Used by the driver-facing queries and text-analysis operators where the
    token *sequence* (not tf map) is needed.
    """
    return content.fillna("").map(
        lambda s: [t.lower()[:MAX_TOKEN_LEN] for t in _LEXER.findall(s)]
    )


@F.pandas_udf(T.IntegerType())
def token_count_udf(content: pd.Series) -> pd.Series:
    """content -> number of tokens (document length WITHOUT docno)."""
    return content.fillna("").str.count(TOKEN_RE).astype("int32")

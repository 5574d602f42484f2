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
    (reference indexes the primary key, SURVEY.md §1.4 item 1). An EMPTY
    docno prepends nothing: the reference indexes no primary-key token
    for a document without one (JASSjr_index.py:43-47 — push_next never
    fires), and '' is a term the lexer can never emit.
    """
    lists = content.fillna("").map(_LEXER.findall)
    if docno is not None:
        lists = pd.Series(
            [([d] + toks) if d else toks
             for d, toks in zip(docno.astype(str), lists)],
            index=lists.index,
        )
    return lists


def _batch_to_postings(pdf: pd.DataFrame, prepend_docno: bool) -> pd.DataFrame:
    """Allocation-light batch kernel (the hot loop of the index build):

    * lowercase the CONTENT once per doc (one copy) instead of 37M
      per-token ``.str.lower()`` copies — lowering commutes with this
      ASCII lexer;
    * truncate only tokens that actually exceed 255 chars (a length scan
      is one vectorized int pass; slicing every token copies every token);
    * per-(doc, term) tf via factorize + np.unique on integer codes
      instead of a pandas object groupby.

    Output order is docid-major (docs in batch order, runs contiguous) —
    _batch_to_doc_postings relies on that.
    """
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            {"term": pd.Series(dtype=object), "docid": pd.Series(dtype="int64"),
             "tf": pd.Series(dtype="int32"), "dl": pd.Series(dtype="int32")}
        )
    # Reference order is lex-raw THEN lowercase-per-token
    # (JASSjr_index.py:23,53). Pre-lowering the whole doc (one copy instead
    # of per-token copies) commutes with the ASCII lexer ONLY for ASCII
    # content: a Unicode char whose lowercase maps into ASCII (e.g. KELVIN
    # SIGN -> 'k') would otherwise fuse with neighbouring runs. Fast path
    # pre-lowers ASCII rows; non-ASCII rows lex raw and lower per token.
    raw = pdf["content"].fillna("")
    ascii_mask = np.fromiter((s.isascii() for s in raw), dtype=bool, count=n)
    if ascii_mask.all():
        content = raw.str.lower()
    else:
        # lower ONLY the ascii rows (lowering all rows then discarding the
        # non-ascii results would double-copy exactly those rows)
        content = raw.copy()
        content[ascii_mask] = raw[ascii_mask].str.lower()
    # lower then 255-truncate, the same order as every word token (the
    # reference's length-byte cap applies to the primary-key term too);
    # astype(str) maps a NULL docno to 'None' -> 'none', which the jvm
    # path mirrors via coalesce
    docno = (
        pdf["docno"].astype(str).str.lower().str.slice(0, MAX_TOKEN_LEN)
        if prepend_docno else None
    )
    toks = tokenize_series(content, docno)
    if not ascii_mask.all():
        nonascii = np.flatnonzero(~ascii_mask)
        toks.iloc[nonascii] = toks.iloc[nonascii].map(
            lambda lst: [t.lower() for t in lst]
        )
    lens = toks.map(len).to_numpy(dtype=np.int64)
    flat_docid = np.repeat(pdf["docid"].to_numpy(dtype=np.int64), lens)
    flat_term = pd.Series(
        [t for lst in toks for t in lst], dtype=object, copy=False
    )
    tok_lens = flat_term.str.len().to_numpy()
    if (tok_lens > MAX_TOKEN_LEN).any():
        mask = tok_lens > MAX_TOKEN_LEN
        clipped = flat_term[mask].str.slice(0, MAX_TOKEN_LEN)
        flat_term = flat_term.copy()
        flat_term[mask] = clipped

    if len(flat_term) == 0:
        return pd.DataFrame(
            {"term": pd.Series(dtype=object), "docid": pd.Series(dtype="int64"),
             "tf": pd.Series(dtype="int32"), "dl": pd.Series(dtype="int32")}
        )
    term_codes, term_uniques = pd.factorize(flat_term, sort=False)
    doc_codes, doc_uniques = pd.factorize(flat_docid, sort=False)
    combo = doc_codes.astype(np.int64) * len(term_uniques) + term_codes
    u, counts = np.unique(combo, return_counts=True)
    out_doc_codes = (u // len(term_uniques)).astype(np.int64)
    # dl keyed by docid (NOT by code position: zero-token docs emit no flat
    # rows, so code numbering can skip batch rows)
    len_by_docid = pd.Series(lens, index=pdf["docid"].to_numpy(dtype=np.int64))
    dl_per_code = len_by_docid.reindex(np.asarray(doc_uniques)).to_numpy()
    out = pd.DataFrame(
        {
            "term": term_uniques.take(u % len(term_uniques)),
            "docid": np.asarray(doc_uniques).take(out_doc_codes),
            "tf": counts.astype("int32"),
            "dl": dl_per_code[out_doc_codes].astype("int32"),
        }
    )
    return out


DOC_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
    ]
)


def _batch_to_doc_postings(pdf: pd.DataFrame, prepend_docno: bool) -> pd.DataFrame:
    """One output row per document: (docid, dl, terms[], tfs[]).

    Crossing the Arrow boundary with per-DOC rows instead of per-posting
    rows cuts row-shaped serialization ~50x (measured: the per-posting
    transfer, not the tokenize, dominated CPU); the fan-out to posting rows
    happens JVM-side via explode(arrays_zip(...)), which is codegen.
    """
    g = _batch_to_postings(pdf, prepend_docno)  # docid-major group order
    docid_arr = g["docid"].to_numpy()
    if len(docid_arr) == 0:
        return pd.DataFrame(
            {"docid": pd.Series(dtype="int64"), "dl": pd.Series(dtype="int32"),
             "terms": pd.Series(dtype=object), "tfs": pd.Series(dtype=object)}
        )
    cut = np.flatnonzero(np.r_[True, docid_arr[1:] != docid_arr[:-1]])
    return pd.DataFrame(
        {
            "docid": docid_arr[cut],
            "dl": g["dl"].to_numpy()[cut],
            "terms": np.split(g["term"].to_numpy(), cut[1:]),
            "tfs": np.split(g["tf"].to_numpy(), cut[1:]),
        }
    )


def doc_term_frequencies(
    docs: DataFrame, prepend_docno: bool = True, mode: str = "arrow"
) -> DataFrame:
    """(docid, docno, content) -> (term, docid, tf, dl), one row per distinct
    (term, doc) pair.

    mode="arrow" (default): the pandas ``mapInPandas`` path — regex scan
    plus ONE vectorized pandas groupby per Arrow batch; the plan is
    map-only (no shuffle at all). Fastest measured variant (600k docs,
    32 cores: ~4.9s vs 7.3s for jvm) because the per-doc combine never
    leaves the batch.

    mode="jvm": whole-stage-codegen built-ins — ``regexp_extract_all`` +
    ``transform(lower/substring)`` + ``explode`` + hash aggregate. No
    Python workers, but the aggregate pays one exchange over the distinct
    (term, docid) rows that the Arrow path combines in-batch. Useful where
    Python workers are unavailable/undesired; identical output (asserted
    in tests). (A third variant — shuffle-free per-doc run-length encoding
    with higher-order array functions — was measured 9x SLOWER than either:
    HOF lambdas evaluate interpreted, per element. Not kept.)
    """
    if mode == "jvm":
        # lex RAW content, then lowercase+truncate per token — the
        # reference's operation order (JASSjr_index.py:23,53,56); lowering
        # first would fuse tokens around Unicode chars whose lowercase is
        # ASCII (KELVIN SIGN -> 'k')
        # NULL handling must MATCH the arrow kernel (the identical-output
        # contract below): content NULL lexes as '' (the doc still exists
        # and, with prepend_docno, still carries its docno posting — raw
        # NULL would null-propagate through transform/concat and explode
        # would drop the doc entirely); docno NULL stringifies to 'none'
        # exactly like pandas astype(str) + lower.
        word_tokens = F.transform(
            F.regexp_extract_all(
                F.coalesce(F.col("content"), F.lit("")),
                F.lit(TOKEN_RE), 0,
            ),
            lambda t: F.substring(F.lower(t), 1, MAX_TOKEN_LEN),
        )
        docno_tok = F.substring(
            F.lower(F.coalesce(F.col("docno").cast("string"),
                               F.lit("None"))),
            1, MAX_TOKEN_LEN,
        )
        tokens = (
            F.concat(
                # an EMPTY docno prepends nothing (same as the arrow
                # kernel: no primary-key token for a docno-less doc)
                F.filter(F.array(docno_tok), lambda t: t != F.lit("")),
                word_tokens,
            )
            if prepend_docno
            else word_tokens
        )
        with_toks = docs.select("docid", tokens.alias("toks"))
        toks = with_toks.select(
            "docid", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        return (
            toks.groupBy("term", "docid", "dl")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
            .select("term", "docid", "tf", F.col("dl").cast("int").alias("dl"))
        )

    if mode == "arrow_docrows":
        # per-DOC Arrow rows + JVM-side explode(arrays_zip) — measured
        # SLOWER than per-posting rows (np.split + list-of-array columns
        # cost more than the row-count saving buys); kept as a documented
        # negative result / cross-check variant.
        def gen_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _batch_to_doc_postings(pdf, prepend_docno)

        per_doc = docs.select("docid", "docno", "content").mapInPandas(
            gen_docs, schema=DOC_POSTINGS_SCHEMA
        )
        return per_doc.select(
            "docid", "dl", F.explode(F.arrays_zip("terms", "tfs")).alias("p")
        ).select(
            F.col("p.terms").alias("term"), "docid",
            F.col("p.tfs").alias("tf"), "dl",
        )

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

"""TREC-XML source & sink — SURVEY.md §2 ops I1, I3, I4, I5.

The reference consumes one TREC-XML text file: a stream of ``<DOC>…</DOC>``
records each holding a ``<DOCNO> key </DOCNO>`` (test_documents.xml:1-11,
parser JASSjr_index.cpp:101-170). Our engine's runtime input is a DataFrame
(one row per document, per BASELINE.json input_hint); TREC-file fidelity is
an ingestion concern:

* ``read_trec(spark, path)`` — distributed ingest of a TREC file into
  (docid, docno, content) rows. Tag semantics per SURVEY.md §1.4: a token
  is a word run or a ``<[^>]*>`` tag (JASSjr_index.py:23); ``<DOC>`` starts
  a document (docid++ , :33-39); the token after ``<DOCNO>`` is the verbatim
  primary key (:43-47); tags are never indexed (:49-50). Content keeps only
  non-tag text, with the DOCNO token INCLUDED downstream via
  prepend_docno (the reference indexes it, §1.4 item 1) — so here the docno
  token itself is stripped from content to avoid double counting.
* ``render_trec(rows)`` — documents rows -> TREC text in corpus order,
  used to feed the *reference* oracle (FIXTURES.md §2). Round-trip
  invariant: sha256(content) per row is unchanged (BASELINE.json).

Scale note: ``read_trec`` uses ``spark.read.text`` + a document-boundary
repair pass. TREC docs may span lines, so line-split parsing alone is wrong
in general; we parse per *file* with ``wholeTextFiles``-style semantics when
files are small, and per line-group otherwise. For the reference contract
(whitespace around tags, README.md:37) a two-phase approach is exact:
aggregate raw text per file partition, split on ``<DOC>``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Word-or-tag lexer, exactly JASSjr_index.py:23.
_FULL_LEXER = re.compile(r"[a-zA-Z0-9][a-zA-Z0-9-]*|<[^>]*>")


def parse_trec_text(text: str) -> list[tuple[int, str, str]]:
    """TREC text -> [(docid, docno, content_tokens_joined)].

    Replays the reference token-stream state machine
    (JASSjr_index.py:25-69) but keeps raw (pre-lowercase) word tokens as
    the document content; the DOCNO token is captured separately and NOT
    kept in content (the engine re-prepends it at tokenize time).
    """
    docs: list[tuple[int, str, str]] = []
    docid = -1
    docno = ""
    words: list[str] = []
    push_next = False
    for token in _FULL_LEXER.findall(text):
        if token == "<DOC>":
            if docid != -1:
                docs.append((docid, docno, " ".join(words)))
            docid += 1
            docno, words = "", []
        if push_next:
            docno = token
            push_next = False
            continue  # docno token re-added downstream via prepend_docno
        if token == "<DOCNO>":
            push_next = True
        if token.startswith("<"):
            continue
        words.append(token)
    if docid != -1:
        docs.append((docid, docno, " ".join(words)))
    return docs


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """TREC-XML file(s) -> documents(docid long, docno string, content string).

    Distributed two-pass ingest — document content NEVER lands on the
    driver:

    1. per-file ``<DOC>`` counts (one int per file reaches the driver),
       computed with the SAME lexer as the parse pass — a substring count
       would desynchronize on pathological unclosed ``<`` runs that the
       lexer consumes as one tag (SURVEY.md §1.4 item 12);
    2. broadcast filename -> cumulative offset (filename order, matching a
       sequential read of the directory), then a distributed flatMap parses
       each file and emits (offset + local_docid) rows.

    Parallelism unit is the file (wholeTextFiles semantics — TREC docs span
    lines, so a file must be parsed as one text). A 100-TB corpus arrives
    as many files, which is exactly this layout; one pathological giant
    file would serialize into one task, so shard inputs at produce time.
    """
    files = spark.sparkContext.wholeTextFiles(path)
    counts = sorted(
        files.map(
            lambda kv: (
                kv[0],
                sum(1 for t in _FULL_LEXER.findall(kv[1]) if t == "<DOC>"),
            )
        ).collect()
    )
    offsets: dict[str, int] = {}
    off = 0
    for name, c in counts:
        offsets[name] = off
        off += c
    boff = spark.sparkContext.broadcast(offsets)
    rows = files.flatMap(
        lambda kv: [
            (boff.value[kv[0]] + docid, docno, content)
            for docid, docno, content in parse_trec_text(kv[1])
        ]
    )
    return spark.createDataFrame(rows, "docid long, docno string, content string")


def render_trec(rows: list[tuple[str, str]]) -> str:
    """[(docno, content)] in corpus order -> TREC text (oracle input).

    Format mirrors test_documents.xml:1-11 — whitespace around tags is
    required (README.md:37). Newlines inside content are preserved (the
    reference lexer is line-oriented but tokens never span lines).
    """
    out = []
    for docno, content in rows:
        out.append(f"<DOC> <DOCNO> {docno} </DOCNO> {content} </DOC>")
    return "\n".join(out) + "\n"

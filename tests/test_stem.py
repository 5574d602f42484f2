"""S-stemmer analyzer (functions/stem.py): rule identity across the
Column / driver / SQL implementations, and the derived stemmed index."""

import duckdb
import pytest
from pyspark.sql import functions as F

from jassjr_spark.functions.stem import (
    s_stem,
    sql_s_stem,
    stem_words,
    stemmed_index,
)
from jassjr_spark.operators.index_build import build_index

WORDS = [
    "tables", "table", "queries", "query", "hashes", "hash", "glass",
    "corpus", "ties", "goes", "trees", "aliases", "ss", "s", "is", "its",
    "indexes", "studies", "types", "as", "bus", "base", "bases",
]
EXPECT = {
    "tables": "table", "queries": "query", "hashes": "hashe",
    "glass": "glass", "corpus": "corpus", "ties": "ty",
    "goes": "goes", "trees": "trees", "aliases": "aliase",
    "ss": "ss", "s": "s", "is": "is", "its": "it",
    "indexes": "indexe", "studies": "study", "types": "type",
    "as": "as", "bus": "bus", "base": "base", "bases": "base",
}


def test_stem_rules_three_ways(spark):
    """Column expr == driver twin == DuckDB SQL on every probe word."""
    got_py = stem_words(WORDS)
    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    got_col = [r.s for r in df.select(s_stem(F.col("term")).alias("s"))
               .collect()]
    con = duckdb.connect()
    got_sql = [
        con.execute(f"SELECT {sql_s_stem('?')}".replace("?", f"'{w}'"))
        .fetchone()[0]
        for w in WORDS
    ]
    assert got_py == got_col == got_sql
    for w, s in zip(WORDS, got_py):
        if w in EXPECT:
            assert s == EXPECT[w], (w, s)


def test_stemmed_index_conflates(spark):
    """'table'+'tables' share one stemmed posting list; df/cf add; dl,
    N, avgdl are untouched; stemmed search finds plural docs from a
    singular query."""
    from jassjr_spark.functions.stem import stem_words as sw
    from jassjr_spark.operators.search import search

    docs = spark.createDataFrame(
        [
            (0, "d0", "tables tables chair"),
            (1, "d1", "table lamp"),
            (2, "d2", "chairs lamp lamp"),
        ],
        "docid long, docno string, content string",
    )
    surface = build_index(docs, prepend_docno=False).cache()
    idx = stemmed_index(surface).cache()
    d = {r.term: (r.df, r.cf) for r in idx.dictionary.collect()}
    assert d["table"] == (2, 3) and d["chair"] == (2, 2)
    assert "tables" not in d and "chairs" not in d
    assert idx.scalar_stats()["n_docs"] == surface.scalar_stats()["n_docs"]
    assert idx.scalar_stats()["avgdl"] == surface.scalar_stats()["avgdl"]
    q = spark.createDataFrame(
        [(0, 0, t) for t in sw(["tables"])],
        "query_id long, pos int, term string",
    )
    hits = {r.docno for r in search(idx, q).collect()}
    assert hits == {"d0", "d1"}
    # surface index keeps exact-parity behavior: 'tables' matches d0 only
    q2 = spark.createDataFrame([(0, 0, "tables")],
                               "query_id long, pos int, term string")
    assert {r.docno for r in search(surface, q2).collect()} == {"d0"}


def test_stem_edge_lengths():
    # guards: <=3 chars skip the ies/es rules ('ies' falls through to the
    # bare-s rule), <=2 chars skip the s rule entirely
    assert stem_words(["ies", "es", "ss", "us", "xs", "cats"]) == \
        ["ie", "es", "ss", "us", "xs", "cat"]

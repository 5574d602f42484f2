"""More-like-this (operators/mlt.py)."""

import pytest

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.mlt import mlt_terms, more_like_this


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "spark shuffle merge merge merge unique0"),
            (1, "d1", "spark shuffle merge join"),
            (2, "d2", "spark shuffle sort"),
            (3, "d3", "spark join sort"),
            (4, "d4", "completely unrelated words here"),
        ],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    return docs, idx


def test_mlt_terms_selection(corpus):
    docs, idx = corpus
    # doc 0 terms: spark(df=4), shuffle(df=3), merge(df=2, tf=3), unique0(df=1)
    # unique0 dropped (df < min_df=2); merge has tf=3 so the top weight;
    # spark df==4 < n==5 so it stays, weighted lowest
    terms = mlt_terms(idx, docs, 0, n_terms=3)
    assert terms[0] == "merge"
    assert set(terms) == {"merge", "shuffle", "spark"}
    # n_terms truncation respects the (weight desc, term asc) order
    assert mlt_terms(idx, docs, 0, n_terms=1) == ["merge"]


def test_mlt_excludes_source_and_ranks(corpus):
    docs, idx = corpus
    rows = more_like_this(idx, docs, 0, k=10).collect()
    docnos = [r.docno for r in rows]
    assert "d0" not in docnos
    # d1 shares all three selected terms -> closest
    assert docnos[0] == "d1"
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.rsv > 0 for r in rows)


def test_mlt_no_qualifying_terms(spark):
    docs = spark.createDataFrame(
        [(0, "a", "onlyhere"), (1, "b", "elsewhere")],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    # every source term has df=1 < min_df -> empty result, stable schema
    out = more_like_this(idx, docs, 0, k=5)
    assert out.columns == ["docno", "rank", "rsv"]
    assert out.collect() == []

"""Pseudo-relevance feedback (operators/prf.py)."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.prf import (
    EXPAND_POS_BASE,
    prf_expansion_terms,
    prf_feedback,
    prf_search,
)
from jassjr_spark.operators.search import search


@pytest.fixture(scope="module")
def corpus(spark):
    # 'laser' co-occurs with 'photon' in the docs that match the query;
    # 'noise' is everywhere (df == N -> never an expansion term)
    docs = spark.createDataFrame(
        [
            (0, "d0", "laser photon photon noise"),
            (1, "d1", "laser photon noise"),
            (2, "d2", "laser beam noise"),
            (3, "d3", "photon detector noise"),
            (4, "d4", "unrelated text noise"),
            (5, "d5", "more unrelated words noise"),
        ],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    return docs, idx


def _queries(spark):
    return spark.createDataFrame(
        [(1, 0, "laser")], "query_id long, pos int, term string"
    )


def test_feedback_cut(spark, corpus):
    _, idx = corpus
    run = search(idx, _queries(spark), k=10)
    fb = prf_feedback(idx, run, r=2)
    assert fb.count() == 2
    assert {r.docid for r in fb.collect()} <= {0, 1, 2}


def test_expansion_selection(spark, corpus):
    _, idx = corpus
    q = _queries(spark)
    run = search(idx, q, k=10)
    fb = prf_feedback(idx, run, r=3)  # docs 0,1,2
    exp = prf_expansion_terms(idx, fb, q, n_expand=2, min_df=2)
    # 'laser' excluded (original term); 'noise' excluded (df == N);
    # 'photon' (tf_sum 3, df 3) outweighs 'beam' (df 1 -> below min_df)
    assert exp[1][0] == "photon"
    assert "laser" not in exp[1] and "noise" not in exp[1]


def test_prf_search_promotes_coocurring_docs(spark, corpus):
    _, idx = corpus
    out = prf_search(idx, _queries(spark), k=10, r=3, n_expand=2, min_df=2)
    rows = {r.docno: r.rank for r in out.collect()}
    # doc 3 has no 'laser' but is rich in the expansion term 'photon' —
    # PRF surfaces it; plain search could never return it
    assert "d3" in rows
    plain = {r.docno for r in search(idx, _queries(spark), k=10).collect()}
    assert "d3" not in plain
    # ranks contiguous from 1
    assert sorted(rows.values()) == list(range(1, len(rows) + 1))


def test_expansion_pos_base_is_after_any_query(spark, corpus):
    # fold-order contract: expansion positions start at EXPAND_POS_BASE
    assert EXPAND_POS_BASE >= 1000

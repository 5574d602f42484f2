"""Autocomplete + related-terms tooling (operators/tooling.py)."""

import pytest

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.tooling import complete_prefix, related_terms


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "spark sparse sorting spark"),
            (1, "d1", "spark shuffle merge"),
            (2, "d2", "merge sort shuffle"),
            (3, "d3", "unrelated words"),
        ],
        "docid long, docno string, content string",
    )
    return build_index(docs, prepend_docno=False).cache()


def test_complete_prefix_ranks_by_cf(idx):
    rows = complete_prefix(idx, "sp", k=10).collect()
    # spark cf=3 beats sparse cf=1; sorting/shuffle/sort excluded by prefix
    assert [(r.term) for r in rows] == ["spark", "sparse"]
    assert rows[0].cf == 3 and rows[0].df == 2


def test_complete_prefix_k_cut(idx):
    rows = complete_prefix(idx, "s", k=2).collect()
    # cf order: spark(3), shuffle(2), then ties at cf=1 by term
    assert [r.term for r in rows] == ["spark", "shuffle"]


def test_related_terms_lift(idx):
    rows = related_terms(idx, "shuffle", k=10, min_co=1).collect()
    got = {r.term: (r.n_co, r.df) for r in rows}
    # docs with shuffle: {1, 2}; merge co-occurs in both (df 2 -> lift 1.0)
    assert got["merge"] == (2, 2)
    lifts = {r.term: r.lift for r in rows}
    assert lifts["merge"] == 1.0
    assert rows[0].term == "merge"  # highest lift first
    # seed itself never appears
    assert "shuffle" not in got


def test_related_terms_min_co(idx):
    rows = related_terms(idx, "shuffle", k=10, min_co=2).collect()
    assert {r.term for r in rows} == {"merge"}

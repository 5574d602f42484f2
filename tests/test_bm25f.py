"""BM25F fielded ranking (operators/bm25f.py)."""

import pytest

from jassjr_spark.operators.bm25f import (
    Field,
    bm25f_search,
    build_fielded_index,
)


@pytest.fixture(scope="module")
def fidx(spark):
    docs = spark.createDataFrame(
        [
            (0, "d0", "alpha beta", "src/tools/util.py"),
            (1, "d1", "alpha alpha gamma", "src/core/alpha.py"),
            (2, "d2", "delta epsilon", "src/core/main.py"),
            (3, "d3", "zeta", "docs/readme.md"),
        ],
        "docid long, docno string, content string, path string",
    )
    fields = (Field("content", 1.0, 0.4), Field("path", 3.0, 0.5))
    return build_fielded_index(docs, fields).cache()


def _q(spark, terms, qid=1):
    return spark.createDataFrame(
        [(qid, p, t) for p, t in enumerate(terms)],
        "query_id long, pos int, term string",
    )


def test_df_counts_any_field(fidx):
    # 'alpha': content in d0/d1, path in d1 -> df 2; 'py': path-only df 3
    dfs = {r.term: r.df for r in fidx.dictionary.collect()}
    assert dfs["alpha"] == 2
    assert dfs["py"] == 3
    assert dfs["readme"] == 1


def test_path_only_terms_score(spark, fidx):
    out = bm25f_search(fidx, _q(spark, ["readme"])).collect()
    assert [r.docno for r in out] == ["d3"]
    assert out[0].rsv > 0


def test_field_weight_boosts_path_hits(spark, fidx):
    # 'alpha' matches d0 (content only, tf 1) and d1 (content tf 2 AND
    # path); the 3x path weight must put d1 clearly first
    out = bm25f_search(fidx, _q(spark, ["alpha"])).collect()
    ranks = {r.docno: r.rank for r in out}
    assert ranks == {"d1": 1, "d0": 2}


def test_avgdl_per_field(fidx):
    # content lengths: 2,3,2,1 -> 2.0; path token lengths: 4,4,4,3 -> 3.75
    assert fidx.avgdl["content"] == 2.0
    assert fidx.avgdl["path"] == 3.75


def test_df_equals_n_elision(spark, fidx):
    # 'src' appears in 3 of 4 paths -> scorable; 'py' in 3 -> scorable;
    # craft a term in every doc's fields: none here, so check OOV drop
    assert bm25f_search(fidx, _q(spark, ["zzznope"])).collect() == []


def test_dismax_semantics(spark):
    """tie=0: contrib == the best single field's score; tie=1: == the
    weighted per-field sum; a both-fields term ranks between."""
    import pytest as _pt

    from jassjr_spark.operators.bm25f import (
        Field, build_fielded_index, dismax_search,
    )

    docs = spark.createDataFrame(
        [
            (0, "d0", "alpha beta", "alpha.py"),      # alpha in BOTH fields
            (1, "d1", "alpha gamma", "other.rs"),     # alpha content-only
            (2, "d2", "delta", "beta.py"),            # beta path-only
            (3, "d3", "filler words", "more.go"),
        ],
        "docid long, docno string, content string, path string",
    )
    fields = (Field("content", 1.0, 0.4), Field("path", 3.0, 0.5))
    idx = build_fielded_index(docs, fields).cache()
    q = spark.createDataFrame(
        [(1, 0, "alpha")], "query_id long, pos int, term string"
    )

    def runs(tie):
        return {r.docno: r.rsv
                for r in dismax_search(idx, q, k=10, tie=tie).collect()}

    r0, r1 = runs(0.0), runs(1.0)
    assert set(r0) == {"d0", "d1"}
    # content-only doc: only one field scores -> tie cannot matter
    assert r0["d1"] == _pt.approx(r1["d1"], abs=1e-12)
    # both-fields doc: tie=1 strictly exceeds tie=0 (adds the weaker field)
    assert r1["d0"] > r0["d0"]
    mid = runs(0.5)["d0"]
    assert r0["d0"] < mid < r1["d0"]

"""Adversarial corpus/query edge cases, each checked against the live
reference oracle (SURVEY.md §1.4 fine print)."""

from pathlib import Path

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.oracle import run_reference


def _check(spark, tmp_path, docs, queries, name):
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    mine = search_lines(idx, spark, queries)
    ref = run_reference(docs, queries, tmp_path / name)
    assert mine == ref, f"{name}: {mine[:3]} vs {ref[:3]}"
    return idx


def test_single_doc_everything_elided(spark, tmp_path):
    """N=1: every term has df==N -> idf==0 elision kills every query
    (JASSjr_search.py:70-72); result must be empty, not an error."""
    docs = [("ONLY-1", "alpha beta alpha")]
    idx = _check(spark, tmp_path, docs, ["alpha", "beta", "only-1"], "single")
    assert idx.scalar_stats()["n_docs"] == 1


def test_255_boundary_tokens(spark, tmp_path):
    """254/255/256-char tokens: 255 and 256 collapse to the same term
    (JASSjr_index.py:56); 254 stays distinct."""
    t254, t255, t256 = "a" * 254, "b" * 255, "b" * 256
    docs = [
        ("D-0", f"{t254} filler"),
        ("D-1", f"{t255} filler"),
        ("D-2", f"{t256} filler"),
        ("D-3", "other filler"),
    ]
    idx = _check(
        spark, tmp_path, docs, [t254, t255, t256[:255], "filler"], "clip"
    )
    # t255 and t256 are one term with df=2
    df = {r.term: r.df for r in idx.dictionary.collect()}
    assert df["b" * 255] == 2 and df["a" * 254] == 1


def test_case_and_numeric_docnos(spark, tmp_path):
    """Docno case preserved in output but lowercased as an indexed term;
    purely-numeric docnos searchable; hyphens kept."""
    docs = [
        ("WSJ861203-0077", "market crash news"),
        ("12345", "numeric docno doc"),
        ("MiXeD-Case-9", "mixed case doc"),
    ]
    _check(
        spark, tmp_path, docs,
        ["wsj861203-0077", "mixed-case-9", "12345 numeric", "news"],
        "docnos",
    )


def test_repeated_token_tf(spark, tmp_path):
    """High tf in one doc vs spread across docs (BM25 saturation)."""
    docs = [
        ("R-0", " ".join(["spark"] * 50)),
        ("R-1", "spark " + " ".join(["pad"] * 49)),
        ("R-2", " ".join(["pad"] * 50)),
    ]
    _check(spark, tmp_path, docs, ["spark", "pad spark"], "tf")


def test_query_term_repeated_many_times(spark, tmp_path):
    docs = [("Q-0", "x y z"), ("Q-1", "x x y"), ("Q-2", "w v u")]
    _check(spark, tmp_path, docs, ["x x x x x", "7 y y"], "dupq")


def test_whitespace_only_content(spark, tmp_path):
    """Doc whose content tokenizes to nothing: only the docno term is
    indexed; doc length 1 (the docno token)."""
    docs = [("E-0", "real content here"), ("E-1", "   "), ("E-2", "more real")]
    idx = _check(spark, tmp_path, docs, ["real", "e-1"], "empty")
    lens = {r.docid: r.len for r in idx.doc_lengths.collect()}
    assert lens[1] == 1

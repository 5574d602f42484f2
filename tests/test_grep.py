"""Trigram-indexed substring/regex search: the prefilter must change the
plan, never the answer — grep with the index is asserted identical to the
brute-force scan for common, rare, absent, punctuation, and short-needle
cases; required_literals must only ever claim literals a match truly
needs."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.grep import (
    build_trigram_index,
    grep,
    grep_candidates,
    grep_regex,
    match_count_col,
    needle_grams,
    required_literals,
    trigram_df,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("docid"),
                F.col("text").alias("content"))
        .cache()
    )


@pytest.fixture(scope="module")
def tri(docs):
    return build_trigram_index(docs).cache()


@pytest.fixture(scope="module")
def dfs(tri):
    return {r.gram: r.df for r in trigram_df(tri).collect()}


def _brute(docs, needle):
    return sorted(
        (r.docid, r.n_matches)
        for r in docs.filter(F.instr("content", needle) > 0)
        .withColumn("n_matches", match_count_col("content", needle))
        .collect()
    )


@pytest.mark.parametrize("needle", [
    "merge batch",      # multi-token, selective
    "table",            # hot single token
    "zzznotthere",      # absent
    "a",                # < 3 chars: index unusable, full-scan fallback
    "e b",              # crosses token boundary, has a space
])
def test_grep_index_is_exact(docs, tri, dfs, needle):
    got = sorted(
        (r.docid, r.n_matches)
        for r in grep(docs, needle, index=tri, gram_dfs=dfs).collect()
    )
    assert got == _brute(docs, needle)


def test_candidates_are_a_superset_and_selective(docs, tri, dfs):
    needle = "merge batch"
    true = {r.docid for r in docs.filter(F.instr("content", needle) > 0)
            .collect()}
    cand = {r.docid for r in grep_candidates(tri, needle, gram_dfs=dfs)
            .collect()}
    assert true <= cand
    assert len(cand) < docs.count()  # the prefilter actually prunes


def test_rarest_first_beats_needle_order(tri, dfs):
    """With df-guided selection limited to 2 grams, the candidate set is
    no larger than unguided selection limited to the same budget."""
    needle = "merge batch"
    guided = grep_candidates(tri, needle, max_grams=2, gram_dfs=dfs).count()
    unguided = grep_candidates(tri, needle, max_grams=2).count()
    assert guided <= unguided


def test_needle_grams_dedup_and_order():
    assert needle_grams("aaaa") == ["aaa"]
    assert needle_grams("abcd") == ["abc", "bcd"]
    assert needle_grams("ab") == []


def test_match_count_is_nonoverlapping(spark):
    d = spark.createDataFrame([(1, "aaaa"), (2, "ababab")],
                              "docid long, content string")
    got = {r.docid: r.n_matches for r in grep(d, "aa").collect()}
    assert got == {1: 2}
    got2 = {r.docid: r.n_matches for r in grep(d, "abab").collect()}
    assert got2 == {2: 1}


@pytest.mark.parametrize("pattern,want", [
    ("abcdef", ["abcdef"]),
    ("foo.*barbaz", ["foo", "barbaz"]),
    ("merge +batch", ["merge ", "batch"]),  # ' +' still requires one space
    ("a|bcd", []),                       # alternation: nothing certain
    ("(abc)?defg", []),                  # optional group: bail, stay sound
    ("[abc]defg", ["defg"]),             # class contents not required
    (r"foo\.barx", ["foo", "barx"]),     # escaped atom splits the run
    ("colou?rs", ["colo"]),              # 'u' optional, 'rs' too short
    ("errors?", ["error"]),
    ("abc+d", ["abc"]),                  # + keeps its atom
    ("ab{2,3}cde", ["cde"]),
])
def test_required_literals(pattern, want):
    assert required_literals(pattern) == want


def test_required_literals_are_actually_required():
    """Property: every extracted literal appears in every string the
    pattern fully or partially matches (spot-checked on matches)."""
    import re
    cases = [
        ("merge +batch", "a merge  batch b"),
        ("foo.barx", "xfooybarxz"),
        ("errors?", "two errors here"),
        ("abc+d", "zabcccdz"),
        ("ab{2,3}cde", "xabbcdex"),
    ]
    for pat, s in cases:
        assert re.search(pat, s), (pat, s)
        for lit in required_literals(pat):
            assert lit in s, (pat, lit, s)


@pytest.mark.parametrize("pattern", [
    "merge [a-z]*batch",     # literal-guided
    "table{1,2}",            # degenerates to unpruned full scan
    "(query|line) value",    # alternation: full scan
])
def test_grep_regex_index_is_exact(docs, tri, dfs, pattern):
    got = sorted(
        r.docid for r in grep_regex(docs, pattern, index=tri,
                                    gram_dfs=dfs).collect()
    )
    want = sorted(
        r.docid for r in docs.filter(F.col("content").rlike(pattern))
        .collect()
    )
    assert got == want


def test_short_docs_contribute_no_grams(spark):
    d = spark.createDataFrame([(1, "ab"), (2, ""), (3, "abc")],
                              "docid long, content string")
    rows = build_trigram_index(d).collect()
    assert {(r.docid, r.gram) for r in rows} == {(3, "abc")}


def test_grep_many_matches_per_needle_grep(docs, tri, dfs):
    from jassjr_spark.operators.grep import grep_many

    needles = ["merge batch", "table", "zzznotthere", "ta", "customer query"]
    got = sorted(
        (r.needle, r.docid, r.n_matches)
        for r in grep_many(docs, needles, index=tri, gram_dfs=dfs).collect()
    )
    want = sorted(
        (nd, r.docid, r.n_matches)
        for nd in needles
        for r in grep(docs, nd, index=tri, gram_dfs=dfs).collect()
    )
    assert got == want
    # and without any index (pure batched scan) — same answer
    got2 = sorted(
        (r.needle, r.docid, r.n_matches)
        for r in grep_many(docs, needles).collect()
    )
    assert got2 == want


def test_grep_many_persisted_matches_single_path(spark, docs, tri, tmp_path):
    from jassjr_spark.sources.trigram_store import (
        grep_many_persisted,
        grep_persisted,
        read_trigram_store,
        write_trigram_store,
    )

    path = str(tmp_path / "tri_store_many")
    write_trigram_store(tri, path, n_buckets=8)
    store = read_trigram_store(spark, path)
    needles = ["merge batch", "table", "zzznotthere", "ta"]
    got = sorted(
        (r.needle, r.docid, r.n_matches)
        for r in grep_many_persisted(docs, needles, store).collect()
    )
    want = sorted(
        (nd, r.docid, r.n_matches)
        for nd in needles
        for r in grep_persisted(docs, nd, store).collect()
    )
    assert got == want and got
    # all-short needles: the store is bypassed, answers still exact
    got2 = sorted(
        (r.needle, r.docid, r.n_matches)
        for r in grep_many_persisted(docs, ["ta", "qz"], store).collect()
    )
    want2 = sorted(
        (nd, r.docid, r.n_matches)
        for nd in ["ta", "qz"]
        for r in grep_persisted(docs, nd, store).collect()
    )
    assert got2 == want2


def test_grep_many_dedupes_needles(docs, tri, dfs):
    from jassjr_spark.operators.grep import grep_many

    once = sorted(
        (r.needle, r.docid)
        for r in grep_many(docs, ["table"], index=tri, gram_dfs=dfs).collect()
    )
    twice = sorted(
        (r.needle, r.docid)
        for r in grep_many(docs, ["table", "table"], index=tri,
                           gram_dfs=dfs).collect()
    )
    assert twice == once and once

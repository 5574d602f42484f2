"""Tooling operators (T1-T3), trec_eval metrics, salted aggregation."""

from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, golden_docs, synth_docs
from jassjr_spark.functions.skew import salted_collect_postings
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.tooling import (
    index_stats,
    show_document,
    trec_eval_metrics,
    vocab_diff,
)


def _golden_index(spark):
    docs = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(golden_docs())],
        "docid long, docno string, content string",
    )
    return docs, build_index(docs).cache()


def test_index_stats_golden(spark):
    """Matches the reference-verified stats (SURVEY.md §1.4 item 1)."""
    _, idx = _golden_index(spark)
    r = index_stats(idx).first()
    assert r.n_docs == 11 and r.vocab_size == 22
    assert r.min_len == 2 and r.max_len == 11
    assert abs(r.avgdl - 67 / 11) < 1e-12
    assert r.heaviest_df == 10  # 'ten' appears in docs 1..10


def test_vocab_diff(spark):
    docs, idx = _golden_index(spark)
    idx2 = build_index(docs.filter(F.col("docid") < 5)).cache()
    diff = {r.term: r.status for r in vocab_diff(idx.dictionary, idx2.dictionary).collect()}
    assert diff["one"] == "only_a"          # only in docs >= 5... doc 10
    assert diff["ten"] == "df_mismatch"     # df 10 vs 4
    assert "zero" not in diff               # doc 0 in both, df 1 == 1
    # identical dictionaries -> empty diff (the tool's exit-0 condition)
    assert vocab_diff(idx.dictionary, idx.dictionary).count() == 0


def test_show_document(spark):
    docs, _ = _golden_index(spark)
    got = show_document(docs, "7").collect()
    assert len(got) == 1 and got[0].content.startswith("ten nine")


def test_trec_eval_metrics(spark):
    run = spark.createDataFrame(
        [("1", "a", 1, 1.0), ("1", "b", 2, 0.9), ("1", "c", 3, 0.8)],
        "query_id string, docno string, rank long, rsv double",
    )
    qrels = spark.createDataFrame(
        [("1", "a", 1), ("1", "c", 1), ("1", "zz", 1)],
        "query_id string, docno string, rel int",
    )
    rows = {r.query_id: r for r in trec_eval_metrics(run, qrels).collect()}
    m = rows["1"]
    # AP = (1/1 + 2/3) / 3 relevant = 0.5556
    assert m.num_ret == 3 and m.num_rel == 3 and m.num_rel_ret == 2
    assert m.map == round((1.0 + 2 / 3) / 3, 4)
    assert m.p_at_5 == round(2 / 5, 4)
    assert m.p_at_1000 == round(2 / 1000, 4)
    assert m.recip_rank == 1.0            # first relevant at rank 1
    assert m.rprec == round(2 / 3, 4)     # 2 relevant in top-R (R=3)
    assert m.recall == round(2 / 3, 4)
    # 'all' summary: trec_eval aggregate semantics (sums + means)
    a = rows["all"]
    assert a.num_q == 1 and a.num_ret == 3 and a.num_rel == 3
    assert a.map == m.map and a.p_at_10 == m.p_at_10


def test_salted_collect_matches_plain(spark):
    raw = synth_docs(300)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    salted = salted_collect_postings(idx.postings.select("term", "docid", "tf"), 8)
    plain = idx.postings.groupBy("term").agg(
        F.array_sort(F.collect_list(F.struct("docid", "tf"))).alias("postings"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    a = {r.term: (r.df, [(p.docid, p.tf) for p in r.postings]) for r in salted.collect()}
    b = {r.term: (r.df, [(p.docid, p.tf) for p in r.postings]) for r in plain.collect()}
    assert a == b


def test_trec_eval_summary_averages_unrounded(spark):
    """trec_eval's 'all' row averages UNROUNDED per-query values and
    rounds only the final aggregate (ADVICE r2): with first-relevant
    ranks 3 and 7, MRR_all must be round((1/3 + 1/7)/2, 4), computed from
    the raw reciprocal ranks, not from the 4dp-rounded display values."""
    run = spark.createDataFrame(
        [("1", "a", 1, 1.0), ("1", "b", 2, 0.9), ("1", "c", 3, 0.8),
         ("2", "x", 1, 1.0), ("2", "y", 2, 0.9), ("2", "z", 3, 0.8),
         ("2", "w", 4, 0.7), ("2", "v", 5, 0.6), ("2", "u", 6, 0.5),
         ("2", "t", 7, 0.4)],
        "query_id string, docno string, rank long, rsv double",
    )
    qrels = spark.createDataFrame(
        [("1", "c", 1), ("2", "t", 1)],
        "query_id string, docno string, rel int",
    )
    rows = {r.query_id: r for r in trec_eval_metrics(run, qrels).collect()}
    assert rows["1"].recip_rank == round(1 / 3, 4)
    assert rows["2"].recip_rank == round(1 / 7, 4)
    assert rows["all"].recip_rank == round((1 / 3 + 1 / 7) / 2, 4)
    assert rows["all"].map == round((1 / 3 + 1 / 7) / 2, 4)


def test_suggest_terms(spark):
    """Did-you-mean: distance-banded candidates, deterministic
    (dist asc, cf desc, term asc) ranking, k cut."""
    from jassjr_spark.operators.tooling import suggest_terms

    docs = spark.createDataFrame(
        [(0, "D0", "table table table tablet cable fable stable stub"),
         (1, "D1", "tablet cable cable unrelatedword"),
         (2, "D2", "fable stable table")],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    rows = suggest_terms(idx, "tabel", max_dist=2, k=5).collect()
    got = [(r.term, r.dist, r.rank) for r in rows]
    # within dist 2: table (2, cf 4) and tablet (2, cf 2); cable/fable/
    # stable are dist 3 ('able' vs 'abel' already costs 2). Equal dist
    # => cf desc decides.
    assert got == [("table", 2, 1), ("tablet", 2, 2)]
    # widen the radius: dist-3 terms appear AFTER every dist-2 term,
    # cf desc then term asc inside the tie (cable cf 3 > fable == stable
    # cf 2, then alphabetical)
    wide = [r.term for r in suggest_terms(idx, "tabel", max_dist=3,
                                          k=10).collect()]
    assert wide == ["table", "tablet", "cable", "fable", "stable"]
    # band filter: nothing beyond +-2 length can appear even at k=100
    far = suggest_terms(idx, "tabel", max_dist=2, k=100).collect()
    assert all(abs(len(r.term) - 5) <= 2 for r in far)
    # k cut
    assert len(suggest_terms(idx, "tabel", max_dist=3, k=2).collect()) == 2


def test_term_vector(spark):
    from jassjr_spark.operators.tooling import term_vector

    docs = spark.createDataFrame(
        [
            (0, "d0", "apple banana apple orange"),
            (1, "d1", "apple cherry"),
            (2, "d2", "banana"),
        ],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    got = {(r.term, r.tf, r.df)
           for r in term_vector(idx, docs, "d0").collect()}
    assert got == {("apple", 2, 2), ("banana", 1, 2), ("orange", 1, 1)}
    # missing docno -> empty; prepend_docno indexes count the DOCNO token
    assert term_vector(idx, docs, "nope").collect() == []
    idx2 = build_index(docs).cache()  # prepend_docno=True (TREC semantics)
    got2 = {(r.term, r.tf)
            for r in term_vector(idx2, docs, "d1", prepend_docno=True)
            .collect()}
    assert got2 == {("d1", 1), ("apple", 1), ("cherry", 1)}


def test_explain_score_sums_to_rsv(spark):
    from jassjr_spark.operators.search import search
    from jassjr_spark.operators.tooling import explain_score

    docs = spark.createDataFrame(
        [
            (0, "d0", "apple banana apple orange"),
            (1, "d1", "apple cherry"),
            (2, "d2", "banana melon"),
        ],
        "docid long, docno string, content string",
    )
    idx = build_index(docs, prepend_docno=False).cache()
    rows = explain_score(idx, ["apple", "banana", "zzz"], "d0").collect()
    by_term = {r.term: r for r in rows}
    assert set(by_term) == {"apple", "banana"}   # OOV 'zzz' absent
    assert by_term["apple"].tf == 2 and by_term["apple"].df == 2
    assert by_term["apple"].dl == 4
    q = spark.createDataFrame(
        [(0, 0, "apple"), (0, 1, "banana"), (0, 2, "zzz")],
        "query_id long, pos int, term string",
    )
    rsv = {r.docno: r.rsv for r in search(idx, q).collect()}["d0"]
    assert abs(sum(r.contrib for r in rows) - rsv) < 5e-6
    # df==N terms are elided from the explanation like the scorer
    docs_all = spark.createDataFrame(
        [(0, "d0", "common apple"), (1, "d1", "common pear")],
        "docid long, docno string, content string",
    )
    idx_all = build_index(docs_all, prepend_docno=False).cache()
    terms = {r.term for r in explain_score(idx_all, ["common", "apple"],
                                           "d0").collect()}
    assert terms == {"apple"}
    assert explain_score(idx, ["apple"], "missing").collect() == []

"""Unigram-LM quality signals (operators/textstats.py:lm_scores)."""

import math

from jassjr_spark.operators.textstats import lm_scores


def test_lm_scores_hand_computed(spark):
    # corpus: a a b | a c   ->  cf: a=3, b=1, c=1, C=5
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "docid long, content string"
    )
    out = {r.docid: r for r in lm_scores(docs).collect()}
    c = 5.0
    # doc 0: dl=3, occurrences a,a,b
    xent0 = -(2 * math.log(3 / c) + 1 * math.log(1 / c)) / 3
    kl0 = (2 / 3) * math.log((2 / 3) / (3 / c)) + (1 / 3) * math.log(
        (1 / 3) / (1 / c)
    )
    assert out[0].dl == 3
    assert abs(out[0].xent - xent0) < 1e-6
    assert abs(out[0].ppl - math.exp(xent0)) < 1e-5
    assert abs(out[0].kl - kl0) < 1e-6
    assert out[1].dl == 2


def test_lm_scores_uniform_doc_has_zero_kl(spark):
    # one doc = the whole corpus -> p_doc == p_corpus -> KL exactly 0
    docs = spark.createDataFrame(
        [(7, "x y x z")], "docid long, content string"
    )
    row = lm_scores(docs).collect()[0]
    assert row.kl == 0.0
    # and xent == corpus entropy: -(2/4)ln(2/4)*... computed over occurrences
    ent = -(2 * math.log(0.5) + math.log(0.25) + math.log(0.25)) / 4
    assert abs(row.xent - ent) < 1e-6


def test_lm_scores_empty_doc_emits_nothing(spark):
    docs = spark.createDataFrame(
        [(0, "real words"), (1, "   §¶   ")],
        "docid long, content string",
    )
    assert [r.docid for r in lm_scores(docs).collect()] == [0]


def test_lm_scores_gibberish_scores_higher(spark):
    # rare-term docs must have higher corpus-model perplexity than docs
    # made of the corpus's common terms
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "zqx jvk wpf qzz"))
    docs = spark.createDataFrame(rows, "docid long, content string")
    out = {r.docid: r.ppl for r in lm_scores(docs).collect()}
    assert out[100] > out[0]

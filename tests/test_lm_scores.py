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


def test_bigram_lm_hand_computed(spark):
    from jassjr_spark.operators.textstats import bigram_lm_scores

    # corpus: "a b a b" and "a b c"
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "docid long, content string"
    )
    out = {r.docid: r for r in bigram_lm_scores(docs, lam=0.5).collect()}
    # unigrams: a=3, b=3, c=1, C=7
    # bigrams: (a,b)=3, (b,a)=1, (b,c)=1 ; left counts: a·=3, b·=2
    p_ab = 3 / 3
    p_ba = 1 / 2
    p_bc = 1 / 2
    pu = {"a": 3 / 7, "b": 3 / 7, "c": 1 / 7}
    lam = 0.5
    s0 = (
        math.log(pu["a"])
        + math.log(lam * p_ab + (1 - lam) * pu["b"])
        + math.log(lam * p_ba + (1 - lam) * pu["a"])
        + math.log(lam * p_ab + (1 - lam) * pu["b"])
    )
    assert out[0].dl == 4
    assert abs(out[0].xent2 - (-s0 / 4)) < 1e-6
    s1 = (
        math.log(pu["a"])
        + math.log(lam * p_ab + (1 - lam) * pu["b"])
        + math.log(lam * p_bc + (1 - lam) * pu["c"])
    )
    assert out[1].dl == 3
    assert abs(out[1].ppl2 - math.exp(-s1 / 3)) < 1e-5


def test_bigram_lm_single_token_doc(spark):
    from jassjr_spark.operators.textstats import bigram_lm_scores

    docs = spark.createDataFrame(
        [(0, "hello"), (1, "hello world")], "docid long, content string"
    )
    out = {r.docid: r for r in bigram_lm_scores(docs).collect()}
    assert out[0].dl == 1
    # P_uni(hello) = 2/3 -> xent = -ln(2/3)
    assert abs(out[0].xent2 - (-math.log(2 / 3))) < 1e-6


def test_bigram_lm_shuffled_text_scores_worse(spark):
    from jassjr_spark.operators.textstats import bigram_lm_scores

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent) for i in range(8)]
    rows.append((100, "mat the on dog sat rug the cat the and on sat"))
    docs = spark.createDataFrame(rows, "docid long, content string")
    out = {r.docid: r.ppl2 for r in bigram_lm_scores(docs).collect()}
    assert out[100] > out[0]

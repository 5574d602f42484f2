"""Distributed BPE training + encoding (functions/bpe.py) vs an
independent in-test reference implementation of the public algorithm."""

import collections
import re

from jassjr_spark.functions.bpe import (
    bpe_encode,
    train_bpe,
    word_frequencies,
)
from jassjr_spark.constants import TOKEN_RE


def _ref_train(word_counts, n_merges, min_freq=2):
    """Sennrich-style reference trainer: dict-of-tuples vocab, full pair
    recount per iteration, greedy left-to-right merge application. Written
    independently of the Spark operator (different data layout) so a
    shared bug can't hide."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, n in vocab.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] += n
        if not counts:
            break
        # deterministic tie-break: count desc, then (left, right) asc
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), cnt = best
        if cnt < min_freq:
            break
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new new new"),
    (2, "wide wider widest wide"),
    (3, "low new wide lowest newest"),
    (4, "the lower the newer the wider"),
]


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "docid long, content string")
    wc = collections.Counter()
    for _, text in CORPUS:
        wc.update(re.findall(TOKEN_RE, text.lower()))
    expected = _ref_train(dict(wc), n_merges=12, min_freq=2)
    got = train_bpe(word_frequencies(docs), n_merges=12, min_freq=2)
    assert got == expected
    assert len(got) > 4  # the corpus genuinely supports several merges


def test_train_bpe_deterministic_and_tie_broken(spark):
    # 'ab' and 'cd' pairs appear with the same count -> (left,right) asc
    # picks ('a','b') first
    docs = spark.createDataFrame(
        [(0, "ab ab cd cd")], "docid long, content string"
    )
    m1 = train_bpe(word_frequencies(docs), n_merges=2)
    m2 = train_bpe(word_frequencies(docs), n_merges=2)
    assert m1 == m2
    assert m1[0][:2] == ("a", "b")
    assert m1[1][:2] == ("c", "d")


def test_train_bpe_single_char_words_ok(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b xy xy")], "docid long, content string"
    )
    merges = train_bpe(word_frequencies(docs), n_merges=3)
    assert ("x", "y", 2) in merges


def test_bpe_encode_roundtrip_and_counts(spark):
    docs = spark.createDataFrame(CORPUS, "docid long, content string")
    merges = train_bpe(word_frequencies(docs), n_merges=10)
    enc = {r.docid: r for r in bpe_encode(docs, merges).collect()}
    tok_re = re.compile(TOKEN_RE)
    for docid, text in CORPUS:
        words = tok_re.findall(text.lower())
        row = enc[docid]
        assert row.n_words == len(words)
        assert row.n_bpe_tokens == len(row.tokens)
        # lossless: concatenating subwords reproduces the word stream
        assert "".join(row.tokens) == "".join(words)
        # compression: merges actually shorten the stream
        assert row.n_bpe_tokens < sum(len(w) for w in words)


def test_bpe_encode_empty_merges_is_chars(spark):
    docs = spark.createDataFrame([(0, "hi yo")], "docid long, content string")
    row = bpe_encode(docs, []).collect()[0]
    assert row.tokens == ["h", "i", "y", "o"]

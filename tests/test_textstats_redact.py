"""PII-style redaction (operators/textstats.py:redact)."""

from jassjr_spark.operators.textstats import redact


def test_redact_counts_and_masks(spark):
    docs = spark.createDataFrame(
        [
            (0, "call 555 1234 or mail bob.smith+x@example.co.uk now"),
            (1, "no pii here"),
            (2, "v2 has 3 numbers 42"),
        ],
        "docid long, content string",
    )
    out = {r.docid: r for r in redact(docs).collect()}
    r0 = out[0]
    assert r0.n_email == 1
    # digits inside the (already masked) email are NOT double counted
    assert r0.n_number == 2
    assert "example" not in r0.clean and "555" not in r0.clean
    assert r0.clean == "call # # or mail # now"
    assert out[1].n_email == 0 and out[1].n_number == 0
    assert out[1].clean == "no pii here"
    assert out[2].n_number == 3  # '2' in v2, '3', '42'


def test_redact_sha_tracks_clean_text(spark):
    docs = spark.createDataFrame(
        [(0, "a 1 b"), (1, "a 2 b")], "docid long, content string"
    )
    rows = redact(docs).collect()
    # different digits scrub to the same clean text -> same sha
    assert rows[0].clean_sha == rows[1].clean_sha

"""Property-based oracle identity: hypothesis generates adversarial
corpora (empty docs, repeated tokens, hyphenated/numeric/case-mixed
words, duplicate contents) and random queries; the engine must match
the LIVE reference byte-for-byte on every one.

Derandomized (fixed seed) + bounded examples so the suite stays a
deterministic, non-flaky gate; each example costs one reference
subprocess pair + one Spark search.
"""

import itertools
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.oracle import run_reference

_WORD = st.text(
    alphabet="abcdeXY019-", min_size=1, max_size=6
).filter(lambda w: any(c.isalnum() for c in w))
_CONTENT = st.lists(_WORD, min_size=0, max_size=25).map(" ".join)
_CASE = itertools.count()


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    contents=st.lists(_CONTENT, min_size=2, max_size=10),
    dup=st.booleans(),
    data=st.data(),
)
def test_engine_matches_reference_on_random_corpora(
    spark, tmp_path_factory, contents, dup, data
):
    if dup:  # force at least one exact duplicate pair
        contents = contents + [contents[0]]
    rows = [(f"{9000 + i}", c) for i, c in enumerate(contents)]

    # queries: mostly corpus words (hits), plus one guaranteed miss;
    # reference crashes on EMPTY lines (documented divergence), so every
    # line has at least one term
    pool = sorted({w for c in contents for w in c.split()} | {"zzznohit"})
    n_q = data.draw(st.integers(min_value=1, max_value=3))
    lines = []
    for qi in range(n_q):
        terms = data.draw(
            st.lists(st.sampled_from(pool), min_size=1, max_size=4)
        )
        lines.append(f"{50 + qi} " + " ".join(terms))

    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    mine = search_lines(build_index(sdf).cache(), spark, lines)
    case_dir = Path(tmp_path_factory.mktemp(f"prop{next(_CASE)}"))
    ref = run_reference(rows, lines, case_dir)
    assert mine == ref


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    needles=st.lists(
        st.text(alphabet="abc -", min_size=1, max_size=6),
        min_size=1, max_size=5, unique=True,
    )
)
def test_grep_many_matches_pure_python(spark, needles):
    """grep_many vs an INDEPENDENT oracle (str.count): the trigram path,
    the short-needle full-scan path, and the n_matches arithmetic must
    agree with plain Python on arbitrary needles (spaces, hyphens,
    repeats) over a fixed corpus."""
    from jassjr_spark.operators.grep import build_trigram_index, grep_many

    contents = [
        "abc cab bac abc-abc",
        "a b c ab bc abc",
        "-- -a- b--b",
        "ccc cc c",
        "",
    ]
    docs = spark.createDataFrame(
        list(enumerate(contents)), "docid long, content string"
    )
    tri = build_trigram_index(docs).cache()
    got = sorted(
        (r.needle, r.docid, r.n_matches)
        for r in grep_many(docs, needles, index=tri).collect()
    )
    want = sorted(
        (nd, i, c.count(nd))
        for nd in needles
        for i, c in enumerate(contents)
        if nd in c
    )
    assert got == want

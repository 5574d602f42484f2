"""Rank/score identity vs the executable reference oracle on synthetic
source-code corpora (SURVEY.md §5 strategy b; BASELINE.md correctness gate).

The engine input is the documents table (repo, path, commit, lang, content);
docid = row_number over (repo, path, commit); the SAME rows rendered to TREC
XML in the SAME order feed /root/reference/JASSjr_index.py + JASSjr_search.py.
Top-k docnos AND 4-decimal scores must match rank-by-rank.
"""

from pathlib import Path

import pytest

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries, tiebreak_docs
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.oracle import run_reference


def _rows(n_docs):
    raw = synth_docs(n_docs)
    return [(docno_of(r, p, c), content) for r, p, c, _, content in raw]


@pytest.mark.parametrize("n_docs,n_queries", [(200, 25), (1000, 50)])
def test_oracle_rank_score_identity(spark, tmp_path: Path, n_docs, n_queries):
    docs = _rows(n_docs)
    queries = synth_queries(n_queries)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    mine = search_lines(idx, spark, queries)
    ref = run_reference(docs, queries, tmp_path / f"oracle{n_docs}")
    assert mine == ref


def test_tiebreak_docid_desc(spark, tmp_path: Path):
    """Equal scores order by docid DESCENDING (SURVEY.md §1.4 item 6)."""
    docs = tiebreak_docs()
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    mine = search_lines(idx, spark, ["beta"])
    ref = run_reference(docs, ["beta"], tmp_path / "tie")
    assert mine == ref
    # docids 0..7 tie exactly; docno DUP-7 (docid 7) must outrank DUP-0
    docnos = [ln.split()[2] for ln in mine]
    assert docnos[:8] == [f"DUP-{i}" for i in range(7, -1, -1)]


def test_index_equivalence(spark, tmp_path: Path):
    """Spirit of tools/verify_indexer.sh:28-64 + vocab_diff.py: same doc
    order, lengths, docno sequence, term set, per-term df and total tf."""
    import struct
    import subprocess
    import sys

    from jassjr_spark.oracle import REFERENCE_DIR
    from jassjr_spark.sources.trec import render_trec

    docs = _rows(300)
    wd = tmp_path / "idx_eq"
    wd.mkdir()
    (wd / "corpus.xml").write_text(render_trec(docs))
    subprocess.run(
        [sys.executable, str(REFERENCE_DIR / "JASSjr_index.py"), "corpus.xml"],
        cwd=wd, check=True, capture_output=True,
    )
    # reference artifacts
    ref_docnos = (wd / "docids.bin").read_text().splitlines()
    raw = (wd / "lengths.bin").read_bytes()
    ref_lengths = list(struct.unpack(f"{len(raw)//4}i", raw))
    ref_vocab = {}  # term -> n_postings (df)
    buf = (wd / "vocab.bin").read_bytes()
    off = 0
    while off < len(buf):
        ln = buf[off]; off += 1
        term = buf[off:off + ln].decode(); off += ln + 1
        _, size = struct.unpack_from("ii", buf, off); off += 8
        ref_vocab[term] = size // 8

    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    assert [r.docno for r in idx.docids.orderBy("docid").collect()] == ref_docnos
    assert [r.len for r in idx.doc_lengths.orderBy("docid").collect()] == ref_lengths
    mine_vocab = {r.term: r.df for r in idx.dictionary.collect()}
    assert mine_vocab == ref_vocab
    # postings docid-ascending invariant (SURVEY.md §4 P1): in the exploded
    # layout sortedness is a property of the canonical read path
    from pyspark.sql import functions as F

    one = idx.postings.filter(F.col("term") == "the").orderBy("docid").collect()
    assert len(one) > 0
    assert [r.docid for r in one] == sorted({r.docid for r in one})
    assert all(r.tf >= 1 for r in one)


def test_tokenizer_modes_identical(spark):
    """JVM and Arrow tokenizer paths must emit identical postings rows."""
    from jassjr_spark.functions.tokenize import doc_term_frequencies

    docs = _rows(150)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    a = {tuple(r) for r in doc_term_frequencies(sdf, mode="jvm").collect()}
    b = {tuple(r) for r in doc_term_frequencies(sdf, mode="arrow").collect()}
    assert a == b


def test_unicode_lowercase_order(spark):
    """Lex raw THEN lowercase per token (JASSjr_index.py:23,53): a Unicode
    char whose lowercase maps into ASCII (KELVIN SIGN U+212A -> 'k') must
    BREAK the token run, not fuse it ('5Kend' -> ['5','end'], never
    ['5k','end']). Both tokenizer modes, identical to the Python-reference
    regex-on-raw behavior."""
    from jassjr_spark.functions.tokenize import doc_term_frequencies

    sdf = spark.createDataFrame(
        [(0, "D1", "5Kend MiXeD Kelvin")],
        "docid long, docno string, content string",
    )
    import re

    from jassjr_spark.constants import TOKEN_RE

    want = sorted(
        ["d1"] + [t.lower() for t in re.findall(TOKEN_RE, "5Kend MiXeD Kelvin")]
    )
    for mode in ("jvm", "arrow"):
        got = sorted(
            r.term
            for r in doc_term_frequencies(sdf, mode=mode).collect()
            for _ in range(r.tf)
        )
        assert got == want, (mode, got)
        assert "5k" not in got and "5" in got and "end" in got


def test_interactive_searcher_identical_and_one_action(spark):
    """InteractiveSearcher must emit byte-identical run lines to the batch
    path, with at most 2 Spark jobs per query line (the <=2-job latency
    contract; TakeOrderedAndProject + at most one broadcast-side job)."""
    from jassjr_spark.operators.search import InteractiveSearcher, search_lines

    docs = _rows(250)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    idx.postings.count()
    it = InteractiveSearcher(idx)
    lines = synth_queries(8) + ["ten nine", "42", ""]
    for ln in lines:
        want = search_lines(idx, spark, [ln]) if ln.strip() else []
        got = it.search_line(ln)
        assert got == want, ln

    # job count per interactive call
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sc.setJobGroup("interactive_probe", "latency contract")
    it.search_line(lines[0])
    jobs = tracker.getJobIdsForGroup("interactive_probe") or []
    sc.setJobGroup(None, None)
    assert len(jobs) <= 2, jobs


def test_local_dictionary_search_identical(spark):
    """The driver-side dictionary snapshot path must not change results."""
    from jassjr_spark.operators.search import (
        local_dictionary, parse_queries, search, to_trec_lines,
    )

    docs = _rows(250)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    ld = local_dictionary(idx)
    assert ld is not None and len(ld) > 0
    q = parse_queries(spark, synth_queries(8))
    a = to_trec_lines(search(idx, q))
    b = to_trec_lines(search(idx, q, local_dict=ld))
    assert a == b


def test_interactive_searcher_confs_do_not_leak(spark):
    """The searcher owns an isolated session: its latency confs (AQE off,
    shuffle=8) must never appear in — or flicker through — the base
    session, so a concurrent batch plan keeps its confs (VERDICT r2
    'What's wrong #3')."""
    from jassjr_spark.operators.search import InteractiveSearcher

    docs = _rows(120)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    base_sp = spark.conf.get("spark.sql.shuffle.partitions")
    it = InteractiveSearcher(idx)
    assert it.spark is not spark
    assert it.spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert it.spark.conf.get("spark.sql.shuffle.partitions") == "8"
    out = it.search_line(synth_queries(1)[0])
    assert out  # produced results through the isolated session
    # base session untouched (nothing ever mutates it now)
    assert spark.conf.get("spark.sql.adaptive.enabled") == base_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == base_sp
    # a plan compiled in the base session still plans adaptively, while
    # the same query through the searcher's session does not
    base_plan = sdf.groupBy("docno").count()._jdf.queryExecution()         .executedPlan().toString()
    assert "AdaptiveSparkPlan" in base_plan
    iso_df = it.spark.table(f"global_temp.{it._views[0]}")
    iso_plan = iso_df.groupBy("term").count()._jdf.queryExecution()         .executedPlan().toString()
    assert "AdaptiveSparkPlan" not in iso_plan
    it.close()


def test_interactive_local_fast_path_zero_jobs_and_identical(spark):
    """The driver-local scoring fast path (VERDICT r4 Next #5): once a
    query's posting lists are cached driver-side, a repeat query runs
    ZERO Spark jobs and still emits byte-identical lines; a zero budget
    forces the Spark path with identical output."""
    from jassjr_spark.operators.search import InteractiveSearcher, search_lines

    docs = _rows(250)
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    idx.postings.count()

    it = InteractiveSearcher(idx)
    lines = synth_queries(6) + ["ten nine", "7 the x"]
    for ln in lines:
        want = search_lines(idx, spark, [ln])
        got = it.search_line(ln)
        assert got == want, ln
        assert it.last_path == "local"

    # repeat query: all lists cached -> no Spark job at all
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("local_fast_path_probe", "zero-job contract")
    got = it.search_line(lines[0])
    jobs = tracker.getJobIdsForGroup("local_fast_path_probe") or []
    sc.setJobGroup(None, None)
    assert got == search_lines(idx, spark, [lines[0]])
    assert it.last_path == "local" and len(jobs) == 0, jobs

    # budget too small for any list -> automatic Spark fallback, same bytes
    it2 = InteractiveSearcher(idx, local_postings_budget=0)
    for ln in lines[:3]:
        assert it2.search_line(ln) == search_lines(idx, spark, [ln])
        assert it2.last_path == "spark"

    # thrash regime: a budget that fits roughly ONE query's lists forces
    # eviction between queries — the current query's own terms must never
    # be evicted mid-fetch (LRU KeyError regression from the 600k bench)
    it3 = InteractiveSearcher(idx, local_postings_budget=700)
    for _ in range(2):
        for ln in lines:
            assert it3.search_line(ln) == search_lines(idx, spark, [ln]), ln

    # warm-ahead (the default): construction prefetches the heaviest
    # lists, so a FIRST-sighting query is already zero-job local and
    # byte-identical to the batch path
    it4 = InteractiveSearcher(idx)
    assert it4.warmed_terms > 0
    sc.setJobGroup("warm_first_sighting_probe", "zero-job on first query")
    got = it4.search_line(lines[1])
    jobs = tracker.getJobIdsForGroup("warm_first_sighting_probe") or []
    sc.setJobGroup(None, None)
    assert got == search_lines(idx, spark, [lines[1]])
    assert it4.last_path == "local" and len(jobs) == 0, jobs
    # warm-ahead disabled or unaffordable degrades gracefully
    it5 = InteractiveSearcher(idx, warm_ahead=False)
    it6 = InteractiveSearcher(idx, local_postings_budget=0)
    assert it5.warmed_terms == 0 and it6.warmed_terms == 0
    for s in (it, it2, it3, it4, it5, it6):
        s.close()


def test_interactive_warm_all_resident_index(spark):
    """Resident-index warm regime: when the WHOLE postings table fits the
    budget, construction loads every term (full scan, no IN-list), so a
    first-sighting query for a RARE term — one the greedy top-df prefetch
    would skip — is zero-job local and byte-identical. Under-budget
    stores degrade to the greedy fill (warmed_terms capped), and rare
    terms then cost one fetch job — the regime the 600k zipf bench
    measured at ~300 ms/query."""
    from jassjr_spark.operators.search import InteractiveSearcher, search_lines

    docs = _rows(300)
    # plant a unique rare term: df=1, so descending-df greedy fill ranks
    # it LAST among ~hundreds of terms
    docs[137] = (docs[137][0], docs[137][1] + " zzyzxrare")
    sdf = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(docs)],
        "docid long, docno string, content string",
    )
    idx = build_index(sdf).cache()
    idx.postings.count()
    n_vocab = idx.dictionary.count()

    it = InteractiveSearcher(idx)  # default budget >> this index
    assert it.warmed_terms == n_vocab
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("warm_all_rare_probe", "zero-job on rare first query")
    got = it.search_line("zzyzxrare ten")
    jobs = tracker.getJobIdsForGroup("warm_all_rare_probe") or []
    sc.setJobGroup(None, None)
    assert got == search_lines(idx, spark, ["zzyzxrare ten"])
    assert it.last_path == "local" and len(jobs) == 0, jobs

    # budget below the full index -> greedy fill, still correct
    total = sum(r.df for r in idx.dictionary.select("df").collect())
    it2 = InteractiveSearcher(idx, local_postings_budget=max(1, total // 2),
                              warm_ahead_max_terms=16)
    assert 0 < it2.warmed_terms <= 16
    assert it2.search_line("zzyzxrare ten") == got
    it.close()
    it2.close()


def test_tokenizer_modes_identical_on_degenerate_rows(spark):
    """NULL content, NULL docno, EMPTY docno and an over-255-char docno:
    the jvm and arrow kernels must still emit identical rows, a NULL
    content doc must still exist (its docno posting survives), '' must
    never appear as a term (the lexer cannot emit it, and the reference
    indexes no primary-key token for a docno-less doc), and the docno
    term must be 255-truncated like every other token."""
    from jassjr_spark.constants import MAX_TOKEN_LEN
    from jassjr_spark.functions.tokenize import doc_term_frequencies

    long_docno = "Z" * 300
    sdf = spark.createDataFrame(
        [
            (0, "D0", None),            # NULL content
            (1, None, "alpha beta"),    # NULL docno -> 'none'
            (2, "", "gamma delta"),     # EMPTY docno -> nothing prepended
            (3, long_docno, "epsilon"),  # docno truncates at 255
            (4, "D4", "zeta zeta"),
        ],
        "docid long, docno string, content string",
    )
    outs = {}
    for mode in ("jvm", "arrow"):
        rows = {tuple(r) for r in
                doc_term_frequencies(sdf, mode=mode).collect()}
        outs[mode] = rows
        terms = {t for t, _, _, _ in rows}
        assert "" not in terms, mode
        assert ("d0", 0, 1, 1) in rows, mode       # null content: docno only
        assert ("none", 1, 1, 3) in rows, mode     # null docno stringified
        assert {t for t, d, _, _ in rows if d == 2} == {"gamma", "delta"}
        assert ("z" * MAX_TOKEN_LEN, 3, 1, 2) in rows, mode
    assert outs["jvm"] == outs["arrow"]

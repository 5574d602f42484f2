"""End-to-end CLI tests: the actual spark-submit surface (search_job.py)
run as a subprocess over a persisted index, batch AND --interactive,
against the reference's real query-file shape (51-100.titles.txt: 50
TREC title lines with leading integer ids, JASSjr_search.py:55-62).
Both modes must be byte-identical to the library path (search_lines)."""

import os
import subprocess
import sys

import pytest

from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.sources.index_store import read_index, write_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QFILE = "/root/reference/51-100.titles.txt"


@pytest.fixture(scope="module")
def titles_index(spark, tmp_path_factory):
    """A persisted index whose vocabulary covers the title queries: one
    doc per title plus mixers, so most queries produce results."""
    lines = [ln for ln in open(QFILE).read().splitlines() if ln.strip()]
    rows = []
    for i, ln in enumerate(lines):
        words = ln.split()[1:]  # strip the TREC id
        # vary tf/dl so scores are non-trivial and ranks are meaningful
        rows.append((f"DOC-{i:03d}", " ".join(words * ((i % 3) + 1))))
        rows.append((f"MIX-{i:03d}", " ".join(words[:1] + ["filler"] * (i % 5))))
    sdf = spark.createDataFrame(rows, "docno string, content string")
    idx = build_index(sdf, order_cols=["docno"]).cache()
    path = str(tmp_path_factory.mktemp("cli_idx") / "index")
    write_index(idx, path, n_buckets=8)
    return path, lines


def _run_cli(args, stdin_text=None):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "search_job.py"),
         *args],
        capture_output=True, text=True, cwd=REPO, input=stdin_text,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [ln for ln in out.stdout.splitlines() if ln.strip()]


def test_cli_batch_matches_library(spark, titles_index):
    path, lines = titles_index
    idx = read_index(spark, path).cache()
    want = search_lines(idx, spark, lines, k=20)
    got = _run_cli(["--index", path, "--queries", QFILE, "--k", "20"])
    assert got == want and len(got) > 100


def test_cli_interactive_matches_library(spark, titles_index):
    path, lines = titles_index
    idx = read_index(spark, path).cache()
    want = search_lines(idx, spark, lines, k=20)
    got = _run_cli(["--index", path, "--queries", QFILE, "--k", "20",
                    "--interactive"])
    assert got == want and len(got) > 100


def test_indexer_cli_end_to_end(tmp_path):
    """index_job.py driven as a subprocess over the reference's own corpus
    (VERDICT r4 Next #4): the progress lines match the reference indexer's
    format byte-for-byte (JASSjr_index.py:40-41,79 — the contract
    tools/verify_indexer.sh scrapes), and the persisted index answers the
    golden queries (tests/10_search.bats) byte-exactly through
    search_job.py."""
    from jassjr_spark.fixtures import GOLDEN_EXPECTED, NUMBER_WORDS

    out_idx = str(tmp_path / "ref_index")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "index_job.py"),
         "--input", "/root/reference/test_documents.xml",
         "--output", out_idx, "--buckets", "8"],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    # reference format: "<docid> documents indexed" every 1000 docs (the
    # 11-doc corpus prints exactly one), then the serialising line
    assert lines[0] == "0 documents indexed"
    assert "Indexed 11 documents. Serialising..." in lines

    qfile = tmp_path / "golden_queries.txt"
    qfile.write_text("".join(w + "\n" for w in ["zero"] + NUMBER_WORDS))
    got = _run_cli(["--index", out_idx, "--queries", str(qfile)])
    # all five golden blocks appear byte-exactly and contiguously
    for q, want in GOLDEN_EXPECTED.items():
        n = len(want)
        found = [got[i:i + n] == want for i in range(len(got) - n + 1)]
        assert any(found), f"golden block for {q!r} missing"


def test_cli_syntax_mode(spark, titles_index, tmp_path):
    """--syntax: operator lines through the query language, qid = line
    number, batch == per-line library dispatch."""
    from jassjr_spark.operators.query_language import run_user_query

    path, _ = titles_index
    idx = read_index(spark, path).cache()
    lines = ["south african", "+south african", "african -south",
             "sout~ african", "sou* african", "south^2 african"]
    want = []
    for qid, ln in enumerate(lines):
        rows = run_user_query(idx, ln, k=5, query_id=qid).collect()
        for r in sorted(rows, key=lambda r: r.rank):
            want.append("{} Q0 {} {} {:.4f} JASSjr".format(
                qid, r.docno, r.rank, r.rsv))
    qf = tmp_path / "syntax_queries.txt"
    qf.write_text("\n".join(lines) + "\n")
    got = _run_cli(["--index", path, "--queries", str(qf), "--k", "5",
                    "--syntax"])
    assert got == want and got
    # interactive syntax REPL over stdin: per-line qid 0
    got_i = _run_cli(["--index", path, "--k", "5", "--syntax",
                      "--interactive"], stdin_text="south^2 african\n")
    want_i = ["0 Q0 {} {} {:.4f} JASSjr".format(r.docno, r.rank, r.rsv)
              for r in sorted(run_user_query(idx, "south^2 african", k=5)
                              .collect(), key=lambda r: r.rank)]
    assert got_i == want_i and got_i


def test_cli_percolate_batch_and_stream(spark, tmp_path):
    """percolate_job.py as a subprocess: batch one-shot and the
    availableNow stream produce the same alert feed as the library."""
    from jassjr_spark.operators.percolate import percolate

    docs = spark.createDataFrame(
        [(0, "d0", "alpha beta"), (1, "d1", "alpha"), (2, "d2", "beta")],
        "docid long, docno string, content string",
    )
    stored = spark.createDataFrame(
        [(1, "alpha", False), (1, "beta", True), (2, "beta", False)],
        "query_id long, term string, negated boolean",
    )
    dpath, spath = str(tmp_path / "docs"), str(tmp_path / "stored")
    docs.write.parquet(dpath)
    stored.write.parquet(spath)
    want = {(r.docid, r.query_id) for r in percolate(docs, stored).collect()}
    assert want == {(1, 1), (0, 2), (2, 2)}

    out1 = str(tmp_path / "alerts_batch")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark",
                                      "percolate_job.py"),
         "--stored", spath, "--docs", dpath, "--output", out1, "--batch"],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "percolated: 3 alerts" in r.stdout
    got1 = {(x.docid, x.query_id) for x in spark.read.parquet(out1).collect()}
    assert got1 == want

    out2, ck = str(tmp_path / "alerts_stream"), str(tmp_path / "ck")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark",
                                      "percolate_job.py"),
         "--stored", spath, "--docs", dpath, "--output", out2,
         "--checkpoint", ck],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    got2 = {(x.docid, x.query_id) for x in spark.read.parquet(out2).collect()}
    assert got2 == want


def test_cli_as_of_snapshot(spark, tmp_path):
    """--as-of answers queries against the epoch snapshot through the
    real CLI, byte-identical to the library as-of path; --as-of + --wand
    refuses."""
    from jassjr_spark.sources.index_store import write_meta
    from jassjr_spark.streaming.incremental import (
        append_documents, refresh_derived,
    )

    path = str(tmp_path / "asof_idx")
    write_meta(spark, path, 4)
    e1 = [("A1", "spark shuffle merge"), ("A2", "vector stream")]
    e2 = [("B1", "spark spark postings"), ("B2", "merge stream batch")]
    for epoch, rows in ((1, e1), (2, e2)):
        append_documents(
            spark, spark.createDataFrame(rows, "docno string, content string"),
            path, n_buckets=4, epoch_id=epoch,
        )
    refresh_derived(spark, path)
    qlines = ["51 spark merge", "52 stream"]
    qfile = str(tmp_path / "q.txt")
    open(qfile, "w").write("\n".join(qlines) + "\n")

    want = search_lines(read_index(spark, path, as_of=1), spark, qlines, k=10)
    got = _run_cli(["--index", path, "--queries", qfile, "--k", "10",
                    "--as-of", "1"])
    assert got == want
    assert all(ln.split()[2].startswith("A") for ln in got)  # no epoch-2 doc
    # full view differs (epoch-2 docs rank)
    full = _run_cli(["--index", path, "--queries", qfile, "--k", "10"])
    assert any(ln.split()[2].startswith("B") for ln in full)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "search_job.py"),
         "--index", path, "--queries", qfile, "--as-of", "1", "--wand"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode != 0 and "--as-of" in out.stderr


def test_indexer_cli_fsck(tmp_path):
    """index_job.py --fsck audits a freshly-built index (exit 0, all ok)
    and flags a corrupted one (exit 1, named check BAD)."""
    out_idx = str(tmp_path / "fsck_index")
    build = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "index_job.py"),
         "--input", "/root/reference/test_documents.xml",
         "--output", out_idx, "--buckets", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    ok = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "index_job.py"),
         "--fsck", out_idx],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr[-2000:]
    assert "BAD" not in ok.stdout
    assert "checks passed" in ok.stdout

    # corrupt: truncate the docids table to a single parquet-less dir
    import shutil

    shutil.rmtree(f"{out_idx}/doc_lengths")
    shutil.copytree(f"{out_idx}/docids", f"{out_idx}/doc_lengths")
    # doc_lengths now has docids' schema -> cover/dl checks must trip
    bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "index_job.py"),
         "--fsck", out_idx],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert bad.returncode == 1
    assert "BAD" in bad.stdout


def test_indexer_cli_jsonl_input(tmp_path):
    """index_job.py --input-jsonl: a JSONL rendering of the reference
    corpus builds an index that answers the golden queries byte-exactly;
    malformed lines are skipped with a count, not a crash."""
    import json as _json

    from jassjr_spark.fixtures import GOLDEN_EXPECTED, golden_docs

    feed = tmp_path / "docs.jsonl"
    lines = [_json.dumps({"docno": d, "content": c}) for d, c in golden_docs()]
    lines.insert(3, "}} not json at all")
    # well-formed JSON but missing docno/content: must be counted and
    # dropped, never indexed as an all-NULL document
    lines.insert(5, "{}")
    lines.insert(7, _json.dumps({"wrong": "keys"}))
    feed.write_text("\n".join(lines))

    out_idx = str(tmp_path / "jsonl_index")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "index_job.py"),
         "--input-jsonl", str(feed), "--output", out_idx, "--buckets", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert ("1 malformed lines skipped; 2 parsed lines missing "
            "docno/content skipped") in out.stderr

    qfile = tmp_path / "q.txt"
    qfile.write_text("ten\n")
    got = _run_cli(["--index", out_idx, "--queries", str(qfile)])
    assert got == GOLDEN_EXPECTED["ten"]

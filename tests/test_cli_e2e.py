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

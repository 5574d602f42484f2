"""End-to-end CLI test: pipeline_job.py run as a subprocess — the
spark-submit surface of the curation pipeline (batch funnel + export,
and the streaming dedup mode)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jassjr_spark", "pipeline_job.py"),
         *args],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_pipeline_job_batch(spark, tmp_path):
    rows = [
        (0, "py", "the quick brown fox jumps over the lazy dog and then "
                  "the fox naps in the warm sun for a while today"),
        (1, "py", "the quick brown fox jumps over the lazy dog and then "
                  "the fox naps in the warm sun for a while today"),  # dup
        (2, "go", "call me at 555 1234 about the meeting on the agenda "
                  "for the next review of the quarterly plan we made"),
        (3, "go", "x y z"),  # fails min_tokens
    ]
    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        rows, "docid long, lang string, content string"
    ).write.parquet(src)
    out_dir = str(tmp_path / "out")

    stdout = _run([
        "--input", src, "--output", out_dir,
        "--min-tokens", "10", "--report", "--mix-by", "lang",
    ])
    tail = json.loads(stdout.strip().splitlines()[-1])
    assert tail["rows_out"] == 2  # dup row 1 and short row 3 dropped

    exported = {
        r.docid: r for r in spark.read.parquet(f"{out_dir}/documents").collect()
    }
    assert set(exported) == {0, 2}
    # PII redaction ran: digits are masked in the shipped content
    assert "555" not in exported[2].content

    report = json.load(open(f"{out_dir}/report.json"))
    funnel = dict((s, n) for s, n in report["funnel"])
    assert funnel["input"] == 4 and funnel["dedup"] == 3
    assert funnel["quality"] == 2
    mix = {m["domain"]: m for m in report["mix_weights"]}
    assert set(mix) == {"py", "go"}
    assert abs(sum(m["target"] for m in mix.values()) - 1.0) < 1e-6


def test_pipeline_job_stream_mode(spark, tmp_path):
    from jassjr_spark.sources.fingerprint_store import write_fingerprint_store

    store = str(tmp_path / "store")
    write_fingerprint_store(
        spark.createDataFrame(
            [(0, "seed document body words")], "docid long, content string"
        ),
        store,
    )
    src = tmp_path / "ingest"
    src.mkdir()
    spark.createDataFrame(
        [(10, "seed document body words"), (11, "fresh novel body")],
        "docid long, content string",
    ).coalesce(1).write.parquet(str(src / "b1"))
    out_dir = str(tmp_path / "out")

    _run([
        "--input", str(src) + "/*", "--output", out_dir,
        "--stream", "--store", store,
        "--checkpoint", str(tmp_path / "ck"),
    ])
    dups = spark.read.parquet(f"{out_dir}/dups").collect()
    assert [(r.docid, r.match_docid) for r in dups] == [(10, 0)]
    surv = {r.docid for r in spark.read.parquet(f"{out_dir}/documents").collect()}
    assert surv == {11}

"""spark-submit --py-files deployment (the north-rule packaging shape):
the zip built by tools/package.py must carry the whole engine, and
index_job.py submitted through REAL spark-submit from a directory where
the package is NOT importable must build a working index purely from the
--py-files archive, honouring the launcher's --master."""

import os
import shutil
import subprocess
import sys
import zipfile

import pyspark

from jassjr_spark.operators.search import search_lines
from jassjr_spark.plans.build_job import load_persisted
from jassjr_spark.sources.code_corpus import synthesize_code_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from package import build_zip  # noqa: E402

SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                            "spark-submit")


def test_zip_is_deterministic_and_complete(tmp_path):
    z1 = build_zip(str(tmp_path / "a.zip"))
    z2 = build_zip(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()
    names = set(zipfile.ZipFile(z1).namelist())
    # package at archive root, every subpackage present, no bytecode
    for need in [
        "jassjr_spark/__init__.py",
        "jassjr_spark/operators/search.py",
        "jassjr_spark/sources/index_store.py",
        "jassjr_spark/streaming/incremental.py",
        "jassjr_spark/plans/build_job.py",
        "jassjr_spark/index_job.py",
        "jassjr_spark/search_job.py",
    ]:
        assert need in names
    assert not any(n.endswith(".pyc") or "__pycache__" in n for n in names)


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    """Build the input_hint corpus parquet, then run the indexer as
    ``spark-submit --master local[3] --py-files jassjr_spark.zip`` with a
    cwd that cannot see the repo — the archive is the only way the driver
    and executors can import the engine. The persisted index must then
    answer queries in THIS session."""
    rows = [
        (i, f"alpha beta gamma{i % 7} delta shared term{i % 3}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus_path = str(tmp_path / "data" / "corpus")
    (
        synthesize_code_corpus(docs)
        .drop("doc_id")  # the raw input_hint shape: no pre-assigned ids
        .write.parquet(corpus_path)
    )
    zip_path = build_zip(str(tmp_path / "dist" / "jassjr_spark.zip"))

    workdir = tmp_path / "submit_cwd"
    workdir.mkdir()
    shutil.copy(os.path.join(REPO, "jassjr_spark", "index_job.py"),
                workdir / "index_job.py")
    idx_path = str(tmp_path / "out" / "index")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[3]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         str(workdir / "index_job.py"),
         "--input-parquet", corpus_path,
         "--output", idx_path, "--buckets", "4", "--no-docno-term"],
        capture_output=True, text=True, cwd=str(workdir), env=env,
        timeout=390,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = out.stdout.splitlines()
    assert "Indexed 30 documents. Serialising..." in lines
    # get_spark deferred to the launcher: --master local[3] won
    assert "master=local[3]" in lines

    idx, _ = load_persisted(spark, idx_path)
    idx = idx.cache()
    # "shared" is in every doc -> df==N idf elision; "gamma3" is selective
    assert search_lines(idx, spark, ["shared"], k=30) == []
    hits = search_lines(idx, spark, ["gamma3"], k=30)
    assert len(hits) == 4  # docs 3, 10, 17, 24
    docnos = {r.docno for r in idx.docids.collect()}
    assert len(docnos) == 30 and all(d.startswith("repo-") for d in docnos)

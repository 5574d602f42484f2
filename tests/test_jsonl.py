"""JSONL source/sink: roundtrip fidelity, quarantine, sharded export."""

import glob
import json

from pyspark.sql import functions as F

from jassjr_spark.sources.jsonl import DOCS_SCHEMA, read_jsonl_docs, write_jsonl


def _docs(spark):
    rows = [
        (0, "plain ascii", "en", "web", 11),
        (1, "line\nbreak\tand \"quotes\"", "en", "web", 23),
        (2, "unicodé — ÅÄÖ 模型 🙂", "sv", "books", 18),
        (3, "", "en", "web", 0),
        (4, None, "de", "web", 0),  # NULL text survives as JSON null drop
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "out")
    write_jsonl(docs, path, compression="gzip")
    assert glob.glob(f"{path}/*.json.gz"), "expected gzip'd part files"
    good, bad = read_jsonl_docs(spark, path)
    assert bad.count() == 0
    got = {tuple(r) for r in good.collect()}
    # Spark's JSON writer omits null fields entirely; the reader yields
    # them back as NULL — row 4 therefore roundtrips.
    want = {tuple(r) for r in docs.collect()}
    assert got == want


def test_jsonl_quarantine_bad_lines(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                    "source": "web", "n_chars": 2}),
        "this is not json",
        json.dumps({"doc_id": "not-a-number", "text": "bad type"}),
        "{}",  # parseable empty object: GOOD row of all NULLs, not corrupt
        json.dumps({"doc_id": 2, "text": "also ok", "lang": "en",
                    "source": "web", "n_chars": 7}),
    ]
    (src / "a.jsonl").write_text("\n".join(lines))
    good, bad = read_jsonl_docs(spark, str(src))
    assert good.count() == 3  # two real docs + the empty object
    assert {r.doc_id for r in good.collect()} == {1, 2, None}
    got_bad = sorted(r.line for r in bad.collect())
    assert got_bad == sorted([lines[1], lines[2]])


def test_jsonl_sharded_export_layout(spark, tmp_path):
    """pack_shards -> write_jsonl(partitionBy shard): every shard is its
    own directory, content-complete and independently readable."""
    from jassjr_spark.plans.data_pipeline import pack_shards

    rows = [(i, f"doc {i}", "en", "web", 10) for i in range(20)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    sharded = pack_shards(docs, size_col="n_chars",
                          order_cols=["doc_id"], cap=50)
    path = str(tmp_path / "shards")
    write_jsonl(sharded, path, shard_col="shard", compression=None)
    dirs = sorted(glob.glob(f"{path}/shard=*"))
    assert len(dirs) == 4  # 20 docs x 10 chars / 50-cap = 4 shards
    seen = []
    for d in dirs:
        got, bad = read_jsonl_docs(spark, d)
        assert bad.count() == 0
        ids = sorted(r.doc_id for r in got.collect())
        assert len(ids) == 5  # cap/size = 5 docs per shard, in order
        seen.extend(ids)
    assert seen == list(range(20))  # corpus order preserved across shards


def test_stream_jsonl_into_incremental_index(spark, tmp_path):
    """JSONL files streamed through stream_jsonl_docs feed the live
    incremental index; search over it equals a batch build of the same
    docs — the full training-feed ingest loop."""
    from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import search_lines
    from jassjr_spark.sources.index_store import read_index, write_meta
    from jassjr_spark.sources.jsonl import stream_jsonl_docs
    from jassjr_spark.streaming.incremental import (
        refresh_derived,
        start_indexing_stream,
    )

    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in synth_docs(60)]
    src = tmp_path / "feed"
    src.mkdir()
    for i, chunk in enumerate((rows[:30], rows[30:])):
        (src / f"batch{i}.jsonl").write_text(
            "\n".join(json.dumps({"docno": d, "content": c})
                      for d, c in chunk)
        )

    from pyspark.sql import types as T
    doc_schema = T.StructType([
        T.StructField("docno", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    stream = stream_jsonl_docs(spark, str(src), schema=doc_schema,
                               max_files_per_trigger=1)
    path = str(tmp_path / "jsonl_idx")
    write_meta(spark, path, n_buckets=4)
    q = start_indexing_stream(
        spark, stream, path, checkpoint=str(tmp_path / "ckpt"), n_buckets=4,
    )
    q.awaitTermination(180)
    refresh_derived(spark, path)

    inc = read_index(spark, path).cache()
    # batch reference under the SAME docid assignment the stream made
    # (file arrival order is the stream's to choose; content identity is
    # what's under test)
    assigned = {r.docno: r.docid
                for r in spark.read.parquet(f"{path}/docids").collect()}
    assert len(assigned) == 60
    content = dict(rows)
    ref = build_index(spark.createDataFrame(
        [(assigned[d], d, content[d]) for d in assigned],
        "docid long, docno string, content string",
    )).cache()
    qs = synth_queries(8)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)


def test_jsonl_blank_lines_skipped_not_phantom(spark, tmp_path):
    """Blank / whitespace-only separator lines are neither documents nor
    corruption — no phantom all-NULL rows, no quarantine entries."""
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '\n\n{"doc_id": 1, "text": "ok", "lang": "en", '
        '"source": "web", "n_chars": 2}\n   \n\n'
    )
    good, bad = read_jsonl_docs(spark, str(src))
    assert good.count() == 1 and bad.count() == 0
    assert good.first().doc_id == 1

"""Positional side-table on the LIVE incremental index: per-epoch
maintenance (append_documents maintain_positions), tombstone masking
(live_positions), compaction merge + physical purge, and the epoch-hole
guards."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.operators.positional import (
    build_positions, phrase_search, span_near_occurrences,
)
from jassjr_spark.sources.index_store import read_positions, write_meta
from jassjr_spark.streaming.incremental import (
    _epoch_dirs,
    append_documents,
    compact_segments,
    delete_documents,
    live_positions,
    refresh_derived,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "docno string, content string")


def _epoch_rows(e, n=6):
    return [
        (f"d{e}-{i}", f"alpha beta e{e}w{i} gamma alpha delta beta")
        for i in range(n)
    ]


def _expected_positions(spark, path, exclude_docnos=()):
    """Rebuild the positional table from the index's own docid mapping +
    the known content — the ground truth live_positions must equal."""
    docids = spark.read.parquet(f"{path}/docids")
    rows = []
    for r in docids.collect():
        e = int(r.docno.split("-")[0][1:])
        i = int(r.docno.split("-")[1])
        if r.docno in exclude_docnos:
            continue
        rows.append((r.docid, f"alpha beta e{e}w{i} gamma alpha delta beta"))
    docs = spark.createDataFrame(rows, "docid long, content string")
    return {
        (x.term, x.docid, tuple(x.positions), x.tf)
        for x in build_positions(docs).collect()
    }


def test_live_positions_match_batch_rebuild(spark, tmp_path):
    path = str(tmp_path / "liveidx")
    write_meta(spark, path, 4)
    for e in range(3):
        append_documents(spark, _batch(spark, _epoch_rows(e)), path,
                         n_buckets=4, epoch_id=e, maintain_positions=True)
    got = {
        (r.term, r.docid, tuple(r.positions), r.tf)
        for r in live_positions(spark, path).collect()
    }
    assert got == _expected_positions(spark, path)
    # pruned form agrees and carries only the asked terms
    pruned = live_positions(spark, path, terms=["alpha", "gamma"])
    sub = {(r.term, r.docid, tuple(r.positions), r.tf)
           for r in pruned.collect()}
    assert sub == {g for g in got if g[0] in ("alpha", "gamma")}
    # phrase results off the live table: "e1w2 gamma" is adjacent in
    # exactly one doc ("alpha delta" would hit all docs -> df==N elision)
    dl = spark.read.parquet(f"{path}/doc_lengths")
    docids = spark.read.parquet(f"{path}/docids")
    target = docids.filter(F.col("docno") == "d1-2").first().docid
    run_live = phrase_search(
        live_positions(spark, path, terms=["e1w2", "gamma"]),
        dl, [(1, ["e1w2", "gamma"])], k=50).collect()
    assert [r.docid for r in run_live] == [target]
    span = span_near_occurrences(
        live_positions(spark, path, terms=["beta", "gamma"]),
        ["beta", "gamma"], 1).collect()
    assert all(r.span_tf == 1 for r in span) and len(span) == 18


def test_positions_epoch_hole_guards(spark, tmp_path):
    path = str(tmp_path / "holeidx")
    write_meta(spark, path, 4)
    append_documents(spark, _batch(spark, _epoch_rows(0)), path,
                     n_buckets=4, epoch_id=0)  # no positions
    with pytest.raises(ValueError, match="FIRST append"):
        append_documents(spark, _batch(spark, _epoch_rows(1)), path,
                         n_buckets=4, epoch_id=1, maintain_positions=True)
    path2 = str(tmp_path / "holeidx2")
    write_meta(spark, path2, 4)
    append_documents(spark, _batch(spark, _epoch_rows(0)), path2,
                     n_buckets=4, epoch_id=0, maintain_positions=True)
    with pytest.raises(ValueError, match="epoch hole"):
        append_documents(spark, _batch(spark, _epoch_rows(1)), path2,
                         n_buckets=4, epoch_id=1, maintain_positions=False)
    # default None continues maintaining
    append_documents(spark, _batch(spark, _epoch_rows(1)), path2,
                     n_buckets=4, epoch_id=1)
    eps = _epoch_dirs(spark, f"{path2}/positions")
    assert eps == [0, 1]


def test_delete_masks_and_compaction_purges_positions(spark, tmp_path):
    path = str(tmp_path / "delidx")
    write_meta(spark, path, 4)
    for e in range(4):
        append_documents(spark, _batch(spark, _epoch_rows(e)), path,
                         n_buckets=4, epoch_id=e, maintain_positions=True)
    victim = "d1-2"
    vic_docid = spark.read.parquet(f"{path}/docids") \
        .filter(F.col("docno") == victim).first().docid
    delete_documents(spark, path, [victim])
    # masked immediately: the victim's rows vanish from live_positions
    live = {(r.term, r.docid) for r in live_positions(spark, path).collect()}
    assert not any(d == vic_docid for _, d in live)
    assert live == {(t, d) for t, d, _, _ in
                    _expected_positions(spark, path, exclude_docnos={victim})}
    # ...but the raw table still has them (masking, not rewrite)
    raw = {r.docid for r in read_positions(spark, path).collect()}
    assert vic_docid in raw
    # compaction merges the epoch dirs AND physically purges the victim
    refresh_derived(spark, path)
    before = {(r.term, r.docid, tuple(r.positions), r.tf)
              for r in live_positions(spark, path).collect()}
    assert compact_segments(spark, path, n_buckets=4, full=True) == 4
    eps = _epoch_dirs(spark, f"{path}/positions")
    assert eps == [3]
    raw_after = {r.docid for r in read_positions(spark, path).collect()}
    assert vic_docid not in raw_after
    after = {(r.term, r.docid, tuple(r.positions), r.tf)
             for r in live_positions(spark, path).collect()}
    assert after == before
    # phrase queries still answer off the purged table ("alpha beta"
    # would hit all docs -> elision; use single-doc phrases)
    dl = spark.read.parquet(f"{path}/doc_lengths")
    run = phrase_search(live_positions(spark, path, terms=["e2w1", "gamma"]),
                        dl, [(1, ["e2w1", "gamma"])], k=100).collect()
    assert len(run) == 1 and run[0].docid != vic_docid
    # ...and the deleted doc's unique phrase matches nothing
    gone = phrase_search(live_positions(spark, path, terms=["e1w2", "gamma"]),
                         dl, [(2, ["e1w2", "gamma"])], k=100).collect()
    assert gone == []


def test_stream_maintains_positions(spark, tmp_path):
    """start_indexing_stream(maintain_positions=True): after the stream
    drains, every postings epoch has a positions segment and phrase
    results equal a from-scratch positional build."""
    from jassjr_spark.streaming.incremental import start_indexing_stream

    rows = [r for e in range(3) for r in _epoch_rows(e, n=5)]
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        spark.createDataFrame(
            rows[i * 5:(i + 1) * 5], "docno string, content string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema("docno string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    path = str(tmp_path / "stream_pos")
    q = start_indexing_stream(
        spark, stream, path, checkpoint=str(tmp_path / "ckpt"),
        n_buckets=4, maintain_positions=True,
    )
    q.awaitTermination(180)

    assert _epoch_dirs(spark, f"{path}/positions") == _epoch_dirs(
        spark, f"{path}/postings"
    ) != []
    got = {
        (r.term, r.docid, tuple(r.positions), r.tf)
        for r in live_positions(spark, path).collect()
    }
    assert got == _expected_positions(spark, path)

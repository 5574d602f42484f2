"""Time-travel (as-of epoch) snapshot reads over the persisted LSM index
(sources/index_store.read_index(as_of=)): logical-snapshot semantics
across appends, deletes and re-appends; snapshot expiry at the
compaction floor (streaming.incremental.snapshot_floor); and the
epoch-less-layout guard."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.sources.index_store import (
    read_index, write_index, write_meta,
)
from jassjr_spark.streaming.incremental import (
    append_documents,
    compact_segments,
    delete_documents,
    refresh_derived,
    snapshot_floor,
)


def _rows(n, skip=0):
    # suffix with the window id: synth_docs windows reuse docnos, and
    # delete/re-append semantics need globally unique document names
    raw = synth_docs(n + skip)[skip:]
    return [(f"{docno_of(r, p, c)}-W{skip}", t) for r, p, c, _, t in raw]


def _append(spark, rows, path, epoch):
    batch = spark.createDataFrame(rows, "docno string, content string")
    append_documents(spark, batch, path, n_buckets=4, epoch_id=epoch)


QUERIES = ["51 shuffle postings merge", "52 spark-graft vector"]


def test_as_of_append_history(spark, tmp_path):
    """Search at as_of=E is byte-identical to a batch index built from
    the first E epochs' documents alone, for every E."""
    path = str(tmp_path / "idx")
    write_meta(spark, path, 4)
    a, b, c = _rows(60), _rows(60, skip=60), _rows(60, skip=120)
    _append(spark, a, path, 1)
    _append(spark, b, path, 2)
    _append(spark, c, path, 3)
    refresh_derived(spark, path)

    # append_documents assigns docids docno-ordered WITHIN each epoch, so
    # the equivalent batch corpus is the per-epoch-sorted concatenation
    for e, subset in ((1, sorted(a)), (2, sorted(a) + sorted(b)),
                      (3, sorted(a) + sorted(b) + sorted(c))):
        snap = read_index(spark, path, as_of=e)
        batch = build_index(spark.createDataFrame(
            [(i, d, t) for i, (d, t) in enumerate(subset)],
            "docid long, docno string, content string",
        ))
        assert search_lines(snap, spark, QUERIES) == \
            search_lines(batch, spark, QUERIES)
    # as_of beyond the newest epoch == the current full view
    assert search_lines(read_index(spark, path, as_of=99), spark, QUERIES) \
        == search_lines(read_index(spark, path), spark, QUERIES)
    # snapshot stats are the subset's stats, not the store's
    s1 = read_index(spark, path, as_of=1).scalar_stats()
    s3 = read_index(spark, path, as_of=3).scalar_stats()
    assert s1["n_docs"] == 60 and s3["n_docs"] == 180
    assert s1["total_terms"] < s3["total_terms"]


def test_as_of_sees_through_deletes_and_reappends(spark, tmp_path):
    """A delete is visible only from its tomb_epoch on; a re-append of
    the same docno restores visibility from ITS epoch on — every
    snapshot reads its own version set."""
    path = str(tmp_path / "idx")
    write_meta(spark, path, 4)
    a, b = _rows(40), _rows(40, skip=40)
    victim = a[0][0]
    _append(spark, a, path, 1)
    refresh_derived(spark, path)
    delete_documents(spark, path, [victim])       # tomb_epoch = 1
    _append(spark, b, path, 2)
    # re-append the victim's ORIGINAL content in epoch 3
    _append(spark, [a[0]], path, 3)
    refresh_derived(spark, path)

    def live_docnos(e):
        return {r.docno
                for r in read_index(spark, path, as_of=e).docids.collect()}

    # tomb_epoch == 1: the delete was issued while epoch 1 was the last
    # applied, so the epoch-1 snapshot — the logical state after
    # everything stamped <= 1, deletes included — already masks it
    got1 = live_docnos(1)
    assert victim not in got1 and len(got1) == 39
    got2 = live_docnos(2)
    assert victim not in got2 and len(got2) == 79
    got3 = live_docnos(3)
    assert victim in got3 and len(got3) == 80
    # and the current view agrees with the newest snapshot
    assert {r.docno for r in read_index(spark, path).docids.collect()} == got3


def test_as_of_refuses_below_compaction_floor(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_meta(spark, path, 4)
    for e in (1, 2, 3, 4):
        _append(spark, _rows(30, skip=30 * (e - 1)), path, e)
    refresh_derived(spark, path)
    assert snapshot_floor(spark, path) is None    # never compacted
    before = search_lines(read_index(spark, path), spark, QUERIES)
    merged = compact_segments(spark, path, n_buckets=4, full=True)
    assert merged == 4
    floor = snapshot_floor(spark, path)
    assert floor == 4
    for dead in (1, 2, 3):
        with pytest.raises(ValueError, match="no longer reconstructable"):
            read_index(spark, path, as_of=dead)
    # the floor snapshot itself still reads, and equals the live view
    assert search_lines(read_index(spark, path, as_of=4), spark, QUERIES) \
        == before


def test_purging_compaction_raises_floor_to_tombstone_horizon(
    spark, tmp_path,
):
    """A purge destroys visibility history up to the purged tombstones'
    horizon: epochs between the merged run and that horizon must also
    refuse (their snapshots would resurrect... rather, HIDE nothing —
    they would silently MISS the purged-but-then-live doc)."""
    path = str(tmp_path / "idx")
    write_meta(spark, path, 4)
    a = _rows(40)
    _append(spark, a, path, 1)
    _append(spark, _rows(40, skip=40), path, 2)
    _append(spark, _rows(40, skip=80), path, 3)
    refresh_derived(spark, path)
    delete_documents(spark, path, [a[0][0]])      # tomb_epoch = 3
    # at epoch 2 the victim was still alive; after a purging merge of
    # [1, 2] its rows are physically gone, so as_of=2 must refuse
    compact_segments(spark, path, n_buckets=4, size_ratio=1.0,
                     max_segments=2)
    floor = snapshot_floor(spark, path)
    assert floor == 3
    with pytest.raises(ValueError, match="no longer reconstructable"):
        read_index(spark, path, as_of=2)
    assert read_index(spark, path, as_of=3) is not None


def test_as_of_requires_epoch_layout(spark, tmp_path):
    path = str(tmp_path / "batch_idx")
    rows = _rows(30)
    idx = build_index(spark.createDataFrame(
        [(i, d, t) for i, (d, t) in enumerate(rows)],
        "docid long, docno string, content string",
    ))
    write_index(idx, path, n_buckets=4)
    with pytest.raises(ValueError, match="not epoch-segmented"):
        read_index(spark, path, as_of=1)


def test_export_snapshot_standalone(spark, tmp_path):
    """export_snapshot materializes a snapshot as an ordinary batch
    store: byte-identical search, no epochs/tombstones/markers, and
    self-consistent (live-row) dictionary/stats."""
    from jassjr_spark.streaming.incremental import export_snapshot

    path = str(tmp_path / "src")
    write_meta(spark, path, 4)
    a, b = _rows(50), _rows(50, skip=50)
    _append(spark, a, path, 1)
    delete_documents(spark, path, [a[0][0]])      # tomb_epoch = 1
    _append(spark, b, path, 2)
    refresh_derived(spark, path)

    # as-of export
    dst1 = str(tmp_path / "snap1")
    export_snapshot(spark, path, dst1, as_of=1)
    exp1 = read_index(spark, dst1)
    snap1 = read_index(spark, path, as_of=1)
    assert search_lines(exp1, spark, QUERIES) == \
        search_lines(snap1, spark, QUERIES)
    assert exp1.scalar_stats() == snap1.scalar_stats()
    assert "epoch" not in exp1.postings.columns
    from jassjr_spark.sources.index_store import tombstones_df
    assert tombstones_df(spark, dst1) is None

    # live export: masked doc gone AND stats recomputed over live rows
    dst2 = str(tmp_path / "live")
    export_snapshot(spark, path, dst2)
    exp2 = read_index(spark, dst2)
    assert exp2.scalar_stats()["n_docs"] == 99
    docnos = {r.docno for r in exp2.docids.collect()}
    assert a[0][0] not in docnos
    # the source's persisted stats still count the masked doc (the
    # documented staleness); the export must NOT inherit it
    src_live = read_index(spark, path)
    assert src_live.scalar_stats()["n_docs"] == 100
    # "carries no epochs" holds for EVERY segment table (a stray epoch
    # column on doc_lengths/docids breaks merge_indexes' unionByName
    # against batch-built shards). `bucket` on postings is fine — that
    # is the term-bucketed BATCH layout write_index itself creates —
    # but must not leak onto the other tables.
    for exp in (exp1, exp2):
        for tbl in (exp.postings, exp.doc_lengths, exp.docids):
            assert "epoch" not in tbl.columns
        for tbl in (exp.doc_lengths, exp.docids):
            assert "bucket" not in tbl.columns


def test_as_of_property_random_histories(spark, tmp_path):
    """Randomized append/delete/compact interleavings: every recorded
    epoch snapshot above the floor reads back EXACTLY the then-live
    document set; everything below the floor refuses. This is where a
    silent tombstone-horizon or purge bug would hide."""
    import random

    for seed in range(3):
        rng = random.Random(seed)
        path = str(tmp_path / f"prop_{seed}")
        write_meta(spark, path, 4)
        pool = _rows(120)
        live: dict = {}
        snapshots: dict = {}
        epoch, ptr = 0, 0
        for _ in range(8):
            op = rng.choice(["append", "append", "delete", "compact"])
            if op == "append" and ptr < len(pool):
                k = rng.randint(1, 15)
                batch = pool[ptr:ptr + k]
                ptr += k
                epoch += 1
                _append(spark, batch, path, epoch)
                live.update(dict(batch))
                snapshots[epoch] = set(live)
            elif op == "delete" and live:
                victims = rng.sample(sorted(live), min(3, len(live)))
                delete_documents(spark, path, victims)
                for v in victims:
                    live.pop(v)
                if epoch:          # deletes stamp the CURRENT epoch
                    snapshots[epoch] = set(live)
            elif op == "compact" and epoch:
                refresh_derived(spark, path)
                compact_segments(spark, path, n_buckets=4, size_ratio=1.5)
        if not epoch:
            continue
        refresh_derived(spark, path)
        floor = snapshot_floor(spark, path) or 0
        for e, want in sorted(snapshots.items()):
            if e < floor:
                with pytest.raises(ValueError,
                                   match="no longer reconstructable"):
                    read_index(spark, path, as_of=e)
            else:
                got = {r.docno for r in
                       read_index(spark, path, as_of=e).docids.collect()}
                assert got == want, (seed, e, floor)

"""Streaming incremental index == batch index over the same corpus."""

from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.sources.index_store import read_index
from jassjr_spark.streaming.incremental import (
    append_documents,
    refresh_derived,
    start_indexing_stream,
)


def _rows(n):
    raw = synth_docs(n)
    return [(docno_of(r, p, c), t) for r, p, c, _, t in raw]


def test_incremental_appends_match_batch(spark, tmp_path):
    rows = _rows(120)
    path = str(tmp_path / "inc_idx")
    from jassjr_spark.sources.index_store import write_meta

    write_meta(spark, path, n_buckets=8)
    # three increments, arrival order = corpus order chunks
    for chunk in (rows[:40], rows[40:90], rows[90:]):
        batch = spark.createDataFrame(chunk, "docno string, content string")
        append_documents(spark, batch, path, n_buckets=8)
    refresh_derived(spark, path)

    inc = read_index(spark, path).cache()
    # batch reference: same docs, docid = global (chunk, docno) order;
    # chunks are already docno-sorted slices of the sorted corpus, so
    # arrival order == corpus order
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    qs = synth_queries(12)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)
    assert inc.scalar_stats() == ref.scalar_stats()


def test_streaming_search_idless_multiterm(spark, tmp_path):
    """Regression (round-1 verdict bug): an id-less multi-term query line
    must score ALL its terms — `split()[1:]` dropped the first one."""
    from jassjr_spark.fixtures import golden_docs
    from jassjr_spark.streaming.search_stream import start_search_stream

    docs = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(golden_docs())],
        "docid long, docno string, content string",
    )
    idx = build_index(docs).cache()
    src = tmp_path / "qsrc"
    src.mkdir()
    (src / "queries.txt").write_text("ten nine\n")
    stream = spark.readStream.schema("line string").text(str(src))
    out = str(tmp_path / "runs")
    q = start_search_stream(
        spark, stream.withColumnRenamed("value", "line"), idx, out,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = sorted(
        "{} Q0 {} {} {:.4f} JASSjr".format(r.query_id, r.docno, r.rank, r.rsv)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(search_lines(idx, spark, ["ten nine"]))
    assert got == want  # both "ten" and "nine" contributions present


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay of an applied epoch must not duplicate rows,
    and a partially-written epoch must overwrite its own segment."""
    from jassjr_spark.sources.index_store import write_meta

    rows = _rows(30)
    path = str(tmp_path / "epoch_idx")
    write_meta(spark, path, n_buckets=4)
    b0 = spark.createDataFrame(rows[:20], "docno string, content string")
    b1 = spark.createDataFrame(rows[20:], "docno string, content string")
    assert append_documents(spark, b0, path, n_buckets=4, epoch_id=0) == 20
    # replay of the completed epoch: skipped, nothing duplicated
    assert append_documents(spark, b0, path, n_buckets=4, epoch_id=0) == 0
    assert append_documents(spark, b1, path, n_buckets=4, epoch_id=1) == 10
    refresh_derived(spark, path)
    inc = read_index(spark, path).cache()
    assert inc.docids.count() == 30
    assert inc.docids.select("docid").distinct().count() == 30
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    qs = synth_queries(8)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)


def test_incremental_refresh_matches_full(spark, tmp_path):
    """Incremental dictionary refresh (delta over new epochs merged into
    the existing dictionary) must equal the full recompute."""
    from jassjr_spark.sources.index_store import write_meta

    rows = _rows(60)
    path = str(tmp_path / "incref_idx")
    write_meta(spark, path, n_buckets=4)
    b0 = spark.createDataFrame(rows[:30], "docno string, content string")
    b1 = spark.createDataFrame(rows[30:50], "docno string, content string")
    b2 = spark.createDataFrame(rows[50:], "docno string, content string")
    append_documents(spark, b0, path, n_buckets=4, epoch_id=0)
    refresh_derived(spark, path)  # first refresh: full, sets the marker
    append_documents(spark, b1, path, n_buckets=4, epoch_id=1)
    append_documents(spark, b2, path, n_buckets=4, epoch_id=2)
    refresh_derived(spark, path)  # incremental: delta of epochs 1-2
    inc_dict = {
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/dictionary").collect()
    }
    full_dict = {
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/postings")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cf"))
        .collect()
    }
    assert inc_dict == full_dict
    # end-to-end: search over the incrementally-refreshed index == batch
    inc = read_index(spark, path).cache()
    ref = build_index(spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )).cache()
    qs = synth_queries(6)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)


def test_session_gap_boundary_matches_oracle(spark, tmp_path):
    """An event at EXACTLY prev+gap MERGES into the session (verified
    Spark behavior); the DuckDB oracle's strictly-> predicate must agree.
    This pins the boundary semantics cross-engine."""
    import datetime as dt

    import duckdb

    from jassjr_spark.driver_queries import SQL_EV_USER_SESSIONS
    from jassjr_spark.operators.events import user_sessions

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 7, "view", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=30), 7, "view", 1.0, "{}"),   # == gap
        (2, base + dt.timedelta(minutes=59), 7, "view", 1.0, "{}"),   # < gap
        (3, base + dt.timedelta(minutes=95), 7, "view", 1.0, "{}"),   # > gap
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = {(r.user_id, r.session_start_us, r.n_events, r.duration_us)
           for r in user_sessions(ev, gap="30 minutes").collect()}
    # exact-gap event 1 merges; 59->95 (36 min > gap) splits: [0,1,2], [3]
    assert sorted(n for _, _, n, _ in got) == [1, 3]

    p = str(tmp_path / "ev.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = {tuple(r) for r in con.execute(SQL_EV_USER_SESSIONS).fetchall()}
    assert got == want


def test_watermark_backward_compat(spark, tmp_path):
    """A pre-epoch _watermark (no epoch_id column) must NOT reset the
    docid high-water mark."""
    from jassjr_spark.streaming.incremental import _read_watermark

    path = str(tmp_path / "old_idx")
    spark.createDataFrame([(120,)], "next_docid long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/_watermark")
    base, last_epoch = _read_watermark(spark, path)
    assert base == 120 and last_epoch is None


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """Watermarked streaming windowed aggregate == the batch operator over
    the same events."""
    import datetime as dt

    from jassjr_spark.operators.events import windowed_event_counts
    from jassjr_spark.streaming.stateful import start_windowed_counts_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), ["view", "click"][i % 2],
         float(i) / 4.0)
        for i in range(240)
    ]
    src = tmp_path / "evsrc"
    src.mkdir()
    batch_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(str(src / "b0"))
    q = start_windowed_counts_stream(
        stream, "wc_sink", checkpoint=str(tmp_path / "ckpt"), sink="memory"
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from wc_sink").collect()}
    want = {tuple(r) for r in windowed_event_counts(batch_df).collect()}
    assert got == want and len(want) > 10


def test_streaming_dedup_first_seen(spark, tmp_path):
    """applyInPandasWithState dedup: only the first-ever occurrence of
    each content hash is emitted, across micro-batches."""
    from jassjr_spark.streaming.stateful import start_streaming_dedup

    import glob
    import shutil

    src = tmp_path / "dsrc"
    src.mkdir()
    schema = "docid long, docno string, content string"
    # batch 0: two distinct docs, one internal duplicate
    b0 = [(0, "A", "alpha text"), (1, "B", "beta text"), (2, "C", "alpha text")]
    # batch 1 (later file): repeats of batch-0 content + one new doc
    b1 = [(3, "D", "beta text"), (4, "E", "gamma text"), (5, "F", "alpha text")]

    def land(rows, name):
        # the streaming file source watches FILES in src, not subdirs
        tmp = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = glob.glob(str(tmp / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    land(b0, "f0")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = str(tmp_path / "dedup_out")
    q = start_streaming_dedup(
        spark, stream, out, checkpoint=str(tmp_path / "dckpt"),
        trigger_available_now=False,
    )
    try:
        q.processAllAvailable()
        land(b1, "f1")
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.keep_docid, r.docno) for r in spark.read.parquet(out).collect()}
    # first-seen per content: alpha->0/A, beta->1/B, gamma->4/E
    assert got == {(0, "A"), (1, "B"), (4, "E")}


def test_streaming_dedup_ttl_readmits_expired_keys(spark, tmp_path):
    """ttl_ms bounds dedup state (VERDICT r4 Next #6): a key seen again
    AFTER its TTL deadline re-emits (state forgotten); a key seen again
    BEFORE the deadline stays suppressed."""
    import glob
    import shutil
    import time

    from jassjr_spark.streaming.stateful import start_streaming_dedup

    src = tmp_path / "tsrc"
    src.mkdir()
    schema = "docid long, docno string, content string"

    def land(rows, name):
        tmp = tmp_path / f"tstage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = glob.glob(str(tmp / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    def run_once(tag, ttl_ms, expect_input_rows):
        # availableNow restarts over one checkpoint: the periodic-job
        # cadence the docstring prescribes for TTL'd dedup. With engine
        # timeouts registered the query keeps scheduling timeout-
        # processing batches (it never self-terminates and
        # processAllAvailable never returns), so the driver polls
        # progress until this run's NEW source rows are all processed,
        # then stops the query explicitly.
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = start_streaming_dedup(
            spark, stream, str(tmp_path / f"{tag}_out"),
            checkpoint=str(tmp_path / f"{tag}_ckpt"),
            trigger_available_now=True, ttl_ms=ttl_ms,
        )
        try:
            t0, seen, data_rows = time.time(), set(), 0
            while data_rows < expect_input_rows and time.time() - t0 < 150:
                for p in q.recentProgress:
                    if p["batchId"] not in seen:
                        seen.add(p["batchId"])
                        data_rows += p["numInputRows"]
                time.sleep(0.5)
            assert data_rows >= expect_input_rows, "source rows not processed"
            time.sleep(2)  # grace: let the reported batch's sink commit land
        finally:
            q.stop()

    def rows_of(tag):
        return {(r.keep_docid, r.docno)
                for r in spark.read.parquet(str(tmp_path / f"{tag}_out")).collect()}

    # stream L (long TTL, far beyond the test's own run latency): a
    # repeat within the TTL stays suppressed
    land([(0, "A", "alpha text"), (1, "B", "beta text")], "f0")
    run_once("long", 300_000, 2)
    land([(2, "C", "alpha text")], "f1")
    run_once("long", 300_000, 1)
    assert rows_of("long") == {(0, "A"), (1, "B")}

    # stream S (short TTL): a repeat after the deadline is re-admitted
    # (same source files; its own checkpoint replays them from scratch)
    run_once("short", 2_000, 3)
    assert rows_of("short") == {(0, "A"), (1, "B")}  # C deduped in-run
    time.sleep(2.5)
    land([(3, "D", "alpha text")], "f2")
    run_once("short", 2_000, 1)
    assert rows_of("short") == {(0, "A"), (1, "B"), (3, "D")}
    # ...and the long stream still suppresses that same repeat
    run_once("long", 300_000, 1)
    assert rows_of("long") == {(0, "A"), (1, "B")}


def test_streaming_source_e2e(spark, tmp_path):
    """Real readStream (file source) -> foreachBatch indexer -> search."""
    rows = _rows(60)
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, "docno string, content string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(src / "batch0"))

    stream = spark.readStream.schema("docno string, content string").parquet(
        str(src / "batch0")
    )
    path = str(tmp_path / "stream_idx")
    q = start_indexing_stream(
        spark, stream, path, checkpoint=str(tmp_path / "ckpt"), n_buckets=8
    )
    q.awaitTermination(120)
    refresh_derived(spark, path)

    inc = read_index(spark, path).cache()
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(sorted(rows))],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    qs = synth_queries(8)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)


def test_segment_compaction_bounds_files_and_preserves_search(spark, tmp_path):
    """20 streamed epochs -> compaction merges every refreshed epoch into
    ONE segment directory per table (recovering the reference's
    contiguous-postings property over time, JASSjr_index.cpp:201-218),
    collapses the marker tables to one file each, leaves search output
    identical, and keeps accepting appends afterwards."""
    import os

    from jassjr_spark.sources.index_store import write_meta
    from jassjr_spark.streaming.incremental import compact_segments

    rows = _rows(110)
    path = str(tmp_path / "lsm_idx")
    write_meta(spark, path, n_buckets=8)
    for e in range(20):
        batch = spark.createDataFrame(
            rows[e * 5:(e + 1) * 5], "docno string, content string"
        )
        append_documents(spark, batch, path, n_buckets=8, epoch_id=e)
    refresh_derived(spark, path)
    queries = synth_queries(6)
    before_lines = search_lines(read_index(spark, path).cache(), spark, queries)

    def n_files(p):
        return sum(len(fs) for _, _, fs in os.walk(p))

    def epoch_dirs(t):
        return sorted(
            d for d in os.listdir(f"{path}/{t}") if d.startswith("epoch=")
        )

    files_before = n_files(path)
    assert len(epoch_dirs("postings")) == 20
    # a half-written stage from a crashed compaction is discarded
    os.makedirs(f"{path}/postings/_compact_tmp_5")
    merged = compact_segments(spark, path)
    assert merged == 20
    assert not os.path.exists(f"{path}/postings/_compact_tmp_5")
    for t in ("postings", "doc_lengths", "docids"):
        assert epoch_dirs(t) == ["epoch=19"]
    for marker in ("_watermark", "_refreshed"):
        data = [f for f in os.listdir(f"{path}/{marker}")
                if not f.startswith(("_", "."))]
        assert len(data) == 1
    assert n_files(path) < files_before / 3
    after_lines = search_lines(read_index(spark, path).cache(), spark, queries)
    assert after_lines == before_lines
    assert compact_segments(spark, path) == 0  # idempotent: one segment left

    # the index keeps accepting epochs after compaction, docids continue
    batch = spark.createDataFrame(rows[100:], "docno string, content string")
    append_documents(spark, batch, path, n_buckets=8, epoch_id=20)
    refresh_derived(spark, path)
    inc = read_index(spark, path).cache()
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    assert search_lines(inc, spark, queries) == search_lines(ref, spark, queries)


def test_streaming_windowed_counts_parquet_append_drops_late(spark, tmp_path):
    """The production sink (append mode + watermark expiry -> parquet):
    on-time windows land exactly once and equal the batch aggregate of
    the on-time subset; an event later than the watermark is dropped and
    changes nothing; an unfinalized trailing window is not emitted."""
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jassjr_spark.operators.events import windowed_event_counts
    from jassjr_spark.streaming.stateful import start_windowed_counts_stream

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def table(rows):
        ids, tss, types, vals = zip(*rows)
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(list(tss), pa.timestamp("us", tz="UTC")),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        })

    src = tmp_path / "evsrc"
    src.mkdir()
    # batch 0: on-time events 00:00-02:59
    b0 = [(i, base + dt.timedelta(minutes=7 * i), ["view", "click"][i % 2],
           float(i) / 4.0) for i in range(26)]
    # batch 1: sentinel at 05:00 — the watermark (02:25, from batch 0's
    # max event time) finalizes windows [0,1) and [1,2) and drops their
    # state during this batch
    b1 = [(100, base + dt.timedelta(hours=5), "view", 1.0)]
    # batch 2: a TOO-LATE event at 00:10 — its window closed two batches
    # ago (watermark is now 04:30, far past the 01:00 window end; the
    # late-row filter lags the reported watermark by at most one batch,
    # so the drop is deterministic here) — must change nothing
    b2 = [(101, base + dt.timedelta(minutes=10), "click", 99.0)]
    # batch 3: sentinel at 08:00 -> watermark 07:30 finalizes [2,3) and
    # [5,6); its own window [8,9) stays in state, never emitted
    b3 = [(102, base + dt.timedelta(hours=8), "view", 2.0)]
    for i, rows in enumerate((b0, b1, b2, b3)):
        f = str(src / f"b{i}.parquet")
        pq.write_table(table(rows), f)
        os.utime(f, (time.time() + i, time.time() + i))  # arrival order

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "wc_parquet")
    q = start_windowed_counts_stream(
        stream, out, checkpoint=str(tmp_path / "ckpt_p"),
        watermark="30 minutes",
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    # expected: batch aggregate over on-time events whose windows were
    # finalized — b0 plus the 05:00 sentinel; NOT the late event, NOT the
    # trailing 08:00 window
    on_time = spark.createDataFrame(
        b0 + b1,
        "event_id long, ts timestamp, event_type string, value double",
    )
    want = {tuple(r) for r in windowed_event_counts(on_time).collect()}
    assert got == want and len(want) > 4


def test_indexing_stream_auto_compaction(spark, tmp_path):
    """compact_every=N wires maintenance into the stream itself: a
    multi-epoch run (one file per trigger) ends with a bounded number of
    epoch directories and byte-identical search output."""
    import os

    rows = _rows(96)
    src = tmp_path / "src"
    src.mkdir()
    # 12 files -> 12 micro-batches (epochs) under maxFilesPerTrigger=1;
    # arrival order = corpus order chunks (docno-sorted slices)
    for i in range(12):
        spark.createDataFrame(
            rows[i * 8:(i + 1) * 8], "docno string, content string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i:02d}"))

    stream = (
        spark.readStream.schema("docno string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    path = str(tmp_path / "auto_idx")
    q = start_indexing_stream(
        spark, stream, path, checkpoint=str(tmp_path / "ckpt"),
        n_buckets=8, compact_every=4,
    )
    q.awaitTermination(240)
    refresh_derived(spark, path)

    epoch_dirs = [d for d in os.listdir(f"{path}/postings")
                  if d.startswith("epoch=")]
    # 12 epochs with compaction every 4 leaves far fewer than 12 dirs
    assert 1 <= len(epoch_dirs) <= 5, epoch_dirs

    inc = read_index(spark, path).cache()
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    qs = synth_queries(8)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)


# ---------------------------------------------------- tiered compaction


def test_pick_compaction_run_policy():
    """The size-tiered policy in isolation: bounded per-merge cost and
    amortized total I/O (the r3 full-rewrite policy was O(index) per
    call => quadratic over the stream's lifetime)."""
    from jassjr_spark.streaming.incremental import pick_compaction_run

    # equal-size segments merge fully (degenerates to the old behavior)
    eq = {e: 100 for e in range(5)}
    assert pick_compaction_run(list(range(5)), eq, 4.0, 8) == [0, 1, 2, 3, 4]

    # a big old segment is NOT dragged into a merge of small young ones
    sizes = {0: 10_000, 1: 100, 2: 100, 3: 100}
    assert pick_compaction_run([0, 1, 2, 3], sizes, 4.0, 8) == [1, 2, 3]

    # ...until the young pile grows to within the ratio
    sizes = {0: 1_000, 1: 300, 2: 100}
    assert pick_compaction_run([0, 1, 2], sizes, 4.0, 8) == [0, 1, 2]

    # max_segments forces the run wide enough to bound live segments
    many = {e: 100 * (10 - e) for e in range(10)}
    many[0] = 10 ** 9  # ratio walk alone would stop before epoch 0
    run = pick_compaction_run(list(range(10)), many, 0.001, 4)
    assert len(list(range(10))) - len(run) + 1 <= 4

    # single segment: nothing to merge
    assert pick_compaction_run([7], {7: 5}, 4.0, 8) == []

    # amortization: simulate 200 epochs of unit-size appends, compacting
    # after every epoch. Full-rewrite policy would rewrite ~N^2/2 = 20000
    # units; tiered must stay O(N log N).
    segs: dict[int, int] = {}
    rewritten = 0
    for e in range(200):
        segs[e] = 1
        run = pick_compaction_run(sorted(segs), segs, 4.0, 8)
        if run:
            merged = sum(segs[x] for x in run)
            rewritten += merged
            for x in run:
                del segs[x]
            segs[run[-1]] = merged
    assert len(segs) <= 8              # live segment count bounded
    assert rewritten < 4_000, rewritten  # << 20000 (the quadratic policy)


def test_tiered_compaction_bounds_bytes_and_preserves_search(spark, tmp_path):
    """40 streamed epochs with periodic tiered compaction (VERDICT r4
    Next #1): (a) bytes rewritten per compaction are bounded by the
    merged segments' size, not the index size; (b) at least one
    compaction leaves the big old segment untouched (the tiering
    property); (c) live segment count stays bounded; (d) search output
    equals the batch-built reference at the end."""
    import os

    from jassjr_spark.sources.index_store import write_meta
    from jassjr_spark.streaming.incremental import compact_segments

    def content(e, j):
        # ~300 UNIQUE-per-doc words so parquet bytes track data volume
        # (shared-vocab postings dictionary-encode away, which would let
        # the ratio walk keep admitting the big segment), plus query
        # words in SOME docs (df < N, so idf > 0 and they actually score)
        extra = (" shared" if j == 0 else "") + (" common" if e % 3 == 0 else "")
        return " ".join(f"w{e:02d}{j}{i:03d}" for i in range(300)) + extra

    rows = [(f"D{e:02d}-{j}", content(e, j)) for e in range(40) for j in range(2)]
    path = str(tmp_path / "tiered_idx")
    write_meta(spark, path, n_buckets=4)

    def seg_sizes():
        out = {}
        root = f"{path}/postings"
        for d in os.listdir(root):
            if d.startswith("epoch="):
                e = int(d.split("=")[1])
                out[e] = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(os.path.join(root, d))
                    for f in fs
                )
        return out

    partial_merges = 0
    for e in range(40):
        batch = spark.createDataFrame(
            rows[e * 2:(e + 1) * 2], "docno string, content string"
        )
        append_documents(spark, batch, path, n_buckets=4, epoch_id=e)
        if e % 4 == 3:
            refresh_derived(spark, path)
            before = seg_sizes()
            merged = compact_segments(spark, path, n_buckets=4,
                                      size_ratio=1.5, max_segments=8)
            after = seg_sizes()
            assert len(after) <= 8  # (c) live segments bounded
            if merged:
                run = sorted(before, reverse=True)[:merged]
                inputs = sum(before[x] for x in run)
                rewritten = after[max(run)]
                # (a) cost ~ merged inputs (parquet re-encode slack), and
                # strictly below the whole index when a partial merge
                assert rewritten <= 1.6 * inputs + 65536, (rewritten, inputs)
                if inputs < 0.6 * sum(before.values()):
                    partial_merges += 1
    assert partial_merges >= 2, "tiering never skipped the big segment"  # (b)

    refresh_derived(spark, path)
    inc = read_index(spark, path).cache()
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    qs = ["1 shared", "2 common w050010", "3 w121200 shared",
          "4 w391100 w000000", "5 common", "6 w200150 w331299"]
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)  # (d)


def test_compaction_refresh_append_interleavings_random(spark, tmp_path):
    """Property test (VERDICT r4 Next #8): random (seeded) interleavings
    of append / refresh / compact must keep the dictionary df/cf equal to
    a full recompute — the incremental delta + tiered compaction
    interaction is where a silent double-count would hide."""
    import random

    from jassjr_spark.sources.index_store import write_meta
    from jassjr_spark.streaming.incremental import compact_segments

    all_rows = _rows(80)
    for seed in range(5):
        rng = random.Random(seed)
        path = str(tmp_path / f"prop_{seed}")
        write_meta(spark, path, n_buckets=4)
        pos, epoch = 0, 0
        while pos < len(all_rows):
            op = rng.choice(["append", "append", "refresh", "compact"])
            if op == "append":
                n = rng.randint(8, 20)
                batch = spark.createDataFrame(
                    all_rows[pos:pos + n], "docno string, content string"
                )
                append_documents(spark, batch, path, n_buckets=4,
                                 epoch_id=epoch)
                pos += n
                epoch += 1
            elif op == "refresh":
                refresh_derived(spark, path)
            else:
                compact_segments(
                    spark, path, n_buckets=4,
                    size_ratio=rng.choice([1.0, 4.0]),
                    max_segments=rng.choice([2, 4, 8]),
                )
        refresh_derived(spark, path)
        got = {
            r.term: (r.df, r.cf)
            for r in spark.read.parquet(f"{path}/dictionary").collect()
        }
        full = (
            spark.read.parquet(f"{path}/postings")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        )
        want = {r.term: (r.df, r.cf) for r in full.collect()}
        assert got == want, f"seed {seed}: dictionary diverged from recompute"


def test_streaming_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The stateful.py docstring prescribes the RocksDB state store for
    unbounded distinct corpora (state spills to executor-local disk
    instead of heap); prove the dedup operator actually runs — and keeps
    exact first-seen semantics across batches — under that provider."""
    import glob
    import shutil

    from jassjr_spark.streaming.stateful import start_streaming_dedup

    src = tmp_path / "rsrc"
    src.mkdir()
    schema = "docid long, docno string, content string"

    def land(rows, name):
        tmp = tmp_path / f"rstage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = glob.glob(str(tmp / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocks)
    try:
        land([(0, "A", "alpha text"), (1, "B", "beta text")], "f0")
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        out = str(tmp_path / "rocks_out")
        q = start_streaming_dedup(
            spark, stream, out, checkpoint=str(tmp_path / "rckpt"),
            trigger_available_now=False,
        )
        try:
            q.processAllAvailable()
            land([(2, "C", "alpha text"), (3, "D", "gamma text")], "f1")
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = {(r.keep_docid, r.docno) for r in spark.read.parquet(out).collect()}
    assert got == {(0, "A"), (1, "B"), (3, "D")}


def test_hopping_counts_membership_and_totals(spark):
    """Each event lands in window/slide overlapping windows; summing a
    window-aligned slice over hops equals the tumbling total."""
    from datetime import datetime

    from jassjr_spark.operators.events import (
        hopping_event_counts, windowed_event_counts,
    )

    rows = [
        (0, datetime(2024, 1, 1, 0, 7), 1, "a", 1.0, ""),
        (1, datetime(2024, 1, 1, 0, 22), 1, "a", 2.0, ""),
        (2, datetime(2024, 1, 1, 1, 2), 2, "b", 3.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    hop = hopping_event_counts(ev, window="1 hour", slide="15 minutes")
    got = {(r.window_start_us, r.event_type): r.n_events for r in hop.collect()}
    HOUR, Q = 3_600_000_000, 900_000_000
    base = 1_704_067_200_000_000  # 2024-01-01T00:00Z in epoch micros
    # event at 00:07 belongs to starts 23:15..00:00 (4 windows)
    for k in range(4):
        s = base - HOUR + Q + k * Q
        assert got[(s, "a")] >= 1, s
    # both 'a' events share exactly the windows covering [00:07, 00:22]:
    # starts 23:30, 23:45, 00:00
    both = [s for (s, t), n in got.items() if t == "a" and n == 2]
    assert sorted(both) == [base - 2 * Q, base - Q, base]
    # every event appears in exactly window/slide = 4 hopping windows
    assert sum(n for (s, t), n in got.items() if t == "a") == 2 * 4
    assert sum(n for (s, t), n in got.items() if t == "b") == 1 * 4
    # tumbling is the slide==window degenerate case
    tum = {(r.window_start_us, r.event_type): r.n_events
           for r in windowed_event_counts(ev, window="1 hour").collect()}
    hop_eq = {(r.window_start_us, r.event_type): r.n_events
              for r in hopping_event_counts(
                  ev, window="1 hour", slide="1 hour").collect()}
    assert tum == hop_eq


def test_top_users_per_window_rank_and_plan(spark):
    from datetime import datetime

    from jassjr_spark.operators.events import top_users_per_window

    rows = []
    eid = 0
    # hour 0: user 1 x3, user 2 x2, user 3 x1, user 4 x1 (tie w/ 3)
    for uid, n in ((1, 3), (2, 2), (3, 1), (4, 1)):
        for i in range(n):
            rows.append((eid, datetime(2024, 1, 1, 0, 5 + eid % 50), uid,
                         "a", 1.0, ""))
            eid += 1
    # hour 1: user 9 alone
    rows.append((eid, datetime(2024, 1, 1, 1, 10), 9, "a", 1.0, ""))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = top_users_per_window(ev, window="1 hour", k=3).collect()
    by_w = {}
    for r in out:
        by_w.setdefault(r.window_start_us, []).append((r.rank, r.user_id))
    h0, h1 = sorted(by_w)
    # ties break user_id ASC: user 3 beats user 4 at rank 3
    assert sorted(by_w[h0]) == [(1, 1), (2, 2), (3, 3)]
    assert by_w[h1] == [(1, 9)]
    # rank<=k is pushed below the shuffle: partial + final WindowGroupLimit
    plan = top_users_per_window(ev, window="1 hour", k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2


def test_asof_join_semantics(spark):
    """Union-and-carry as-of join: latest right.ts <= left.ts per key,
    inclusive at equal timestamps, NULL when no prior right exists, and
    same-(key, ts) right rows pre-resolved to max(payload)."""
    from datetime import datetime

    from jassjr_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [
            (0, 1, datetime(2024, 1, 1, 0, 30)),   # after r@0:10 -> 5.0
            (1, 1, datetime(2024, 1, 1, 1, 0)),    # == r@1:00 -> inclusive 7.0
            (2, 1, datetime(2024, 1, 1, 0, 5)),    # before any right -> NULL
            (3, 2, datetime(2024, 1, 1, 9, 0)),    # dup right ts -> max = 4.0
            (4, 3, datetime(2024, 1, 1, 9, 0)),    # key with no right -> NULL
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 10), 5.0),
            (1, datetime(2024, 1, 1, 1, 0), 7.0),
            (2, datetime(2024, 1, 1, 8, 0), 1.0),
            (2, datetime(2024, 1, 1, 8, 0), 4.0),  # same (key, ts): max wins
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = asof_join(left, right)
    got = {r.event_id: (r.asof.value if r.asof else None) for r in out.collect()}
    assert got == {0: 5.0, 1: 7.0, 2: None, 3: 4.0, 4: None}
    assert out.count() == left.count()  # left-preserving

    # scale shape: no join operator at all — one hash exchange on the
    # key feeding a partition-local sort + running last() window.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1
    assert "Window" in plan


def test_range_join_campaigns_overlap_and_plan(spark):
    """An event inside k overlapping campaign windows counts k times;
    the fact side streams once against a broadcast nested-loop range
    predicate — no exchange of the events table."""
    from datetime import datetime

    from jassjr_spark.operators.events import range_join_campaigns

    US = 1_000_000
    t0 = 1_704_067_200 * US  # 2024-01-01T00:00Z
    ev = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1, 1), 1, "a", 1.0, ""),   # in A and B
            (1, datetime(2024, 1, 1, 12), 1, "a", 2.0, ""),  # in B only
            (2, datetime(2024, 1, 2, 0), 1, "a", 4.0, ""),   # end-exclusive: none
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    camp = spark.createDataFrame(
        [("A", t0, t0 + 2 * 3600 * US), ("B", t0, t0 + 24 * 3600 * US)],
        "campaign_id string, start_us long, end_us long",
    )
    out = range_join_campaigns(ev, camp)
    got = {r.campaign_id: (r.n_events, r.sum_value) for r in out.collect()}
    assert got == {"A": (1, 1.0), "B": (2, 3.0)}

    # AQE plan text repeats as "Final Plan"/"Initial Plan"; gate the final
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in plan
    # the dimension broadcasts; the ONLY shuffle is the final k-row
    # aggregate — the fact side never hash-exchanges.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" in plan


def test_retention_cohorts_small(spark):
    """Cohort = first active epoch week; offsets count distinct users."""
    from datetime import datetime

    from jassjr_spark.operators.events import retention_cohorts

    # epoch week boundary: weeks are floor(epoch_us / week_us); pick two
    # consecutive weeks w and w+1 around 2024-01-04 (a Thursday, so the
    # epoch-week boundary — epoch day 0 was a Thursday — falls there).
    rows = [
        # user 1 active week0 and week1; user 2 week0 only; user 3 week1 only
        (0, datetime(2024, 1, 1), 1, "a", 1.0, ""),
        (1, datetime(2024, 1, 1, 5), 1, "a", 1.0, ""),  # same week, dedup
        (2, datetime(2024, 1, 8), 1, "a", 1.0, ""),
        (3, datetime(2024, 1, 2), 2, "a", 1.0, ""),
        (4, datetime(2024, 1, 9), 3, "a", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = retention_cohorts(ev).collect()
    WEEK_US = 7 * 24 * 3600 * 1_000_000
    w = {(r.cohort_week, r.week_offset): r.n_users for r in out}
    weeks = sorted({cw for cw, _ in w})
    # 2024-01-01..02 and 2024-01-08..09 land in consecutive epoch weeks
    # UNLESS the 4th crosses the boundary mid-sample; derive from data:
    import calendar
    wk = lambda d: (calendar.timegm(d.timetuple()) * 1_000_000) // WEEK_US
    w0, w1 = wk(datetime(2024, 1, 1)), wk(datetime(2024, 1, 8))
    assert w[(w0, 0)] == 2            # users 1 and 2 join in week0
    assert w[(w0, w1 - w0)] == 1      # only user 1 returns
    assert w[(w1, 0)] == 1            # user 3's cohort is week1
    assert sum(w.values()) == 4


def test_funnel_order_horizon_and_greedy(spark):
    """Funnel counts only in-order progressions, enforces the within_us
    horizon from step 1, and is greedy (earliest step times)."""
    from datetime import datetime

    from jassjr_spark.operators.events import funnel

    D = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        # user 1: full in-order funnel
        (0, D(1), 1, "signup", 0.0, ""), (1, D(2), 1, "view", 0.0, ""),
        (2, D(3), 1, "click", 0.0, ""), (3, D(4), 1, "purchase", 0.0, ""),
        # user 2: click BEFORE view -> stops after view
        (4, D(1), 2, "signup", 0.0, ""), (5, D(3), 2, "view", 0.0, ""),
        (6, D(2), 2, "click", 0.0, ""),
        # user 3: purchase outside the 14-day horizon from signup
        (7, D(1), 3, "signup", 0.0, ""), (8, D(2), 3, "view", 0.0, ""),
        (9, D(3), 3, "click", 0.0, ""), (10, D(20), 3, "purchase", 0.0, ""),
        # user 4: never signs up -> not even step 1
        (11, D(1), 4, "view", 0.0, ""),
        # user 5: greedy check — a second, later view must not rescue a
        # click that precedes BOTH views... (click at day 2 < first view
        # day 3) -> funnel stops at view even though view@day5 also exists
        (12, D(1), 5, "signup", 0.0, ""), (13, D(3), 5, "view", 0.0, ""),
        (14, D(5), 5, "view", 0.0, ""), (15, D(2), 5, "click", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = funnel(ev, steps=("signup", "view", "click", "purchase"),
                 within_us=14 * 86_400_000_000)
    got = {r.step: (r.event_type, r.n_users, r.conversion) for r in out.collect()}
    assert got[1] == ("signup", 4, 1.0)       # users 1, 2, 3, 5
    assert got[2] == ("view", 4, 1.0)         # all four progress to view
    assert got[3] == ("click", 2, 0.5)        # users 1 and 3 only
    assert got[4] == ("purchase", 1, 0.5)     # user 3 out of horizon


def test_daily_anomalies_hand_computed(spark):
    """One 30-event spike after ten 1-event days flags at z>3; a
    constant-volume user (variance 0) never flags."""
    import math
    from datetime import datetime, timedelta

    from jassjr_spark.operators.events import daily_anomalies

    rows, eid = [], 0
    base = datetime(2024, 1, 1)
    for day in range(10):          # user 1: one event/day for 10 days
        rows.append((eid, base + timedelta(days=day), 1, "a", 1.0, ""))
        eid += 1
    for i in range(30):            # then a 30-event spike on day 10
        rows.append((eid, base + timedelta(days=10, minutes=i), 1, "a", 1.0, ""))
        eid += 1
    for day in range(5):           # user 2: constant 2 events/day
        for i in range(2):
            rows.append((eid, base + timedelta(days=day, hours=i), 2, "a", 1.0, ""))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = daily_anomalies(ev, z=3.0).collect()
    assert len(out) == 1
    r = out[0]
    mean, var = 40 / 11, (10 + 900) / 11 - (40 / 11) ** 2
    want_z = round((30 - mean) / math.sqrt(var), 4)
    assert (r.user_id, r.n_events, r.z_score) == (1, 30, want_z)
    assert want_z > 3.0


def test_ev_rollup_lattice_consistency(spark, tmp_path):
    """Rollup cells sum to their subtotals and the grand total, and the
    plan is ONE Expand + aggregate (no per-grouping-set rescan)."""
    from jassjr_spark.driver_queries import q_ev_rollup

    from datetime import datetime
    rows = [
        (0, datetime(2024, 1, 1), 1, "a", 1.5, ""),
        (1, datetime(2024, 1, 1), 2, "a", 2.0, ""),
        (2, datetime(2024, 1, 2), 1, "b", 3.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = q_ev_rollup(spark, sf)
    rows_out = out.collect()
    cells = [r for r in rows_out if r.gid == 0]
    subs = {r.event_type: r for r in rows_out if r.gid == 1}
    total = [r for r in rows_out if r.gid == 3]
    assert len(total) == 1 and total[0].n_events == 3
    assert abs(total[0].sum_value - 6.5) < 1e-9
    assert subs["a"].n_events == 2 and abs(subs["a"].sum_value - 3.5) < 1e-9
    assert sum(r.n_events for r in cells) == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Expand") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_zero_step_rows_and_collision_guard(spark):
    """Empty funnel steps still emit rows (n_users=0, conversion 0.0 past
    the first empty step) — matching the SQL oracle's global counts; and
    asof_join refuses left inputs whose columns collide with its
    internals instead of silently corrupting them."""
    from datetime import datetime

    import pytest

    from jassjr_spark.operators.events import asof_join, funnel

    rows = [(0, datetime(2024, 1, 1), 1, "signup", 0.0, ""),
            (1, datetime(2024, 1, 2), 1, "view", 0.0, "")]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.step: (r.event_type, r.n_users, r.conversion)
           for r in funnel(ev).collect()}
    assert out == {
        1: ("signup", 1, 1.0), 2: ("view", 1, 1.0),
        3: ("click", 0, 0.0), 4: ("purchase", 0, 0.0),
    }

    bad_left = ev.withColumnRenamed("props", "side")
    with pytest.raises(ValueError, match="reserves"):
        asof_join(bad_left, ev)


def test_funnel_plan_single_pass(spark):
    """The fold funnel is ONE scan of the events + ONE hash shuffle
    (the per-user collect_list); the k-row tail is broadcast/local.
    Guards against regressing to the chained-union shape that
    re-executed its shared prefix per branch (11 scans for k=4)."""
    from datetime import datetime

    from jassjr_spark.operators.events import funnel

    rows = [(i, datetime(2024, 1, 1 + i % 20), i % 7,
             ["signup", "view", "click", "purchase"][i % 4], 0.0, "")
            for i in range(40)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    plan = funnel(ev)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    # events relation appears once, not once per step
    assert plan.count("Scan ExistingRDD[event_id") == 1


def test_streaming_event_analytics_equals_batch(spark, tmp_path):
    """foreachBatch recompute loop for the holistic event analytics
    (funnel / retention / anomalies): after each trigger the persisted
    reports equal the BATCH operators run over exactly the events landed
    so far — the stream's cumulative output is the batch run on the
    on-time subset (the same discipline the windowed-counts parity test
    applies)."""
    import datetime as dt
    import glob
    import random
    import shutil

    from jassjr_spark.operators.events import (
        asof_join, daily_anomalies, funnel, retention_cohorts,
    )
    from jassjr_spark.streaming.event_analytics import (
        start_event_analytics_stream,
    )

    schema = ("event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double, props string")
    types = ["signup", "view", "click", "purchase", "error"]
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)

    def mk_rows(start_eid, n):
        return [
            (eid, base + dt.timedelta(minutes=rng.randrange(0, 40_000)),
             rng.randrange(1, 15), rng.choice(types),
             round(rng.uniform(0, 9), 2), "")
            for eid in range(start_eid, start_eid + n)
        ]

    src = tmp_path / "easrc"
    src.mkdir()

    def land(rows, name):
        stage = tmp_path / f"ea_stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    b0, b1 = mk_rows(0, 250), mk_rows(250, 200)
    land(b0, "f0")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    store = str(tmp_path / "ea_store")
    out = str(tmp_path / "ea_out")
    # as-of reference table: per-user config values effective over time
    ref = spark.createDataFrame(
        [(u, base + dt.timedelta(days=7 * i), float(u * 10 + i))
         for u in range(1, 15) for i in range(4)],
        "user_id long, ts timestamp_ntz, value double",
    )
    q = start_event_analytics_stream(
        spark, stream, store, out,
        checkpoint=str(tmp_path / "ea_ckpt"),
        analytics=("funnel", "retention", "anomalies", "asof"),
        analytics_kwargs={"anomalies": {"z": 1.5}, "asof": {"right": ref}},
        trigger_available_now=False,
    )

    def reports_equal_batch(rows_so_far):
        ev = spark.createDataFrame(rows_so_far, schema)
        for name, op in [
            ("funnel", funnel),
            ("retention", retention_cohorts),
            ("anomalies", lambda e: daily_anomalies(e, z=1.5)),
            ("asof", lambda e: asof_join(e, ref)),
        ]:
            got = {tuple(r) for r in spark.read.parquet(f"{out}/{name}").collect()}
            want = {tuple(r) for r in op(ev).collect()}
            assert got == want, (name, len(got), len(want))

    try:
        q.processAllAvailable()
        reports_equal_batch(b0)
        land(b1, "f1")
        q.processAllAvailable()
        reports_equal_batch(b0 + b1)
    finally:
        q.stop()
    # a report the caller did not request is never written
    assert sorted(
        p.split("/")[-1] for p in glob.glob(f"{out}/*")
    ) == ["anomalies", "asof", "funnel", "retention"]
    # requesting asof without its reference table is refused up front
    import pytest as _pytest

    with _pytest.raises(ValueError, match="reference table"):
        start_event_analytics_stream(
            spark, stream, store, out,
            checkpoint=str(tmp_path / "ea_ckpt2"),
            analytics=("asof",),
        )


def test_refresh_ignores_partial_epoch_beyond_watermark(spark, tmp_path):
    """A segment whose epoch is past the APPLIED watermark is a crashed
    append awaiting foreachBatch replay: refresh_derived must neither
    count it nor advance the marker over it, so the replay's overwrite
    is recounted in full."""
    import shutil

    from jassjr_spark.sources.index_store import write_meta
    from jassjr_spark.streaming.incremental import (
        _read_refresh_marker, _read_watermark,
    )

    rows = _rows(60)
    path = str(tmp_path / "partial_idx")
    write_meta(spark, path, n_buckets=4)
    append_documents(
        spark, spark.createDataFrame(rows[:30], "docno string, content string"),
        path, n_buckets=4, epoch_id=0)
    refresh_derived(spark, path)
    append_documents(
        spark, spark.createDataFrame(rows[30:45], "docno string, content string"),
        path, n_buckets=4, epoch_id=1)
    refresh_derived(spark, path)
    good_dict = {
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/dictionary").collect()
    }
    base, applied = _read_watermark(spark, path)
    assert applied == 1

    # crash simulation: epoch 2's segment lands but the watermark write
    # (always last) never happened — snapshot the watermark dir before
    # the append and restore it after (the watermark table is
    # append-only, so a compensating row cannot rewind it)
    shutil.copytree(f"{path}/_watermark", f"{path}/_watermark.pre")
    append_documents(
        spark, spark.createDataFrame(rows[45:], "docno string, content string"),
        path, n_buckets=4, epoch_id=2)
    shutil.rmtree(f"{path}/_watermark")
    shutil.move(f"{path}/_watermark.pre", f"{path}/_watermark")
    spark.catalog.refreshByPath(f"{path}/_watermark")
    assert _read_watermark(spark, path) == (base, 1)

    refresh_derived(spark, path)
    assert _read_refresh_marker(spark, path) == 1  # never past the watermark
    partial_dict = {
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/dictionary").collect()
    }
    assert partial_dict == good_dict  # the partial epoch was not counted
    # stats must also exclude the partial epoch's doc_lengths
    assert int(spark.read.parquet(f"{path}/stats").first().n_docs) == 45

    # replay: the stream re-runs epoch 2 (not in the applied set), which
    # overwrites the segment and advances the watermark; the next refresh
    # counts it exactly once
    append_documents(
        spark, spark.createDataFrame(rows[45:], "docno string, content string"),
        path, n_buckets=4, epoch_id=2)
    refresh_derived(spark, path)
    final_dict = {
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/dictionary").collect()
    }
    full = {
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/postings")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"),
             F.sum("tf").cast("long").alias("cf"))
        .collect()
    }
    assert final_dict == full
    # staging dir is cleaned after the incremental swap
    import os
    assert not os.path.exists(f"{path}/dictionary_next")


def test_stream_attach_adopts_existing_meta(spark, tmp_path):
    """Attaching/restarting an indexing stream over an EXISTING store
    must adopt its _meta (bucket modulus AND block_span) rather than
    overwrite it, and an explicit mismatching n_buckets must raise."""
    import pytest as _pytest

    from jassjr_spark.sources.index_store import read_meta, write_meta
    from jassjr_spark.streaming.incremental import (
        refresh_blocks, start_indexing_stream,
    )

    rows = _rows(60)
    path = str(tmp_path / "attach_idx")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _stream():
        return (
            spark.readStream.schema("docno string, content string")
            .parquet(str(src) + "/*")
        )

    # first run creates the store: meta n_buckets=4, then blocks bake
    # block_span=64 into meta
    spark.createDataFrame(
        rows[:30], "docno string, content string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    q = start_indexing_stream(spark, _stream(), path, checkpoint=ckpt,
                              n_buckets=4)
    q.awaitTermination(180)
    refresh_derived(spark, path)
    refresh_blocks(spark, path, block_span=64)
    before = read_meta(spark, path)
    assert before["n_buckets"] == 4 and before["block_span"] == 64

    with _pytest.raises(ValueError, match="bucketed mod 4"):
        start_indexing_stream(
            spark, None, path, checkpoint=str(tmp_path / "ckpt0"),
            n_buckets=8)

    # restart over the same checkpoint with NO n_buckets: the store's
    # layout must be adopted and _meta must survive untouched
    spark.createDataFrame(
        rows[30:], "docno string, content string"
    ).coalesce(1).write.parquet(str(src / "b2"))
    q = start_indexing_stream(spark, _stream(), path, checkpoint=ckpt)
    q.awaitTermination(180)
    assert read_meta(spark, path) == before  # layout contract untouched
    # and the appended epoch really used the store's modulus: the index
    # still answers searches identically to a batch build of all rows
    refresh_derived(spark, path)
    inc = read_index(spark, path).cache()
    ref = build_index(spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )).cache()
    qs = synth_queries(6)
    assert search_lines(inc, spark, qs) == search_lines(ref, spark, qs)


def test_memory_sink_continuous_trigger_starts(spark, tmp_path):
    """sink="memory" with trigger_available_now=False must start a
    continuous-trigger query instead of crashing on
    trigger(availableNow=False) (which PySpark rejects)."""
    import datetime as dt

    from jassjr_spark.streaming.stateful import start_windowed_counts_stream

    base = dt.datetime(2024, 1, 1)
    src = tmp_path / "evsrc_cont"
    src.mkdir()
    spark.createDataFrame(
        [(0, base, "view", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(str(src / "b0"))
    q = start_windowed_counts_stream(
        stream, "wc_cont_sink", checkpoint=str(tmp_path / "ckpt"),
        sink="memory", trigger_available_now=False,
    )
    try:
        assert q.isActive  # the start itself is the regression
    finally:
        q.stop()

"""Delete tombstones for the persisted/LSM index: masking semantics,
versioned re-append, physical purge + stats correction at compaction,
tombstone GC, and the blocks guard.

Reference parity note: the reference engine has no deletes at all (its
index is write-once, JASSjr_index.cpp:201-218); this is an additive
production capability — contract documented in
streaming/incremental.delete_documents.
"""

import random

from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search_lines
from jassjr_spark.sources.index_store import (
    masked_docid_set,
    read_index,
    write_index,
    write_meta,
)
from jassjr_spark.streaming.incremental import (
    append_documents,
    compact_segments,
    delete_documents,
    refresh_derived,
)


def _rows(n):
    raw = synth_docs(n)
    return [(docno_of(r, p, c), t) for r, p, c, _, t in raw]


def _score_map(lines):
    """run lines -> {(qid, docno): score-string}"""
    out = {}
    for ln in lines:
        qid, _, docno, _rank, score, _tag = ln.split()
        out[(qid, docno)] = score
    return out


def _docnos(lines):
    return {ln.split()[2] for ln in lines}


def _batch_df(spark, rows, base=0):
    return spark.createDataFrame(
        [(base + i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )


def _append(spark, rows, path, n_buckets, epoch):
    batch = spark.createDataFrame(rows, "docno string, content string")
    append_documents(spark, batch, path, n_buckets=n_buckets, epoch_id=epoch)


def _dict_matches_raw(spark, path):
    """The maintained dictionary must always equal a recompute over the
    RAW physical postings files (masked-but-unpurged rows included — the
    documented staleness; purged rows subtracted by the compaction
    patch)."""
    raw = (
        spark.read.parquet(f"{path}/postings")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"),
             F.sum("tf").cast("long").alias("cf"))
    )
    got = {
        r.term: (int(r.df), int(r.cf))
        for r in spark.read.parquet(f"{path}/dictionary").collect()
    }
    want = {r.term: (int(r.df), int(r.cf)) for r in raw.collect()}
    assert got == want


def test_batch_store_delete_masks_without_rescoring(spark, tmp_path):
    """Mask-only semantics on a batch store: deleted docs vanish from
    results, surviving docs' scores are byte-unchanged (df/N/avgdl still
    count the deleted docs until a purge — per-doc BM25 independence)."""
    rows = _rows(60)
    path = str(tmp_path / "bidx")
    write_index(build_index(_batch_df(spark, rows)), path, n_buckets=8)
    qs = synth_queries(8)
    before = search_lines(read_index(spark, path), spark, qs)

    victims = [rows[3][0], rows[17][0], rows[41][0]]
    assert delete_documents(spark, path, victims) == 3
    after = search_lines(read_index(spark, path), spark, qs)

    assert _docnos(after).isdisjoint(victims)
    b, a = _score_map(before), _score_map(after)
    shared = set(b) & set(a)
    assert shared, "masked search lost every result"
    for k in shared:
        assert a[k] == b[k], f"surviving doc rescored: {k}"
    # every pre-delete result that wasn't a victim is still reachable
    # (deeper k admits new tail docs; it never loses survivors)
    deep = _score_map(search_lines(read_index(spark, path), spark, qs, k=60))
    for (qid, docno), score in b.items():
        if docno not in victims:
            assert deep[(qid, docno)] == score


def test_delete_then_reappend_resurrects(spark, tmp_path):
    """Versioned-delete ordering: a tombstone masks only segments with
    epoch <= tomb_epoch, so re-appending the docno later makes it visible
    again under a NEW docid."""
    rows = _rows(30)
    path = str(tmp_path / "inc")
    write_meta(spark, path, n_buckets=4)
    _append(spark, rows[:20], path, 4, epoch=0)
    refresh_derived(spark, path)

    victim, gone = rows[0][0], rows[5][0]
    delete_documents(spark, path, [victim, gone])  # tomb_epoch = 0
    idx = read_index(spark, path)
    live = {r.docno for r in idx.docids.collect()}
    assert victim not in live and gone not in live

    _append(spark, [rows[0]], path, 4, epoch=1)  # resurrect victim
    refresh_derived(spark, path)
    idx = read_index(spark, path)
    hits = idx.docids.filter(F.col("docno") == victim).collect()
    assert len(hits) == 1 and hits[0].docid == 20  # the NEW docid
    assert idx.docids.filter(F.col("docno") == gone).count() == 0
    qs = synth_queries(10)
    seen = _docnos(search_lines(idx, spark, qs, k=30))
    assert gone not in seen


def test_full_compaction_purges_and_corrects_stats(spark, tmp_path):
    """Full compaction physically removes tombstoned rows, patches the
    dictionary by the purged per-term delta, recomputes stats from the
    live doc_lengths — after which search is byte-identical to a fresh
    batch build of the surviving corpus (victims sit at the docid tail so
    surviving docids line up). Tombstones GC once every live segment is
    newer than their horizon."""
    rows = _rows(80)
    path = str(tmp_path / "cidx")
    write_meta(spark, path, n_buckets=8)
    for e, chunk in enumerate((rows[:30], rows[30:60], rows[60:])):
        _append(spark, chunk, path, 8, epoch=e)
    refresh_derived(spark, path)

    victims = [d for d, _ in rows[75:]]  # tail of the docid space
    delete_documents(spark, path, victims)  # tomb_epoch = 2
    assert compact_segments(spark, path, full=True) == 3

    raw_docids = spark.read.parquet(f"{path}/docids")
    assert raw_docids.filter(F.col("docno").isin(victims)).count() == 0
    assert raw_docids.count() == 75
    _dict_matches_raw(spark, path)
    stats = spark.read.parquet(f"{path}/stats").first()
    dl = spark.read.parquet(f"{path}/doc_lengths")
    assert stats.n_docs == 75
    assert stats.total_terms == dl.agg(F.sum("len")).first()[0]

    fresh = build_index(_batch_df(spark, rows[:75]))
    qs = synth_queries(12)
    assert search_lines(read_index(spark, path), spark, qs) == search_lines(
        fresh, spark, qs
    )

    # tombstones survive this compaction (tomb_epoch == merged label);
    # one more epoch + full compaction lifts min(live) past them => GC
    assert masked_docid_set(spark, path) is not None
    _append(spark, [("zfresh-1", "alpha beta gamma"),
                    ("zfresh-2", "delta epsilon")], path, 8, epoch=3)
    refresh_derived(spark, path)
    assert compact_segments(spark, path, full=True) == 2
    assert masked_docid_set(spark, path) is None  # _tombstones GC'd


def test_partial_compaction_purges_only_the_run(spark, tmp_path):
    """Tiered compaction purges tombstoned rows inside the merged run
    only; masked docs in untouched old segments stay physically present
    but masked, their tombstones retained, and the dictionary invariant
    (== raw postings aggregate) holds throughout."""
    rows = _rows(215)
    path = str(tmp_path / "pidx")
    write_meta(spark, path, n_buckets=4)
    _append(spark, rows[:200], path, 4, epoch=0)  # the big old segment
    for e, chunk in enumerate(
        (rows[200:205], rows[205:210], rows[210:215]), start=1
    ):
        _append(spark, chunk, path, 4, epoch=e)
    refresh_derived(spark, path)

    old_victim, run_victim = rows[2][0], rows[211][0]  # e0 and e3
    delete_documents(spark, path, [old_victim, run_victim])
    # ratio 1.5 at this scale: parquet per-file overhead compresses the
    # big/small byte gap (same calibration as the tiered-compaction test)
    merged = compact_segments(spark, path, size_ratio=1.5)
    assert merged == 3  # e1..e3 merged; the big e0 stays out of the run

    raw_docids = spark.read.parquet(f"{path}/docids")
    assert raw_docids.filter(F.col("docno") == run_victim).count() == 0
    assert raw_docids.filter(F.col("docno") == old_victim).count() == 1
    idx = read_index(spark, path)
    live = {r.docno for r in idx.docids.collect()}
    assert old_victim not in live and run_victim not in live
    assert masked_docid_set(spark, path) is not None  # tombstones retained
    _dict_matches_raw(spark, path)
    stats = spark.read.parquet(f"{path}/stats").first()
    assert stats.n_docs == 214  # run victim purged; old victim still counted


def test_blocks_load_refuses_pending_tombstones(spark, tmp_path):
    import pytest

    from jassjr_spark.plans.build_job import load_persisted

    rows = _rows(20)
    path = str(tmp_path / "widx")
    write_index(build_index(_batch_df(spark, rows)), path, n_buckets=4)
    write_meta(spark, path, n_buckets=4, block_span=128)
    delete_documents(spark, path, [rows[0][0]])
    with pytest.raises(ValueError, match="tombstones"):
        load_persisted(spark, path)


def test_upsert_replaces_in_place(spark, tmp_path):
    """upsert = tombstone old version + append new in one epoch: the new
    version is immediately visible, the old docid is gone from every
    reader, a replay of the applied epoch is a no-op, and the next full
    compaction physically purges the replaced rows."""
    from jassjr_spark.streaming.incremental import upsert_documents

    rows = _rows(40)
    path = str(tmp_path / "uidx")
    write_meta(spark, path, n_buckets=4)
    _append(spark, rows[:30], path, 4, epoch=0)
    refresh_derived(spark, path)

    batch = [(rows[5][0], "zzreplacement alpha"),
             (rows[12][0], "zzreplacement beta"),
             ("brandnew-doc", "zzreplacement gamma")]
    bdf = spark.createDataFrame(batch, "docno string, content string")
    assert upsert_documents(spark, bdf, path, epoch_id=1, n_buckets=4) == 3
    assert upsert_documents(spark, bdf, path, epoch_id=1, n_buckets=4) == 0
    refresh_derived(spark, path)

    idx = read_index(spark, path)
    for docno, _ in batch:
        hits = idx.docids.filter(F.col("docno") == docno).collect()
        assert len(hits) == 1 and hits[0].docid >= 30  # the NEW docid
    assert idx.docids.count() == 31  # 30 - 2 replaced + 3 upserted
    seen = _docnos(search_lines(idx, spark, ["zzreplacement"], k=10))
    assert seen == {d for d, _ in batch}
    _dict_matches_raw(spark, path)

    assert compact_segments(spark, path, full=True) == 2
    raw = spark.read.parquet(f"{path}/docids")
    assert raw.count() == 31  # replaced docids physically purged
    assert spark.read.parquet(f"{path}/stats").first().n_docs == 31
    _dict_matches_raw(spark, path)


def test_merge_with_tombstoned_shard_purges(spark, tmp_path):
    """merge_indexes doubles as the purge for tombstoned shards: the
    masked shard reads feed the merge, and dictionary/stats are
    recomputed from the merged tables instead of summed from shard
    scalars — so the destination equals a fresh build of the surviving
    corpus (victims at the shard tail keep surviving docids aligned)."""
    from jassjr_spark.sources.index_store import merge_indexes

    rows = _rows(120)
    a_rows, b_rows = rows[:60], rows[60:]
    paths = []
    for name, shard in (("sha", a_rows), ("shb", b_rows)):
        p = str(tmp_path / name)
        write_index(build_index(_batch_df(spark, shard)), p, n_buckets=8)
        paths.append(p)
    victims = [d for d, _ in b_rows[-6:]]
    delete_documents(spark, paths[1], victims)

    dst = str(tmp_path / "merged")
    merge_indexes(spark, paths, dst)
    merged = read_index(spark, dst)
    assert spark.read.parquet(f"{dst}/docids").filter(
        F.col("docno").isin(victims)
    ).count() == 0
    assert masked_docid_set(spark, dst) is None  # no tombstones copied
    _dict_matches_raw(spark, dst)

    ref = build_index(_batch_df(spark, a_rows + b_rows[:-6]))
    qs = synth_queries(10)
    assert search_lines(merged, spark, qs) == search_lines(ref, spark, qs)
    assert merged.scalar_stats() == ref.scalar_stats()


def test_search_stream_respects_deletes(spark, tmp_path):
    """A streaming query evaluator bound to a masked read_index never
    emits tombstoned docs — deletion reaches every consumer of the Index
    handle, including the continuous-search path."""
    from jassjr_spark.streaming.search_stream import start_search_stream

    rows = _rows(40)
    path = str(tmp_path / "sidx")
    write_index(build_index(_batch_df(spark, rows)), path, n_buckets=4)
    victims = [rows[1][0], rows[9][0]]
    delete_documents(spark, path, victims)
    idx = read_index(spark, path).cache()

    src = tmp_path / "qsrc"
    src.mkdir()
    (src / "queries.txt").write_text("\n".join(synth_queries(6)) + "\n")
    stream = spark.readStream.schema("line string").text(str(src))
    out = str(tmp_path / "runs")
    q = start_search_stream(
        spark, stream.withColumnRenamed("value", "line"), idx, out,
        checkpoint=str(tmp_path / "sckpt"), k=40,
    )
    q.awaitTermination(120)
    emitted = {r.docno for r in spark.read.parquet(out).collect()}
    assert emitted and emitted.isdisjoint(victims)


def test_random_delete_interleavings_hold_invariants(spark, tmp_path):
    """Seeded random interleavings of append / delete / refresh / compact:
    the live-docno set matches a driver-side model applying the same LSM
    semantics, and the dictionary always equals the raw-postings
    recompute (purge patches included)."""
    all_rows = _rows(200)
    for seed in range(3):
        rng = random.Random(seed)
        path = str(tmp_path / f"rnd_{seed}")
        write_meta(spark, path, n_buckets=4)
        live, deleted, cursor, epoch = {}, [], 0, 0
        for _ in range(10):
            op = rng.choice(["append", "append", "delete", "refresh",
                             "compact"])
            if op == "append":
                chunk = all_rows[cursor:cursor + rng.randint(2, 6)]
                cursor += len(chunk)
                if deleted and rng.random() < 0.5:
                    back = deleted.pop()
                    chunk = chunk + [(back, dict(all_rows)[back])]
                if not chunk:
                    continue
                _append(spark, chunk, path, 4, epoch=epoch)
                epoch += 1
                live.update(chunk)
            elif op == "delete" and live:
                victims = rng.sample(sorted(live), min(2, len(live)))
                delete_documents(spark, path, victims)
                for v in victims:
                    live.pop(v)
                    deleted.append(v)
            elif op == "refresh" and epoch:
                refresh_derived(spark, path)
            elif op == "compact" and epoch:
                refresh_derived(spark, path)
                compact_segments(spark, path, size_ratio=1.5)
        if not epoch:
            continue
        refresh_derived(spark, path)
        idx = read_index(spark, path)
        got = {r.docno for r in idx.docids.collect()}
        assert got == set(live), f"seed {seed}: live set diverged"
        _dict_matches_raw(spark, path)


def test_remerge_of_purged_merge_has_no_docid_collisions(spark, tmp_path):
    """A purged merge keeps surviving docids (holes: max docid+1 >
    n_docs). Re-merging that output with another shard must offset by
    the docid SPAN, never n_docs — an n_docs offset would overlap the
    ranges and silently mix two documents' rows under one docid."""
    from jassjr_spark.sources.index_store import merge_indexes

    rows = _rows(120)
    a_rows, b_rows, c_rows = rows[:40], rows[40:80], rows[80:]
    pa, pb, pc = (str(tmp_path / n) for n in ("sha", "shb", "shc"))
    write_index(build_index(_batch_df(spark, a_rows)), pa, n_buckets=8)
    write_index(build_index(_batch_df(spark, b_rows)), pb, n_buckets=8)
    write_index(build_index(_batch_df(spark, c_rows)), pc, n_buckets=8)
    # tombstone 5 docs in the MIDDLE of shard b, so the purged merge's
    # docid space has interior holes and its max docid exceeds n_docs-1
    victims = [d for d, _ in b_rows[10:15]]
    delete_documents(spark, pb, victims)
    m1 = str(tmp_path / "m1")
    merge_indexes(spark, [pa, pb], m1)
    n1 = read_index(spark, m1).scalar_stats()["n_docs"]
    assert n1 == 75  # purged
    max1 = spark.read.parquet(f"{m1}/docids").agg(F.max("docid")).first()[0]
    assert max1 == 79  # holes: surviving ids keep their values

    m2 = str(tmp_path / "m2")
    merge_indexes(spark, [m1, pc], m2)
    ids = spark.read.parquet(f"{m2}/docids")
    assert ids.count() == ids.select("docid").distinct().count() == 115
    # merged dictionary df stays LONG (no int drift/wraparound)
    assert dict(spark.read.parquet(f"{m2}/dictionary").dtypes)["df"] == \
        "bigint"
    merged = read_index(spark, m2)
    ref = build_index(
        _batch_df(spark, a_rows + b_rows[:10] + b_rows[15:] + c_rows))
    qs = synth_queries(10)
    assert search_lines(merged, spark, qs) == search_lines(ref, spark, qs)
    assert merged.scalar_stats() == ref.scalar_stats()


def test_write_index_clears_stale_tombstones(spark, tmp_path):
    """Rebuilding a store in place with write_index must not let a
    previous life's _tombstones silently mask freshly written docs."""
    rows = _rows(30)
    path = str(tmp_path / "rebuilt")
    write_index(build_index(_batch_df(spark, rows)), path, n_buckets=4)
    victim = rows[0][0]
    delete_documents(spark, path, [victim])
    assert read_index(spark, path).docids.filter(
        F.col("docno") == victim).count() == 0
    # in-place rebuild: the full corpus returns, including the victim
    write_index(build_index(_batch_df(spark, rows)), path, n_buckets=4)
    assert masked_docid_set(spark, path) is None
    assert read_index(spark, path).docids.filter(
        F.col("docno") == victim).count() == 1

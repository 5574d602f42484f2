"""Checkpoint-resumable build: crash -> resume skips completed stages;
fingerprint change invalidates; lineage + metrics tables are written."""

import pytest

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.search import search_lines
from jassjr_spark.plans.build_job import build_persisted_index, load_persisted
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.sources.index_store import read_index


def _docs_df(spark, n=300):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    return spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )


def test_crash_resume(spark, tmp_path):
    docs = _docs_df(spark)
    path = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_persisted_index(spark, docs, path, fail_after_stage="postings")
    report = build_persisted_index(spark, docs, path)
    assert set(report.skipped) == {"docids", "postings"}
    assert report.executed == ["doc_lengths", "dictionary", "stats", "blocks",
                               "block_stats"]

    # the resumed index answers queries identically to an in-memory build
    idx = read_index(spark, path).cache()
    mem = build_index(docs).cache()
    qs = synth_queries(10)
    assert search_lines(idx, spark, qs) == search_lines(mem, spark, qs)

    # full re-run with unchanged input: everything skips
    report2 = build_persisted_index(spark, docs, path)
    assert report2.executed == []
    assert len(report2.skipped) == 7

    # lineage + metrics tables exist and carry per-bucket rows
    lineage = spark.read.parquet(f"{path}/_lineage")
    assert lineage.filter("status = 'ok'").count() >= 7
    metrics = spark.read.parquet(f"{path}/_metrics")
    kinds = {r.stage for r in metrics.select("stage").distinct().collect()}
    assert {"postings", "postings_max_df", "blocks"} <= kinds


def test_fingerprint_invalidation(spark, tmp_path):
    docs = _docs_df(spark)
    path = str(tmp_path / "idx2")
    build_persisted_index(spark, docs, path)
    changed = _docs_df(spark).limit(250)  # different corpus
    report = build_persisted_index(spark, changed, path)
    assert report.skipped == []
    assert len(report.executed) == 7


def test_wand_over_persisted(spark, tmp_path):
    docs = _docs_df(spark, 400)
    path = str(tmp_path / "idx3")
    build_persisted_index(spark, docs, path, block_span=64)
    idx, blocks = load_persisted(spark, path)
    idx = idx.cache()
    s = idx.scalar_stats()
    from jassjr_spark.operators.search import parse_queries, search, to_trec_lines
    from jassjr_spark.operators.wand import wand_search

    q = parse_queries(spark, synth_queries(10))
    naive = to_trec_lines(search(idx, q, k=20, stats=s))
    run = wand_search(idx, blocks, q, k=20, stats=s, block_span=64,
                      fallback_keep_frac=1.0)  # force the blocks I/O path
    wand = to_trec_lines(run)
    assert wand == naive

    # plan gates: the WAND path scores from the compressed blocks ONLY —
    # no scan of {path}/postings anywhere in the final plan — and the kept
    # block_id set is pushed into the blocks scan (pruning gates I/O)
    plan = run._jdf.queryExecution().executedPlan().toString()
    assert f"{path}/blocks" in plan
    assert f"{path}/postings" not in plan
    assert "block_id" in plan.split("PushedFilters", 1)[1][:4000]


def test_blocks_format_versioning(spark, tmp_path):
    """A pre-dl-payload store (format 1, or a pre-versioning _meta with
    blocks) must be refused with an actionable message, not fail with an
    opaque decode error; current-format stores load fine."""
    import pytest as _pytest

    from jassjr_spark.plans.build_job import load_persisted
    from jassjr_spark.sources.index_store import (
        BLOCKS_FORMAT, read_meta, write_meta,
    )

    path = str(tmp_path / "old_store")
    # legacy writer: _meta without a blocks_format column, blocks present
    spark.createDataFrame(
        [(8, 512)], "n_buckets int, block_span int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_meta")
    assert read_meta(spark, path)["blocks_format"] == 1
    with _pytest.raises(ValueError, match="rebuild the blocks|Rebuild the blocks"):
        load_persisted(spark, path)

    # current writer records the live format and loads cleanly
    path2 = str(tmp_path / "new_store")
    write_meta(spark, path2, 8, block_span=512)
    meta = read_meta(spark, path2)
    assert meta["blocks_format"] == BLOCKS_FORMAT
    # no blocks at all -> format irrelevant, nothing raised
    path3 = str(tmp_path / "no_blocks")
    write_meta(spark, path3, 8)
    assert read_meta(spark, path3)["blocks_format"] == 0


def test_merge_indexes_matches_full_build(spark, tmp_path):
    """Sharded build: FOUR persisted shard indexes merged with one k-way
    merge_indexes call must answer queries identically to one batch build
    over the concatenated corpus, and the postings merge plan must
    contain NO Exchange (the bucket layout's zero-shuffle merge promise —
    a 1000-shard build is one merge generation, not a binary tree)."""
    from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.operators.search import search_lines
    from jassjr_spark.sources.index_store import (
        merge_indexes, merged_postings, read_index, read_meta, write_index,
    )

    raw = synth_docs(160)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    q = len(rows) // 4

    def persisted(shard, name):
        sdf = spark.createDataFrame(
            [(i, d, c) for i, (d, c) in enumerate(shard)],
            "docid long, docno string, content string",
        )
        path = str(tmp_path / name)
        write_index(build_index(sdf), path, n_buckets=8)
        return path

    shards = [rows[i * q:(i + 1) * q] for i in range(4)]
    paths = [persisted(s, f"shard_{i}") for i, s in enumerate(shards)]
    dst = str(tmp_path / "merged")
    merge_indexes(spark, paths, dst, check_docnos=True)
    assert read_meta(spark, dst)["n_buckets"] == 8

    merged = read_index(spark, dst).cache()
    full = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    ref = build_index(full).cache()
    queries = synth_queries(8)
    assert search_lines(merged, spark, queries) == search_lines(ref, spark, queries)
    assert merged.scalar_stats() == ref.scalar_stats()

    # zero-shuffle plan gate on the 4-way postings merge
    idxs = [read_index(spark, p) for p in paths]
    plan = merged_postings(idxs, offsets=[0, q, 2 * q, 3 * q])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # legacy 2-ary form still works and matches the k-way result
    dst2 = str(tmp_path / "merged2")
    merge_indexes(spark, paths[0], paths[1], dst2)
    m2 = read_index(spark, dst2)
    assert m2.scalar_stats()["n_docs"] == 2 * q

    # duplicate docnos across shards are refused under check_docnos
    import pytest as _pytest
    with _pytest.raises(ValueError, match="docnos"):
        merge_indexes(spark, [paths[0], paths[0]],
                      str(tmp_path / "dup"), check_docnos=True)

    # mismatched bucket moduli are refused
    pc = str(tmp_path / "shard_c")
    sdf = spark.createDataFrame(
        [(0, "X", "one two")], "docid long, docno string, content string"
    )
    write_index(build_index(sdf), pc, n_buckets=4)
    with _pytest.raises(ValueError, match="moduli"):
        merge_indexes(spark, [paths[0], pc], str(tmp_path / "bad"))


def test_fsck_clean_index_passes_and_corruption_flags(spark, tmp_path):
    """fsck over a freshly-written index is all-ok; targeted corruptions
    flag exactly the violated invariants (report, not raise)."""
    from pyspark.sql import functions as F

    from jassjr_spark.fixtures import docno_of, synth_docs
    from jassjr_spark.operators.index_build import build_index
    from jassjr_spark.sources.index_store import fsck_index, write_index

    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in synth_docs(60)]
    docs = spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )
    idx = build_index(docs)
    path = str(tmp_path / "fsck_idx")
    write_index(idx, path, n_buckets=4)

    rep = {r["check"]: r for r in fsck_index(spark, path)}
    assert all(r["ok"] for r in rep.values()), rep
    assert set(rep) >= {
        "meta", "docids_unique", "docids_dense", "doc_lengths_cover",
        "postings_docids", "postings_dl", "dictionary", "stats",
        "bucket_layout", "tf_positive",
    }

    # corruption 1: drop a docid row -> dense/cover/orphan checks trip
    # (materialize before overwriting the directory being read)
    kept = [
        (r.docid, r.docno)
        for r in spark.read.parquet(f"{path}/docids").collect()
        if r.docid != 0
    ]
    spark.createDataFrame(kept, "docid long, docno string") \
        .write.mode("overwrite").parquet(f"{path}/docids")
    rep2 = {r["check"]: r for r in fsck_index(spark, path)}
    assert not rep2["docids_dense"]["ok"]
    assert not rep2["doc_lengths_cover"]["ok"]
    assert not rep2["postings_docids"]["ok"]
    assert rep2["dictionary"]["ok"]  # postings untouched

    # restore, then corruption 2: tamper a dictionary df
    spark.createDataFrame(
        [(i, d) for i, (d, _) in enumerate(rows)], "docid long, docno string"
    ).write.mode("overwrite").parquet(f"{path}/docids")
    drows = [
        (r.term, r.df, r.cf)
        for r in spark.read.parquet(f"{path}/dictionary").collect()
    ]
    assert drows, "corpus must have a vocabulary"
    t0, df0, cf0 = drows[0]
    drows[0] = (t0, df0 + 1, cf0)
    spark.createDataFrame(drows, "term string, df long, cf long") \
        .write.mode("overwrite").parquet(f"{path}/dictionary")
    rep3 = {r["check"]: r for r in fsck_index(spark, path)}
    assert not rep3["dictionary"]["ok"]
    assert "term_mismatches=1" in rep3["dictionary"]["detail"] \
        or not rep3["stats"]["ok"]
    assert rep3["docids_dense"]["ok"]


def test_fsck_block_stats_staleness(spark, tmp_path):
    """The optional block_stats table: fsck passes a fresh build, flags a
    stats row contradicting its blocks (the staleness that would silently
    mis-steer the driver-local WAND gate), and tolerates a floored table
    (terms missing from stats are a deployment choice, not corruption)."""
    from pyspark.sql import functions as F

    from jassjr_spark.sources.index_store import fsck_index

    docs = _docs_df(spark, 200)
    path = str(tmp_path / "fsck_bs")
    build_persisted_index(spark, docs, path, n_buckets=4, block_span=64)

    rep = {r["check"]: r for r in fsck_index(spark, path)}
    assert rep["block_stats"]["ok"], rep["block_stats"]

    # floored table: drop the most-blocked half of terms -> still ok
    st = spark.read.parquet(f"{path}/block_stats").collect()
    floor = sorted(r["n_blocks"] for r in st)[len(st) // 2]
    kept = [r for r in st if r["n_blocks"] <= floor]
    spark.createDataFrame(kept).write.mode("overwrite").parquet(
        f"{path}/block_stats")
    rep2 = {r["check"]: r for r in fsck_index(spark, path)}
    assert rep2["block_stats"]["ok"], rep2["block_stats"]

    # stale row: inflate one term's n_blocks -> flagged
    bad = [dict(r.asDict(), n_blocks=r["n_blocks"] + 7) if i == 0
           else r.asDict() for i, r in enumerate(kept)]
    spark.createDataFrame(bad).write.mode("overwrite").parquet(
        f"{path}/block_stats")
    rep3 = {r["check"]: r for r in fsck_index(spark, path)}
    assert not rep3["block_stats"]["ok"]
    assert "stale_terms=1" in rep3["block_stats"]["detail"]

    # absent table (pre-stage store): check simply doesn't appear
    import shutil
    shutil.rmtree(f"{path}/block_stats")
    rep4 = {r["check"]: r for r in fsck_index(spark, path)}
    assert "block_stats" not in rep4

"""Block-max WAND over the LIVE incremental index: per-epoch blocks
segments (refresh_blocks), avgdl-drift rank safety via the
(max_tf, min_dl) query-time bound, and compaction invalidation."""

import random

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.operators.search import parse_queries, search, to_trec_lines
from jassjr_spark.operators.wand import wand_search
from jassjr_spark.plans.build_job import load_persisted
from jassjr_spark.sources.index_store import write_meta
from jassjr_spark.streaming.incremental import (
    _epoch_dirs,
    append_documents,
    compact_segments,
    refresh_blocks,
    refresh_derived,
)

SPAN = 64  # epochs of 50 docs => block ids span epoch boundaries


def _rows(n):
    raw = synth_docs(n)
    return [(docno_of(r, p, c), t) for r, p, c, _, t in raw]


def _append(spark, rows, path, epoch):
    batch = spark.createDataFrame(rows, "docno string, content string")
    append_documents(spark, batch, path, n_buckets=4, epoch_id=epoch)


def _wand_equals_naive(spark, path, k=20):
    idx, blocks = load_persisted(spark, path)
    s = idx.scalar_stats()
    q = parse_queries(spark, synth_queries(8))
    naive = to_trec_lines(search(idx, q, k=k, stats=s))
    wand = to_trec_lines(
        wand_search(idx, blocks, q, k=k, stats=s, block_span=SPAN,
                    fallback_keep_frac=1.0)  # force the blocks I/O path
    )
    assert wand == naive
    return naive


def test_stream_maintains_blocks(spark, tmp_path):
    """start_indexing_stream(maintain_blocks=True) keeps per-epoch WAND
    blocks current without any manual maintenance call: after the stream
    drains, every postings epoch has a blocks segment and forced-blocks
    WAND equals naive byte-for-byte."""
    from jassjr_spark.streaming.incremental import start_indexing_stream

    rows = _rows(90)
    src = tmp_path / "src"
    src.mkdir()
    for i, chunk in enumerate((rows[:30], rows[30:60], rows[60:])):
        spark.createDataFrame(
            chunk, "docno string, content string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema("docno string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    path = str(tmp_path / "stream_blk")
    q = start_indexing_stream(
        spark, stream, path, checkpoint=str(tmp_path / "ckpt"),
        n_buckets=4, maintain_blocks=True, block_span=SPAN,
    )
    q.awaitTermination(180)

    assert _epoch_dirs(spark, f"{path}/blocks") == _epoch_dirs(
        spark, f"{path}/postings"
    ) != []
    _wand_equals_naive(spark, path)


def test_wand_over_live_incremental_index(spark, tmp_path):
    rows = _rows(150)
    path = str(tmp_path / "inc_blocks")
    write_meta(spark, path, n_buckets=4)
    for e in range(3):
        _append(spark, rows[e * 50:(e + 1) * 50], path, epoch=e)
    refresh_derived(spark, path)
    assert refresh_blocks(spark, path, block_span=SPAN) == 3
    assert refresh_blocks(spark, path) == 0  # idempotent; span from _meta
    _wand_equals_naive(spark, path)

    # avgdl drift: a fourth epoch of much longer docs raises avgdl, so
    # the three existing block segments' baked max_impact UNDER-bounds
    # current contributions — the recomputed (max_tf, min_dl) bound keeps
    # WAND == naive byte-identical anyway
    rng = random.Random(9)
    vocab = [t for _, c in rows[:5] for t in c.split()][:40] or ["filler"]
    long_docs = [
        (f"zlong-{i:04d}", " ".join(rng.choice(vocab) for _ in range(400)))
        for i in range(30)
    ]
    _append(spark, long_docs, path, epoch=3)
    refresh_derived(spark, path)
    assert refresh_blocks(spark, path) == 1  # only the new epoch is built
    _wand_equals_naive(spark, path)

    # compaction supersedes the merged run's blocks segments; refresh
    # rebuilds exactly one from the merged postings and WAND still agrees
    assert compact_segments(spark, path, full=True) == 4
    assert _epoch_dirs(spark, f"{path}/blocks") == []
    assert refresh_blocks(spark, path) == 1
    assert _epoch_dirs(spark, f"{path}/blocks") == _epoch_dirs(
        spark, f"{path}/postings"
    )
    _wand_equals_naive(spark, path)


def test_maxscore_local_bounds_over_live_multi_epoch_store(spark, tmp_path):
    """Driver-resident MaxScore bounds over a REAL multi-epoch LSM store:
    epochs appended at different corpus sizes bake their blocks under
    different avgdl0s (the refresh_blocks contract), so collect_block_
    stats must surface a widened avgdl0_range and the exact per-term
    imp_per_avgdl0 scalars — and maxscore_search with those resident
    stats must stay byte-identical to the naive engine."""
    from jassjr_spark.functions.compression import (
        build_block_stats, collect_block_stats,
    )
    from jassjr_spark.operators.maxscore import maxscore_search

    rows = _rows(150)
    path = str(tmp_path / "inc_ms")
    write_meta(spark, path, n_buckets=4)
    _append(spark, rows[:50], path, epoch=0)
    refresh_derived(spark, path)
    assert refresh_blocks(spark, path, block_span=SPAN) == 1

    # second epoch of much longer docs: avgdl moves, so its blocks bake
    # under a different avgdl0 than epoch 0's
    rng = random.Random(17)
    vocab = [t for _, c in rows[:5] for t in c.split()][:40] or ["filler"]
    _append(spark, [
        (f"zlong-{i:04d}", " ".join(rng.choice(vocab) for _ in range(300)))
        for i in range(40)
    ], path, epoch=1)
    refresh_derived(spark, path)
    assert refresh_blocks(spark, path) == 1

    idx, blocks = load_persisted(spark, path)
    s = idx.scalar_stats()
    bstats = collect_block_stats(build_block_stats(blocks))
    lo, hi = bstats["avgdl0_range"]
    assert lo < hi, "two epochs at different corpus shapes must differ"
    assert bstats["avgdl0"] is None
    assert all(v[3] is not None for v in bstats["terms"].values())

    q = parse_queries(spark, synth_queries(8))
    naive = to_trec_lines(search(idx, q, k=10, stats=s))
    got = to_trec_lines(
        maxscore_search(idx, blocks, q, k=10, stats=s, block_stats=bstats)
    )
    assert got == naive

"""Physical-plan quality gates: the optimizations we claim must be visible
in the executed plan, not just intended."""

from pyspark.sql import functions as F

from jassjr_spark.fixtures import docno_of, synth_docs, synth_queries
from jassjr_spark.functions.tokenize import doc_term_frequencies
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import parse_queries, search
from jassjr_spark.sources.index_store import read_index, write_index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=200):
    raw = synth_docs(n)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    return spark.createDataFrame(
        [(i, d, c) for i, (d, c) in enumerate(rows)],
        "docid long, docno string, content string",
    )


def test_tokenizer_plan_is_map_only(spark):
    """The Arrow tokenize+combine must introduce NO shuffle: at 10^12 docs
    an exchange here is petabytes of network."""
    p = _plan(doc_term_frequencies(_docs(spark)))
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_search_plan_broadcasts_queries_and_pushes_terms(spark, tmp_path):
    idx = build_index(_docs(spark, 300)).cache()
    path = str(tmp_path / "planidx")
    write_index(idx, path)
    on_disk = read_index(spark, path)
    q = parse_queries(spark, ["51 the postings arrow"])
    run = search(on_disk, q, k=10)
    p = _plan(run)
    # query side broadcast, never a sort-merge join against tiny queries
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    # term predicate reaches the parquet scan; bucket partition pruning on
    assert "PushedFilters" in p
    assert "bucket" in p


def test_topk_query_uses_take_ordered(spark):
    """orderBy().limit() on a single ranking must plan TakeOrderedAndProject
    (per-partition top-k + merge), not a global sort."""
    idx = build_index(_docs(spark, 200)).cache()
    top = idx.dictionary.orderBy(F.col("cf").desc(), F.col("term")).limit(5)
    assert "TakeOrderedAndProject" in _plan(top)


def test_assign_docids_no_global_sort(spark):
    """docid assignment must parallelize: identical output to a global
    row_number window, with NO single-partition exchange in the plan."""
    from pyspark.sql import Window

    from jassjr_spark.operators.index_build import assign_docids

    raw = synth_docs(300)
    docs = spark.createDataFrame(
        [(docno_of(r, p, c), t) for r, p, c, _, t in raw],
        "docno string, content string",
    )
    got = assign_docids(docs, ["docno"])
    w = Window.orderBy("docno")
    want = docs.withColumn(
        "docid", F.row_number().over(w).cast("long") - 1
    )
    assert {(r.docid, r.docno) for r in got.collect()} == {
        (r.docid, r.docno) for r in want.collect()
    }
    assert "Exchange SinglePartition" not in _plan(got)
    # offset continuation (streaming increments)
    got2 = assign_docids(docs, ["docno"], base=1000)
    assert got2.agg(F.min("docid")).first()[0] == 1000


def test_read_trec_is_distributed(spark, tmp_path):
    """Multi-file TREC ingest: content stays in executors (RDD-backed
    DataFrame, no driver collect of documents) and docids follow
    cumulative filename order."""
    from jassjr_spark.sources.trec import read_trec, render_trec

    d = tmp_path / "trec"
    d.mkdir()
    raw = synth_docs(60)
    rows = [(docno_of(r, p, c), t) for r, p, c, _, t in raw]
    for i, chunk in enumerate((rows[:25], rows[25:40], rows[40:])):
        (d / f"part{i:02d}.xml").write_text(render_trec(chunk))
    got = read_trec(spark, str(d))
    want = [(i, dn, ct) for i, (dn, ct) in enumerate(rows)]
    assert [(r.docid, r.docno, r.content) for r in
            got.orderBy("docid").collect()] == want
    # the source is an RDD flatMap over files, not a driver-side
    # createDataFrame of parsed rows: the logical plan shows a scan of an
    # existing (distributed) RDD rather than a LocalRelation literal table
    logical = got._jdf.queryExecution().logical().toString()
    assert "LocalRelation" not in logical


def test_dedup_exact_partial_aggregation(spark):
    """The sha groupBy must show two-phase hash aggregation (map-side
    partial combine before the exchange)."""
    from jassjr_spark.operators.dedup import exact_duplicates

    p = _plan(exact_duplicates(_docs(spark, 200).select("docid", "content")))
    assert p.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in p


def test_assign_docids_partitioning_is_pinned(spark, tmp_path):
    """The staged range-partitioned frame is CHECKPOINTED, not cached:
    repartitionByRange samples its bounds, so a recomputed exchange could
    assign rows to different partitions than the counts pass saw
    (duplicate/skipped docids). The result plan must therefore read
    pinned partitions (ExistingRDD), never the live exchange; with a
    context checkpoint dir set, the reliable-checkpoint path is used and
    output is identical."""
    from jassjr_spark.operators.index_build import assign_docids

    raw = synth_docs(120)
    docs = spark.createDataFrame(
        [(docno_of(r, p, c), t) for r, p, c, _, t in raw],
        "docno string, content string",
    )
    got = assign_docids(docs, ["docno"])
    assert "ExistingRDD" in _plan(got)  # pinned partitions, no re-exchange
    want = {(r.docid, r.docno) for r in got.collect()}

    sc = spark.sparkContext
    assert not sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        staged: list = []
        reliable = assign_docids(docs, ["docno"], cleanup=staged)
        assert {(r.docid, r.docno) for r in reliable.collect()} == want

        # Spark never deletes reliable-checkpoint files by default, so a
        # streaming caller leaks one batch-sized dir per epoch unless the
        # cleanup handle removes them (ADVICE r3): after unpersist the
        # checkpoint dir must hold no rdd-* data dirs
        def rdd_dirs():
            import glob

            return glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))

        assert rdd_dirs(), "expected reliable checkpoint files on disk"
        for h in staged:
            h.unpersist()
        assert not rdd_dirs(), "checkpoint files leaked after cleanup"
    finally:
        # unset so the shared session's later tests keep the (faster)
        # localCheckpoint path
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_snippets_plan_broadcasts_run_into_content(spark):
    """The KWIC join must broadcast the tiny top-k run, never shuffle the
    corpus content."""
    from jassjr_spark.operators.snippets import snippets

    docs = _docs(spark, 200)
    idx = build_index(docs, prepend_docno=False).cache()
    q = spark.createDataFrame(
        [(1, 0, "the")], "query_id long, pos int, term string"
    )
    run = search(idx, q, k=5)
    out = snippets(run, docs.select("docno", "content"), q, id_col="docno")
    assert "BroadcastHashJoin" in _plan(out)


def test_negated_plan_prunes_both_postings_fetches(spark, tmp_path):
    """Positive AND negated term lists must reach the store as pushed
    term filters (two pruned fetches, no full postings scan)."""
    from jassjr_spark.operators.search import search_negated

    idx = build_index(_docs(spark, 200)).cache()
    path = str(tmp_path / "negidx")
    write_index(idx, path)
    on_disk = read_index(spark, path)
    q = spark.createDataFrame(
        [(1, 0, "postings")], "query_id long, pos int, term string"
    )
    neg = spark.createDataFrame([(1, "arrow")], "query_id long, term string")
    p = _plan(search_negated(on_disk, q, neg, k=5))
    assert "PushedFilters" in p
    # both the scoring fetch and the exclusion fetch push their term
    assert p.count("isnotnull(term") >= 2 or p.count("term#") >= 2
    assert "BroadcastHashJoin" in p


def test_federated_gather_has_no_corpus_exchange(spark):
    """The gather union re-rank must operate on <= k-rows-per-shard runs:
    the only window in the plan sees the unioned runs, and the query
    side joins stay broadcast."""
    from jassjr_spark.operators.federated import federated_search

    docs = _docs(spark, 200)
    shards = [
        build_index(
            docs.filter(F.col("docid") % 2 == m), prepend_docno=False
        ).cache()
        for m in range(2)
    ]
    q = spark.createDataFrame(
        [(1, 0, "the")], "query_id long, pos int, term string"
    )
    p = _plan(federated_search(shards, q, k=5))
    assert "BroadcastHashJoin" in p
    assert "Union" in p


def test_bm25f_postings_meet_in_one_join_per_field(spark):
    """The fielded combine is a full-outer join on (term, docid) plus the
    broadcast query probe — the query side must never sort-merge."""
    from jassjr_spark.operators.bm25f import (
        Field, bm25f_search, build_fielded_index,
    )

    docs = _docs(spark, 100).withColumn(
        "path", F.concat(F.lit("src/p"), F.col("docid"))
    )
    fidx = build_fielded_index(
        docs, (Field("content", 1.0, 0.4), Field("path", 2.0, 0.5))
    ).cache()
    q = spark.createDataFrame(
        [(1, 0, "the")], "query_id long, pos int, term string"
    )
    p = _plan(bm25f_search(fidx, q, k=5))
    assert "BroadcastHashJoin" in p


def test_hit_counts_plan_prunes_and_partial_aggregates(spark, tmp_path):
    """The total-hits path must keep the persisted-index pushdown (term
    filter reaches the scan) and count with a two-phase aggregate — and
    never run Python in the plan."""
    from jassjr_spark.operators.search import hit_counts

    idx = build_index(_docs(spark, 300)).cache()
    path = str(tmp_path / "hcidx")
    write_index(idx, path)
    on_disk = read_index(spark, path)
    q = parse_queries(spark, ["51 the postings arrow"])
    p = _plan(hit_counts(on_disk, q))
    assert "PushedFilters" in p
    assert "partial_count" in p or "partial_finalmerge" in p or \
        "HashAggregate" in p
    assert "BatchEvalPython" not in p


def test_search_ordered_single_window(spark, tmp_path):
    """Sort-by-field ranks with exactly ONE per-query window, fed by the
    candidate set (the key map joins before the window)."""
    from jassjr_spark.operators.search import search_ordered

    idx = build_index(_docs(spark, 300)).cache()
    path = str(tmp_path / "soidx")
    write_index(idx, path)
    on_disk = read_index(spark, path)
    q = parse_queries(spark, ["51 the postings arrow"])
    keys = _docs(spark, 300).select(
        "docid", F.length("content").cast("long").alias("sort_key")
    )
    p = _plan(search_ordered(on_disk, q, keys, k=5))
    assert p.count("Window [") == 1
    # Spark's rank<=k pushes into partial/final WindowGroupLimit — the
    # per-partition top-k prune that keeps deep candidate sets cheap
    assert p.count("WindowGroupLimit") == 2
    assert "PushedFilters" in p


def test_expansion_plans_are_vocab_scans_not_corpus_scans(spark):
    """Fuzzy expansion scans the DICTIONARY (length-band filter visible);
    prefix/regex cap-ranking windows are PARTITIONED by (query, slot) so
    rank<=k pushes into WindowGroupLimit instead of funneling a hot
    prefix's candidates through one unpartitioned sort."""
    from jassjr_spark.operators.fuzzy import expand_fuzzy, expand_prefix

    idx = build_index(_docs(spark, 300)).cache()
    p = _plan(expand_fuzzy(idx, [(0, 0, "postings", 1)]))
    assert "levenshtein" in p
    assert "length" in p  # the band prefilter survives into the plan
    p2 = _plan(expand_prefix(idx, [(0, 0, "po"), (0, 1, "ar")]))
    assert "StartsWith" in p2
    assert p2.count("WindowGroupLimit") == 2  # partial + final

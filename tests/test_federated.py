"""Scatter-gather shard search (operators/federated.py): rank- and
rsv-identical to searching one index over the whole corpus."""

import pytest
from pyspark.sql import functions as F

from jassjr_spark.fixtures import synth_docs, synth_queries, docno_of
from jassjr_spark.operators.federated import (
    federated_search,
    global_df,
    global_stats,
)
from jassjr_spark.operators.index_build import build_index
from jassjr_spark.operators.search import search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, docno_of(r, p, c), t)
        for i, (r, p, c, _, t) in enumerate(synth_docs(180))
    ]
    docs = spark.createDataFrame(rows, "docid long, docno string, content string")
    full = build_index(docs, prepend_docno=False).cache()
    shards = [
        build_index(
            docs.filter(F.col("docid") % 3 == m), prepend_docno=False
        ).cache()
        for m in range(3)
    ]
    return docs, full, shards


def test_global_stats_match_full_index(corpus):
    _, full, shards = corpus
    g, f = global_stats(shards), full.scalar_stats()
    assert g["n_docs"] == f["n_docs"]
    assert g["total_terms"] == f["total_terms"]
    assert g["avgdl"] == f["avgdl"]  # bitwise, not approx


def test_global_df_matches_full_dictionary(corpus):
    _, full, shards = corpus
    terms = ["couch", "the", "zzzmissing"]
    want = {
        r.term: r.df
        for r in full.dictionary.filter(F.col("term").isin(terms)).collect()
    }
    assert global_df(shards, terms) == want


def test_federated_matches_single_index(corpus, spark):
    _, full, shards = corpus
    lines = synth_queries(8)
    qrows = [
        (qid, pos, t)
        for qid, line in enumerate(lines)
        for pos, t in enumerate(line.split())
    ]
    queries = spark.createDataFrame(qrows, "query_id long, pos int, term string")
    fed = {
        (r.query_id, r.docno): (r.rank, r.rsv)
        for r in federated_search(shards, queries, k=10).collect()
    }
    single = {
        (r.query_id, r.docno): (r.rank, r.rsv)
        for r in search(full, queries, k=10).collect()
    }
    # same hit sets, bitwise-identical rsv per hit
    assert set(fed) == set(single)
    for key, (rank, rsv) in single.items():
        assert fed[key][1] == rsv, key
    # ranks agree wherever rsv values are distinct (global tie-break is
    # docno, single-index is docid; no ties in this corpus)
    assert {k: v[0] for k, v in fed.items()} == {
        k: v[0] for k, v in single.items()
    }


def test_federated_over_persisted_shards(corpus, spark, tmp_path_factory):
    """Shards read back from disk answer identically — the scatter phase
    rides each store's bucket-pruned postings scan."""
    from jassjr_spark.sources.index_store import read_index, write_index

    docs, full, shards = corpus
    root = tmp_path_factory.mktemp("fedshards")
    persisted = []
    for m, sh in enumerate(shards):
        write_index(sh, str(root / f"shard{m}"), n_buckets=4)
        persisted.append(read_index(spark, str(root / f"shard{m}")))
    queries = spark.createDataFrame(
        [(0, 0, "couch"), (0, 1, "the")], "query_id long, pos int, term string"
    )
    mem = sorted(
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in federated_search(shards, queries, k=10).collect()
    )
    disk = sorted(
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in federated_search(persisted, queries, k=10).collect()
    )
    assert mem == disk and mem


def test_federated_oov_and_empty(corpus, spark):
    _, _, shards = corpus
    queries = spark.createDataFrame(
        [(0, 0, "zzzmissing")], "query_id long, pos int, term string"
    )
    assert federated_search(shards, queries, k=5).collect() == []


def test_federated_live_plus_static_tier(spark, tmp_path):
    """Scatter-gather composes with the STREAMING index: one static
    shard (batch-built) + one live shard (epoch appends + refresh)
    answer identically to a single index over the union — the
    hot/cold-tier deployment shape. Shard docid spaces OVERLAP here
    (each shard resolves docnos against its own docids table), proving
    the gather needs no global docid coordination."""
    from jassjr_spark.sources.index_store import read_index, write_meta
    from jassjr_spark.streaming.incremental import (
        append_documents,
        refresh_derived,
    )

    rows = [
        (docno_of(r, p, c), t)
        for r, p, c, _, t in synth_docs(150)
    ]
    static_rows, live_rows = rows[:100], rows[100:]
    static = build_index(
        spark.createDataFrame(
            [(i, d, c) for i, (d, c) in enumerate(static_rows)],
            "docid long, docno string, content string",
        )
    ).cache()
    live_path = str(tmp_path / "live_idx")
    write_meta(spark, live_path, n_buckets=4)
    for chunk in (live_rows[:30], live_rows[30:]):
        batch = spark.createDataFrame(chunk, "docno string, content string")
        append_documents(spark, batch, live_path, n_buckets=4)
    refresh_derived(spark, live_path)
    live = read_index(spark, live_path).cache()

    full = build_index(
        spark.createDataFrame(
            [(i, d, c) for i, (d, c) in enumerate(rows)],
            "docid long, docno string, content string",
        )
    ).cache()

    lines = synth_queries(8)
    qrows = [
        (qid, pos, t)
        for qid, line in enumerate(lines)
        for pos, t in enumerate(line.split())
    ]
    queries = spark.createDataFrame(qrows, "query_id long, pos int, term string")
    fed = sorted(
        (r.query_id, r.docno, r.rsv)
        for r in federated_search([static, live], queries, k=10).collect()
    )
    single = sorted(
        (r.query_id, r.docno, r.rsv)
        for r in search(full, queries, k=10).collect()
    )
    assert fed == single and fed

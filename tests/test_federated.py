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


def test_cori_scores_hand_computed():
    """CORI belief math on a 2-shard, 2-term table vs longhand."""
    import math

    from jassjr_spark.operators.federated import cori_scores

    df_table = {(0, "a"): 4, (1, "a"): 1, (1, "b"): 3}
    weights = [100, 50]
    avg_cw = (100 + 50) / 2
    nsh = 2
    I = {
        "a": math.log((nsh + 0.5) / 2) / math.log(nsh + 1.0),
        "b": math.log((nsh + 0.5) / 1) / math.log(nsh + 1.0),
    }

    def belief(df, cw, t):
        T = df / (df + 50.0 + 150.0 * cw / avg_cw)
        return 0.4 + 0.6 * T * I[t]

    want0 = (belief(4.0, 100, "a") + belief(0.0, 100, "b")) / 2
    want1 = (belief(1.0, 50, "a") + belief(3.0, 50, "b")) / 2
    got = dict(cori_scores(df_table, weights, ["a", "b"]))
    assert got[0] == want0 and got[1] == want1
    # term in NO shard is dropped from the mean, not scored as 0
    got2 = dict(cori_scores(df_table, weights, ["a", "b", "zzz"]))
    assert got2 == got
    # all-OOV query scores every shard 0.0 instead of raising
    assert cori_scores(df_table, weights, ["zzz"]) == [(0, 0.0), (1, 0.0)]


def test_rank_shards_prefers_term_heavy_shard(corpus):
    from jassjr_spark.operators.federated import rank_shards, shard_df_table

    _, _, shards = corpus
    terms = ["varbyte", "the"]
    table = shard_df_table(shards, terms)
    ranked = rank_shards(shards, terms)
    assert any(df > 0 for df in table.values())
    assert len(ranked) == 3
    assert ranked == sorted(ranked, key=lambda p: (-p[1], p[0]))
    # the df probe matches each shard's own dictionary
    for i, sh in enumerate(shards):
        want = {
            r.term: r.df
            for r in sh.dictionary.filter(F.col("term").isin(terms)).collect()
        }
        for t, df in want.items():
            assert table[(i, t)] == df


def test_selective_all_shards_equals_federated(corpus, spark):
    """m = n_shards: selection is a no-op, results bitwise-identical to
    the full federation."""
    from jassjr_spark.operators.federated import selective_federated_search

    _, _, shards = corpus
    queries = spark.createDataFrame(
        [(0, 0, "varbyte"), (0, 1, "the"), (1, 0, "parser")],
        "query_id long, pos int, term string",
    )
    full = sorted(
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in federated_search(shards, queries, k=10).collect()
    )
    sel = sorted(
        (r.query_id, r.docno, r.rank, r.rsv)
        for r in selective_federated_search(shards, queries, k=10, m=3).collect()
    )
    assert sel == full and sel


def test_selective_m1_returns_only_top_shard_docs(corpus, spark):
    from jassjr_spark.operators.federated import (
        rank_shards,
        selective_federated_search,
    )

    docs, _, shards = corpus
    queries = spark.createDataFrame(
        [(0, 0, "varbyte")], "query_id long, pos int, term string"
    )
    top_shard = rank_shards(shards, ["varbyte"])[0][0]
    hits = selective_federated_search(shards, queries, k=50, m=1).collect()
    assert hits
    allowed = {
        r.docno
        for r in docs.filter(F.col("docid") % 3 == top_shard).collect()
    }
    assert {r.docno for r in hits} <= allowed
    # and every returned rsv is bitwise the full federation's rsv for
    # that doc (global statistics, selection only narrows the scatter)
    full = {
        r.docno: r.rsv
        for r in federated_search(shards, queries, k=200).collect()
    }
    for r in hits:
        assert full[r.docno] == r.rsv

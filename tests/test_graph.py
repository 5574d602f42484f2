"""PageRank (operators/graph.py): closed-form fixtures + invariants.

The reference scores text only (JASSjr_search.cpp:190-218); PageRank is
the classic static authority prior fused in via function_score
(q_ft_docboost_top10 pattern). These tests pin the recurrence against
hand-computable graphs.
"""
import math

import pytest

from jassjr_spark.operators.dedup import duplicate_clusters
from jassjr_spark.operators.graph import connected_components, pagerank


def _pr_dict(df):
    return {r["node"]: r["pr"] for r in df.collect()}


def test_ring_is_uniform(spark):
    # 0 -> 1 -> 2 -> 3 -> 0: doubly regular, so pr stays at 1/N forever.
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src long, dst long"
    )
    pr = _pr_dict(pagerank(edges, n_iter=7))
    assert set(pr) == {0, 1, 2, 3}
    for v in pr.values():
        assert v == pytest.approx(0.25, abs=1e-12)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)


def test_star_matches_hand_iteration(spark):
    # 1..3 all point at 0; 0 points at 1. Mirror the recurrence in
    # plain Python (same iteration count, same float ops).
    e = [(1, 0), (2, 0), (3, 0), (0, 1)]
    n_iter, d, n = 4, 0.85, 4
    edges = spark.createDataFrame(e, "src long, dst long")
    got = _pr_dict(pagerank(edges, n_iter=n_iter, d=d))

    outdeg = {u: sum(1 for s, _ in e if s == u) for u, _ in e}
    pr = {v: 1.0 / n for v in range(n)}
    base = (1.0 - d) / n
    for _ in range(n_iter):
        nxt = {}
        for v in range(n):
            # sorted by src == the engine's ordered fold
            s = 0.0
            for u, w in sorted(e):
                if w == v:
                    s += pr[u] / outdeg[u]
            nxt[v] = base + d * s
        pr = nxt
    assert got == pr  # bitwise: identical op order on both sides


def test_multi_edges_count_once(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (1, 0)], "src long, dst long"
    )
    dup = _pr_dict(pagerank(edges, n_iter=3))
    single = _pr_dict(
        pagerank(
            spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long"),
            n_iter=3,
        )
    )
    assert dup == single


def test_explicit_nodes_give_isolated_nodes_base_mass(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    pr = _pr_dict(pagerank(edges, n_iter=3, nodes=nodes))
    assert set(pr) == {0, 1, 2}
    # node 2 has no in-edges: its rank is exactly the teleport base
    assert pr[2] == (1.0 - 0.85) / 3


def test_checkpoint_every_does_not_change_values(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 10) for i in range(10)]
        + [(i, (i * 3 + 2) % 10) for i in range(10)],
        "src long, dst long",
    )
    a = _pr_dict(pagerank(edges, n_iter=6))
    b = _pr_dict(pagerank(edges, n_iter=6, checkpoint_every=2))
    assert a == b


def _cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_cc_two_components(spark):
    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21)], "src long, dst long"
    )
    cc = _cc_dict(connected_components(edges))
    assert cc == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_cc_long_chain_converges_in_log_rounds(spark):
    # path graph 0-1-2-...-63: diameter 63; pointer jumping must close
    # it well under a diameter's worth of rounds
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    cc = _cc_dict(connected_components(edges, max_iter=10))
    assert set(cc.values()) == {0} and len(cc) == n


def test_cc_direction_and_self_loops_ignored(spark):
    edges = spark.createDataFrame(
        [(7, 2), (2, 2), (9, 7)], "src long, dst long"
    )
    cc = _cc_dict(connected_components(edges))
    assert cc == {2: 2, 7: 2, 9: 2}


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_duplicate_clusters_transitive(spark):
    # A~B, B~C (never A~C directly), plus an unrelated pair
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (40, 41)], "docid_a long, docid_b long"
    )
    rows = {
        r["docid"]: (r["cluster"], r["cluster_size"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert rows == {
        10: (10, 3), 11: (10, 3), 12: (10, 3),
        40: (40, 2), 41: (40, 2),
    }


def test_dedup_near_keeps_canonical_and_untouched(spark):
    from jassjr_spark.operators.dedup import dedup_near

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "docid long, docno string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 4)], "docid_a long, docid_b long"
    )
    kept = sorted(r["docid"] for r in dedup_near(docs, pairs).collect())
    # cluster {1,3,4} -> keep 1; 0,2,5 untouched
    assert kept == [0, 1, 2, 5]


def test_mass_conserved_without_dangling(spark):
    # every node has outdeg >= 1 => total rank == 1 at every iteration
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)]
        + [(i, (i * 5 + 2) % 6) for i in range(6)],
        "src long, dst long",
    )
    pr = _pr_dict(pagerank(edges, n_iter=5))
    assert math.fsum(pr.values()) == pytest.approx(1.0, abs=1e-9)

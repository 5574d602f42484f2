"""Link analysis: PageRank as an iterative DataFrame computation.

Classic IR ranking signal (the reference scores text only —
``JASSjr_search.cpp:190-218``; web engines multiply in a static
link-authority prior). Spark-first shape: each iteration is one
shuffle join (rank mass flows along edges) + one aggregation — no
driver-side adjacency, so the graph can be 10^11 edges. Lineage grows
per iteration; ``checkpoint_every`` truncates it the standard way.

Cross-engine float discipline (matching the BM25 kernel's): the
per-node sum of in-edge contributions is an ORDERED left fold over the
contributions sorted by source node (collect_list -> array_sort ->
aggregate), so the additions associate identically to the DuckDB
oracle's ``list_reduce(list(c ORDER BY src), (a,b) -> a+b)`` — IEEE
addition is commutative but NOT associative, and a plain groupBy sum
would add in shuffle-arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    d: float = 0.85,
    nodes: DataFrame | None = None,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, pr) after ``n_iter`` synchronous
    power iterations:

        pr(v) = (1-d)/N + d * sum_{(u,v) in E} pr(u) / outdeg(u)

    Multi-edges count once (edges are distinct-ed); self-loops are
    legal. Nodes with no out-edges (dangling) leak their mass — pass
    a complete ``nodes`` frame and pre-add sink edges if the textbook
    re-distribution is wanted; the catalog's synthetic graph has no
    dangling nodes, keeping the oracle SQL honest.
    """
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col("node").cast("long"))
    nodes = nodes.cache()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    base = (1.0 - d) / n
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(outdeg, "src").cache()

    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for it in range(n_iter):
        contribs = e_deg.join(
            pr, e_deg["src"] == pr["node"]
        ).select(
            "dst", "src", (F.col("pr") / F.col("outdeg")).alias("c")
        )
        summed = contribs.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("s")
        )
        pr = nodes.join(
            summed, nodes["node"] == summed["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0)))
            .alias("pr"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return pr

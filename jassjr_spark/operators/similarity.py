"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, dot products as a deterministic JVM-side
  ``F.aggregate`` fold over ``F.zip_with`` products (left-to-right, so the
  result is bit-reproducible), per-query top-k via window. Exact baseline;
  O(Q*N) but embarrassingly parallel — the scan partitions carry all the
  work and nothing shuffles except Q*k result rows.
* ``lsh_topk`` — the scale path: random-hyperplane LSH (SimHash for
  vectors). Plane p_j is a deterministic md5-seeded pseudo-random vector;
  sign pattern over ``n_planes`` planes buckets the corpus; queries probe
  only their bucket (plus optional multi-probe). Recall<1 by construction;
  the bench reports recall vs the exact baseline.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(pairs: DataFrame, a: str = "qvec", b: str = "embedding") -> DataFrame:
    return pairs.withColumn(
        "cosine", _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """(qvec_id, vec_id, cosine, ...) -> per-query top-k with the shared
    tie-break (cosine desc, vec_id asc)."""
    w = Window.partitionBy("qvec_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qvec_id", "vec_id", "rank", "cosine")
    )


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """vectors(vec_id, embedding) x queries(qvec_id, qvec) ->
    (qvec_id, vec_id, rank, cosine) exact top-k by cosine, self-matches
    excluded, ties broken by vec_id ascending. cosine rounded to 6 dp so
    ranks are reproducible across engines (floats differ in the last ulp
    between summation strategies; our fold is deterministic, the oracle's
    may not be)."""
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = with_cosine(joined).filter(F.col("vec_id") != F.col("qvec_id"))
    scored = scored.withColumn("cosine", F.round("cosine", 6))
    return rank_topk(scored, k)


def _plane(seed: int, j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1): derived
    from md5(seed:j:i) so any engine can reproduce it."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8]
        out.append(int(h, 16) / float(2 ** 31) - 1.0)
    return out


def ivf_index(
    vectors: DataFrame, n_clusters: int = 16, seed: int = 42,
    fit_fraction: float | None = None,
) -> tuple[DataFrame, list]:
    """IVF coarse quantizer: KMeans-cluster the corpus -> (assigned,
    centroids). ``assigned`` is the input plus a ``cluster`` column (the
    inverted list id); at scale this column is the partition key of the
    vector store, so a probe touches only nprobe partitions — the vector
    analogue of the postings bucket layout.

    ``fit_fraction``: fit the quantizer on a sample (the standard IVF
    training recipe — centroids need ~100-1000 points per cluster, not
    the 10^12-row corpus; assignment of the FULL corpus is the cheap
    transform pass). None = fit on everything (test scale)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vdf = vectors.withColumn(
        "features",
        array_to_vector(F.col("embedding").cast("array<double>")),
    )
    fit_on = vdf.sample(fit_fraction, seed=seed) if fit_fraction else vdf
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="features", predictionCol="cluster"
    ).fit(fit_on)
    assigned = model.transform(vdf).select("vec_id", "embedding", "cluster")
    return assigned, [c.tolist() for c in model.clusterCenters()]


def ivf_topk(
    assigned: DataFrame, centroids: list, queries_local: list,
    k: int = 5, nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k probing the ``nprobe`` nearest inverted lists.

    queries_local: [(qvec_id, [floats])] — centroid selection is a tiny
    driver-side numpy computation (|queries| x |centroids|), the classic
    IVF shape. nprobe == n_clusters degenerates to exact brute force
    (tested). Returns (qvec_id, vec_id, rank, cosine).
    """
    import numpy as np

    spark = assigned.sparkSession
    cents = np.asarray(centroids, dtype=np.float64)
    cnorm = np.linalg.norm(cents, axis=1)
    rows = []
    for qvec_id, qvec in queries_local:
        qv = np.asarray(qvec, dtype=np.float64)
        sims = cents @ qv / (cnorm * np.linalg.norm(qv) + 1e-12)
        for c in np.argsort(-sims)[:nprobe]:
            rows.append((int(qvec_id), [float(x) for x in qvec], int(c)))
    probes = spark.createDataFrame(
        rows, "qvec_id long, qvec array<float>, cluster int"
    )
    joined = assigned.join(F.broadcast(probes), "cluster").filter(
        F.col("vec_id") != F.col("qvec_id")
    )
    scored = with_cosine(joined).withColumn("cosine", F.round("cosine", 6))
    return rank_topk(scored, k)


def lsh_bucket(
    vectors: DataFrame, n_planes: int = 8, seed: int = 42, dim: int = 64,
    col: str = "embedding",
) -> DataFrame:
    """-> input + 'bucket' (string of n_planes sign bits)."""
    bits = []
    for j in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(seed, j, dim)])
        bits.append(F.when(_dot(F.col(col), plane) >= 0, "1").otherwise("0"))
    return vectors.withColumn("bucket", F.concat(*bits))


def lsh_neardup_pairs(
    vectors: DataFrame, threshold: float = 0.9,
    n_planes: int = 8, seed: int = 42, dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-scoped:
    (vec_id_a < vec_id_b, cosine) for pairs in the SAME hyperplane bucket
    with cosine >= threshold. The bucket equality join is the 10^12-row
    scale story (no all-pairs anywhere — a bucket's pairs are the only
    candidates, exactly like MinHash-LSH for text); recall < 1 by
    construction, governed by n_planes."""
    vb = lsh_bucket(vectors, n_planes, seed, dim)
    a = vb.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("qvec"),
        "bucket",
    )
    b = vb.select(
        F.col("vec_id").alias("vec_id_b"), "embedding", "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_id_a") < F.col("vec_id_b"))
    scored = with_cosine(pairs).withColumn("cosine", F.round("cosine", 6))
    return scored.filter(F.col("cosine") >= threshold).select(
        "vec_id_a", "vec_id_b", "cosine"
    )


def lsh_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    n_planes: int = 8, seed: int = 42, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    LSH bucket. Same output shape as cosine_topk."""
    vb = lsh_bucket(vectors, n_planes, seed, dim)
    qb = lsh_bucket(queries, n_planes, seed, dim, col="qvec")
    joined = vb.join(F.broadcast(qb), "bucket").filter(
        F.col("vec_id") != F.col("qvec_id")
    )
    scored = with_cosine(joined).withColumn("cosine", F.round("cosine", 6))
    return rank_topk(scored, k)


def rescore_by_vector(
    index, queries: DataFrame, vectors: DataFrame, qvecs: DataFrame,
    n: int = 100, k: int = 10, stats: dict | None = None,
) -> DataFrame:
    """Two-phase retrieval (the rescore-window pattern of production
    engines): phase 1 ranks the corpus lexically — BM25 top-``n`` per
    query, the cheap recall pass — and phase 2 re-ranks ONLY those n
    candidates by exact embedding cosine to the query's vector ->
    (query_id, docno, rank, cosine), rank by (cosine desc, docid desc).

    ``vectors`` is (vec_id, embedding) with vec_id == docid; ``qvecs``
    is (query_id, qvec). Scale shape: the expensive vector math touches
    n x #queries rows, never the corpus — the candidate set broadcasts
    into the vectors table so the cosine join is shuffle-free, and at
    10^12 docs phase 2's cost is unchanged (phase 1's WAND/MaxScore
    variants bound the lexical pass).

    Determinism note: this operator ranks on the RAW cosine (and raw
    rsv phase-1 cut), unlike the other ANN surfaces' round-to-6dp
    ranking — ulp-level summation differences can reorder exact ties
    cross-engine. The oracled variant (driver_queries.
    q_sim_rescore_top10, its documented "rounded twin") rounds both
    phases; use that shape where cross-engine rank identity matters."""
    from jassjr_spark.operators.search import (
        BROADCAST_DOCIDS_MAX, accumulate, score_postings, top_k,
    )
    from jassjr_spark.sources.index_store import pruned_postings

    s = stats or index.scalar_stats()
    qterms = [r.term for r in queries.select("term").distinct().collect()]
    scored = score_postings(
        queries, pruned_postings(index, qterms), index.dictionary,
        s["n_docs"], s["avgdl"], qterms=qterms,
    )
    cands = top_k(accumulate(scored), n).select("query_id", "docid")
    rescored = (
        vectors.select(F.col("vec_id").alias("docid"), "embedding")
        .join(F.broadcast(cands), "docid")
        .join(F.broadcast(qvecs), "query_id")
    )
    rescored = with_cosine(rescored).select("query_id", "docid", "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("docid").desc()
    )
    ranked = (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if s["n_docs"] <= BROADCAST_DOCIDS_MAX:
        out = ranked.join(F.broadcast(index.docids), "docid")
    else:
        out = index.docids.join(F.broadcast(ranked), "docid")
    return out.select("query_id", "docno", "rank", "cosine")


def mmr_rerank(
    candidates: list[tuple[int, list[float]]],
    qvec: list[float],
    k: int = 10,
    lam: float = 0.7,
) -> list[tuple[int, float]]:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998)
    greedy selection -> [(vec_id, mmr_score), ...] in pick order:

        pick argmax over remaining of
            lam * cos(qvec, v) - (1 - lam) * max cos(v, s in selected)

    (first pick: pure relevance). Diversity selection for result pages
    and for training-data sampling (pick k diverse representatives of a
    matched set). Deterministic: cosines are rounded to 6 dp before
    every argmax and ties break vec_id ascending, so the SELECTION is
    reproducible across hosts even where float sums differ in the ulp.
    max_sim is floored at 0.0 (it starts there and only increases), so
    an anti-correlated candidate is scored by pure lam*relevance rather
    than being rewarded for negative similarity — the SQL oracle
    (driver_queries._sql_sim_mmr) mirrors this with greatest(0.0, ...).

    This is the driver-side stage of a two-phase plan: candidate
    generation is distributed (search / rescore / ANN produce the
    bounded candidate list); greedy MMR is inherently sequential
    (selection i depends on 1..i-1) and O(k*n) on <= n collected rows —
    the same shape every production MMR takes. ``candidates`` is
    [(vec_id, embedding)], ``qvec`` the query vector."""
    import math

    def cos(a, b):
        # sequential index-order fold — the same summation order as the
        # engine's F.aggregate/zip_with cosine kernel
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        if na == 0.0 or nb == 0.0:
            # the Column kernel yields null for a zero-norm vector; the
            # driver fold degrades to 0.0 ("orthogonal") instead of
            # raising ZeroDivisionError mid-rerank
            return 0.0
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    rel = {vid: cos(v, qvec) for vid, v in candidates}
    vecs = dict(candidates)
    remaining = sorted(vecs)
    selected: list[tuple[int, float]] = []
    max_sim: dict[int, float] = {vid: 0.0 for vid in remaining}
    while remaining and len(selected) < k:
        best, best_score = None, None
        for vid in remaining:
            if selected:
                score = round(
                    lam * rel[vid] - (1.0 - lam) * max_sim[vid], 6
                )
            else:
                score = rel[vid]
            if best_score is None or score > best_score:
                best, best_score = vid, score
        selected.append((best, best_score))
        remaining.remove(best)
        for vid in remaining:
            s = cos(vecs[vid], vecs[best])
            if s > max_sim[vid]:
                max_sim[vid] = s
    return selected

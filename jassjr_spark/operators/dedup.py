"""Deduplication operators: exact, normalized, MinHash-LSH, SimHash,
n-gram Jaccard.

Scale notes (the part that matters at 10^12 docs):
* exact/normalized dedup is a hash-groupBy — one shuffle on a 64-hex-char
  key, combiner-friendly, no skew beyond genuine duplicate explosion.
* MinHash-LSH avoids the O(n^2) pairwise wall: shingles -> K minhashes ->
  B bands of R rows -> groupBy(band_hash) emits only in-bucket candidate
  pairs; the final Jaccard verification touches candidates only.
* All hashing uses md5 (hex) so every step is reproducible in the DuckDB
  oracle — no engine-specific hash functions anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.constants import TOKEN_RE


def _norm_tokens(content="content"):
    return F.regexp_extract_all(F.lower(content), F.lit(TOKEN_RE), 0)


def exact_duplicates(docs: DataFrame, max_docids: int = 1000) -> DataFrame:
    """(docid, content) -> (sha, keep_docid, n_dups, docids): groups of
    byte-identical documents (n_dups >= 2), keeper = min docid.

    ``docids`` is a SAMPLE capped at ``max_docids`` (the smallest docids):
    an unbounded collect_list would concentrate a pathological
    all-identical corpus into one task's memory. ``n_dups`` still counts
    every duplicate. This operator is the *reporting* face (who are the
    dups?); ``dedup_exact`` is the scale path for actually keeping one
    row per group — it never materializes a group as an array.
    """
    hashed = docs.select("docid", F.sha2("content", 256).alias("sha"))
    w = Window.partitionBy("sha").orderBy("docid")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .groupBy("sha")
        .agg(
            F.min("docid").alias("keep_docid"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            # collect_list skips nulls: only the first max_docids survive
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= max_docids, F.col("docid"))
                )
            ).alias("docids"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def dedup_exact(docs: DataFrame, normalized: bool = False) -> DataFrame:
    """Keep one representative (min docid) per identical content.

    normalized=True dedups on the lowercased token stream instead of raw
    bytes (whitespace/case-insensitive).
    """
    key = (
        F.md5(F.array_join(_norm_tokens(), " ")) if normalized
        else F.sha2("content", 256)
    )
    w = Window.partitionBy("key").orderBy("docid")
    return (
        docs.withColumn("key", key)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("key", "rn")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(docid, content) -> (docid, shingle): distinct word n-grams of the
    normalized token stream. Built with transform over a token array —
    JVM-side, no UDF."""
    toks = _norm_tokens()
    k = F.size(toks) - (n - 1)
    sh = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return (
        docs.select("docid", F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 16,
    hash_family: str = "md5",
) -> DataFrame:
    """(docid, content) -> (docid, sig): MinHash signature.

    Two hash families, both pure JVM Column math:

    * ``"md5"`` (default): h_i(s) = md5(i || ':' || s), sig is
      array<string> of hex digests. Hex string order == unsigned byte
      order, so min() over hex strings is a valid minhash, and the
      family is reproducible in ANY engine with md5 — this is the
      cross-engine-oracled default (the DuckDB correctness gate and the
      persisted fingerprint-store format both pin it).
    * ``"xxhash64"``: h_i(s) = xxhash64(i, s), sig is array<long>.
      Min over signed int64 is an equally valid minhash (any fixed
      total order over a uniform hash works — min-wise independence
      needs randomness of h, not a particular order). ~10x cheaper per
      shingle than 16 md5s and the signature is 8-byte registers
      instead of 32-char hex strings, so the groupBy(docid) shuffle and
      the banded self-join move ~4x fewer bytes — the production choice
      at crawl scale, opt-in because no other engine reproduces Spark's
      xxhash64 bit-for-bit (correctness is property-tested instead:
      identical docs collide in every band, disjoint docs in none,
      near-dups at the designed probability).
    """
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(
            f"unknown hash_family {hash_family!r}; use 'md5' (cross-engine"
            " oracled) or 'xxhash64' (fast, Spark-only)"
        )
    sh = shingles(docs, n)
    if hash_family == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    sig = sh.groupBy("docid").agg(*aggs)
    return sig.select(
        "docid", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    docs: DataFrame, n: int = 3, num_hashes: int = 16, bands: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """MinHash-LSH candidate generation: -> (docid_a, docid_b, band) with
    docid_a < docid_b, distinct pairs that collide in >= 1 band.

    bands * rows == num_hashes; a pair colliding in any band is a
    candidate. The groupBy(band, band_hash) is the only shuffle; bucket
    sizes are bounded by genuine near-dup cluster sizes.

    ``hash_family``: see minhash_signatures — "md5" (default,
    cross-engine oracled) or "xxhash64" (fast Spark-only family; the
    band key is one xxhash64 over the row's register slice instead of an
    md5 over joined hex strings, so the self-join key is a long).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, hash_family=hash_family)
    if hash_family == "md5":
        def band_key(b):
            return F.md5(
                F.array_join(F.slice("sig", b * rows + 1, rows), "|")
            ).alias("bh")
    else:
        def band_key(b):
            return F.xxhash64(F.slice("sig", b * rows + 1, rows)).alias("bh")
    banded = sig.select(
        "docid",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_key(b))
                for b in range(bands)
            ])
        ).alias("x"),
    ).select("docid", "x.band", "x.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.docid") < F.col("b.docid"))
        .select(
            F.col("a.docid").alias("docid_a"),
            F.col("b.docid").alias("docid_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.7,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """-> (docid_a, docid_b, jaccard) for pairs with n-gram Jaccard >=
    threshold. With ``candidates`` (e.g. from LSH) only those pairs are
    verified; otherwise all colliding-shingle pairs are considered (exact,
    but O(pairs-sharing-a-shingle) — fine at test scale, LSH is the scale
    path)."""
    sh = shingles(docs, n)
    sizes = sh.groupBy("docid").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is None:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a.docid") < F.col("b.docid"))
            .groupBy(F.col("a.docid").alias("docid_a"), F.col("b.docid").alias("docid_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        inter = (
            candidates.join(sh.alias("a"), F.col("docid_a") == F.col("a.docid"))
            .join(
                sh.alias("b"),
                (F.col("docid_b") == F.col("b.docid"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("docid_a", "docid_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    return (
        inter.join(sizes.alias("sa"), F.col("docid_a") == F.col("sa.docid"))
        .join(sizes.alias("sb"), F.col("docid_b") == F.col("sb.docid"))
        .select(
            "docid_a",
            "docid_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def duplicate_clusters(pairs: DataFrame) -> DataFrame:
    """Resolve candidate pairs (docid_a, docid_b) into duplicate
    clusters: -> (docid, cluster, cluster_size), cluster = min docid of
    the connected component, only docids that appear in some pair.

    This is the step between pair generation (LSH/SimHash/Jaccard) and
    an actually-deduplicated corpus: transitive closure picks ONE
    canonical doc per group even when A~B and B~C but A!~C never
    collided directly. Components via log-round label propagation
    (graph.connected_components); the size window shuffles once on the
    cluster key.
    """
    from jassjr_spark.operators.graph import connected_components

    cc = connected_components(
        pairs.select(
            F.col("docid_a").alias("src"), F.col("docid_b").alias("dst")
        )
    )
    w = Window.partitionBy("component")
    return cc.select(
        F.col("node").alias("docid"),
        F.col("component").alias("cluster"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def dedup_near(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Near-duplicate corpus dedup: drop every non-canonical member of
    each duplicate cluster (canonical = min docid), keeping docs that
    collide with nothing. The end-to-end LSH path is
    ``dedup_near(docs, lsh_candidate_pairs(docs))``: candidate pairs ->
    transitive clusters -> one survivor per cluster — a broadcastable
    anti-join since losers are bounded by the duplicate count, not the
    corpus."""
    losers = duplicate_clusters(pairs).filter(
        F.col("docid") != F.col("cluster")
    ).select("docid")
    return docs.join(losers, "docid", "left_anti")


def _bit_literal(i: int):
    """2**i as a signed-64 Column literal. Bit 63 is the sign bit — its
    power does not fit a positive long, so it is the min-long literal
    (same two's-complement bit pattern); combining with bitwiseOR keeps
    every step overflow-free (bits are disjoint)."""
    v = -(1 << 63) if i == 63 else (1 << i)
    return F.lit(v).cast("long")


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(docid, content) -> (docid, simhash long): bitwise-majority SimHash
    over token md5s. Each token votes +1/-1 per bit; sign of the sum sets
    the bit. Pure Column math via bit ops on conv(md5-prefix).

    Default 64 bits (the scale-safe width for simhash_pairs banding —
    see there). Bits 0-31 come from md5 hex chars 1-8 and bits 32-63 from
    chars 9-16, so a 64-bit fingerprint's low half IS the 32-bit
    fingerprint (back-compatible with stores written at bits=32)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    toks = docs.select("docid", F.explode(_norm_tokens()).alias("tok"))
    h_lo = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    h_hi = F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")

    def vote(i: int):
        src, sh = (h_lo, i) if i < 32 else (h_hi, i - 32)
        return (
            F.when(F.shiftright(src, sh).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
        )

    withbits = toks.select("docid", *[vote(i) for i in range(bits)])
    agg = withbits.groupBy("docid").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(bits)]
    )
    sim = None
    for i in range(bits):
        bit = (
            F.when(F.col(f"b{i}") > 0, _bit_literal(i))
            .otherwise(F.lit(0).cast("long"))
        )
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("docid", sim.alias("simhash"))


# A block-join key narrower than this many bits cannot stay selective at
# scale: k-bit block values give only 2^k distinct join keys, so bucket
# size trends N/2^k and the candidate join toward N^2/2^k. 12 bits (4096
# keys) is the floor below which simhash_pairs refuses its parameters.
MIN_BLOCK_BITS = 12


def simhash_pairs(
    docs: DataFrame, bits: int = 64, max_hamming: int = 3,
    allow_low_selectivity: bool = False, metrics: dict | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance:
    (docid_a, docid_b, hamming) for all pairs with distance <= max_hamming.

    Pigeonhole banding — the scale-safe shape, mirroring MinHash banding:
    split the ``bits``-bit fingerprint into ``max_hamming + 1`` contiguous
    bit blocks; two fingerprints within hamming distance t differ in at
    most t blocks, so they must agree EXACTLY on at least one block.
    Candidates come from an equi-join on (block_position, block_value) —
    never an all-pairs cross join — and the exact distance is then
    verified with bit_count(xor). No false negatives (pigeonhole is
    exact), no false positives (verification is exact).

    Defaults are the scale-safe ones: 64 bits with max_hamming=3 gives
    16-bit block keys (65k distinct values per block position), so block
    buckets stay ~N/65k and the candidate join never trends O(N^2).
    Narrower keys (< MIN_BLOCK_BITS bits, e.g. bits=32 with t=3) are
    refused unless ``allow_low_selectivity=True`` (test scale only).

    ``metrics``, when passed a dict, receives the banding's skew facts
    after one extra aggregation job: ``max_block_bucket`` (largest
    (blk, val) group — the worst join bucket) and ``n_fingerprints``.
    The production guard: alert when max_block_bucket approaches the
    candidate budget, the way index _metrics tracks postings skew.
    """
    n_blocks_guard = max_hamming + 1
    width_guard = bits // n_blocks_guard
    if width_guard < MIN_BLOCK_BITS and not allow_low_selectivity:
        raise ValueError(
            f"simhash_pairs(bits={bits}, max_hamming={max_hamming}) gives "
            f"{width_guard}-bit block join keys (< {MIN_BLOCK_BITS}): only "
            f"2^{width_guard} distinct keys per block position, so candidate "
            "buckets grow ~N/2^width and the join trends O(N^2) at scale. "
            "Raise bits (64) or lower max_hamming; pass "
            "allow_low_selectivity=True only at test scale."
        )
    sh = simhash(docs, bits=bits)
    n_blocks = max_hamming + 1
    w = bits // n_blocks
    blk_cols = []
    for j in range(n_blocks):
        lo = j * w
        width = (bits - lo) if j == n_blocks - 1 else w
        mask = (1 << width) - 1
        blk_cols.append(
            F.struct(
                F.lit(j).alias("blk"),
                F.shiftright("simhash", lo).bitwiseAND(F.lit(mask))
                .alias("val"),
            )
        )
    e = sh.select(
        "docid", "simhash", F.explode(F.array(*blk_cols)).alias("b")
    ).select("docid", "simhash", "b.blk", "b.val")
    if metrics is not None:
        row = (
            e.groupBy("blk", "val").agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
            .first()
        )
        metrics["max_block_bucket"] = int(row.mx or 0)
        metrics["n_fingerprints"] = int(row.tot or 0) // n_blocks
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.docid") < F.col("b.docid")),
        )
        .select(
            F.col("a.docid").alias("docid_a"),
            F.col("b.docid").alias("docid_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["docid_a", "docid_b"])  # pairs can share >1 block
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("docid_a", "docid_b", "hamming")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Test-set decontamination sweep: (docid, bench_id, n_shared) for
    every corpus document sharing >= ``min_shared`` DISTINCT word
    n-grams with a benchmark document — the standard leakage check a
    training-data pipeline runs before a corpus ships (identity leaks,
    quotations, paraphrase cores all surface as shared n-grams).

    Both sides reuse shingles() (JVM transform, no UDF). The benchmark
    is normally orders of magnitude smaller than the corpus, so its
    shingle set broadcasts (default) and the sweep is ONE map-side join
    over the corpus shingles — no shuffle of corpus-sized data at all;
    pass broadcast_benchmark=False for a benchmark too large to fit,
    which falls back to a shuffle join on the shingle key.
    """
    c_sh = shingles(corpus, n)
    b_sh = shingles(benchmark, n).withColumnRenamed("docid", "bench_id")
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    return (
        c_sh.join(b_sh, "shingle")
        .groupBy("docid", "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )

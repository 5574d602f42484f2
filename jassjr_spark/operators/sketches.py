"""Deterministic sketch aggregations: HyperLogLog, Count-Min, Bloom.

At 100 TB the exact versions of "how many distinct X", "how often does
Y occur", and "is Z in this set" are vocabulary-sized shuffles; the
sketches below replace them with FIXED-size state that map-side
combines (a ``groupBy`` over <= a few thousand sketch cells), the
standard large-cluster pattern (Flink/Trino/Druid all ship the same
three). The reference engine has no sketch path — its whole index fits
one machine (``JASSjr_index.cpp:159-219`` holds the vocabulary in one
``std::unordered_map``); these operators are the scale-out replacement
for the profiling passes that map would have served.

Unlike library sketches (Spark's ``approx_count_distinct``, DataSketches)
whose register layouts are implementation-private, every hash here is
md5-derived **bit-for-bit reproducibly in ANSI SQL**, so the DuckDB
oracle reconstructs the exact same registers / counters / bits — the
estimates are hash-equal across engines, not merely "close". All math
is integer until one final IEEE division (HLL), so the aggregations are
order-independent (safe under any shuffle/combine schedule).

* HLL: register = first ``p`` bits of md5, rho = leading zeros of the
  next 52 bits + 1 (both via the engines' shared minimal-``bin()``
  string form). The harmonic sum is kept EXACT as sum of
  ``2^(50-rho)`` longs (rho>50 truncates to 0 — identically on both
  engines), so the only float op is the final alpha*m^2/S division.
* Count-Min: depth x width lattice of md5 row-hashes; counters are
  plain integer sums (combiner-friendly); point estimate = min over
  depth rows.
* Bloom: k md5 positions per key into an m-bit space, materialized as
  the distinct-position set; a probe is a candidate iff ALL its k
  positions are present (broadcast join — the semi-join pruning
  pattern that skips shuffling the big side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# HLL harmonic-sum scaling: terms are 2^(HLL_SCALE - rho), exact longs.
# rho > HLL_SCALE truncates to 0 — a < 2^-50 probability event per
# register, applied identically by both engines (still hash-equal).
HLL_SCALE = 50
_POW2_SCALE = float(2 ** HLL_SCALE)


def _hex_long(col, start: int, length: int):
    """Unsigned integer from md5-hex substring (1-based start), as long.
    Max 15 hex chars (60 bits) to stay inside positive int64."""
    return F.conv(F.substring(col, start, length), 16, 10).cast("long")


def hll_alpha(m: int) -> float:
    """Flajolet et al.'s bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """(register, rho): the HLL register table for the distinct values of
    ``key_col``. register = first p bits of md5(key) (p/4 hex chars, p a
    multiple of 4); rho = leading zeros of the NEXT 52 bits + 1, i.e.
    53 - bitlength(w), computed from the minimal binary string (Spark
    ``bin`` == DuckDB ``bin``: no leading zeros, "0" for zero).

    One hash-aggregate of at most 2^p groups with map-side combine —
    the scalable replacement for count(DISTINCT) over 10^12 rows.
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    h = F.md5(F.col(key_col).cast("string"))
    reg = _hex_long(h, 1, p // 4)
    w = _hex_long(h, p // 4 + 1, 13)  # 52 bits
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w))
    )
    return (
        df.select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One row (est double): the HLL cardinality estimate from a register
    table (2^p registers; absent rows are empty registers).

    The harmonic mean's sum is EXACT: sum over all m registers of
    2^(HLL_SCALE - rho) as longs (empty register: rho=0 term =
    2^HLL_SCALE), so both engines produce the identical integer S and
    the single float division alpha * m^2 * 2^HLL_SCALE / S is IEEE-
    identical. Small-cardinality linear counting (E <= 2.5m with empty
    registers) uses ln(), shared bit-for-bit by CPython-evaluated
    literals only when the branch is data-independent — callers wanting
    cross-engine hash equality should size p so the corpus sits in the
    HLL regime (est > 2.5 * 2^p), as the catalog entry does.
    """
    m = 1 << p
    term = F.when(
        F.col("rho") <= HLL_SCALE,
        F.expr(f"shiftleft(1L, {HLL_SCALE} - rho)"),
    ).otherwise(F.lit(0).cast("long"))
    agg = registers.agg(
        F.sum(term).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    numer = hll_alpha(m) * float(m) * float(m) * _POW2_SCALE
    s_total = F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(
        int(2 ** HLL_SCALE)
    )
    raw = F.lit(numer) / s_total.cast("double")
    zeros = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(est.alias("est"))


def hll_count_distinct(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """One row (est): end-to-end approximate count-distinct."""
    return hll_estimate(hll_registers(df, key_col, p), p)


def cms_build(
    df: DataFrame, key_col: str, count_col: str | None = None,
    depth: int = 4, width: int = 64,
) -> DataFrame:
    """(row, bucket, n): the Count-Min counter lattice. Row i's hash is
    md5("i:key") mod width. ``count_col=None`` counts occurrences;
    otherwise sums it (weighted heavy-hitter counting). Integer sums =>
    order-independent and map-side combinable; the whole sketch is
    depth*width rows regardless of input size.
    """
    weight = F.col(count_col) if count_col else F.lit(1)
    rows = [
        df.select(
            F.lit(i).alias("row"),
            (_hex_long(
                F.md5(F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))),
                1, 8,
            ) % width).alias("bucket"),
            weight.alias("w"),
        )
        for i in range(depth)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("row", "bucket").agg(
        F.sum("w").cast("long").alias("n")
    )


def cms_query(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    depth: int = 4, width: int = 64,
) -> DataFrame:
    """keys + (est long): point estimates for ``key_col`` values —
    min over the depth row-counters each key hashes into. Broadcasts
    the (depth*width)-row sketch, so probing any number of keys is one
    map-side join. Guarantee: est >= true count (over-count only)."""
    probes = None
    for i in range(depth):
        pr = keys.select(
            F.col(key_col),
            F.lit(i).alias("row"),
            (_hex_long(
                F.md5(F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))),
                1, 8,
            ) % width).alias("bucket"),
        )
        probes = pr if probes is None else probes.unionByName(pr)
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna(0, subset=["n"])
        .groupBy(key_col)
        .agg(F.min("n").cast("long").alias("est"))
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 256, k: int = 3,
) -> DataFrame:
    """(pos): the distinct set-bit positions of a Bloom filter over the
    distinct values of ``key_col``. Position j of a key is
    md5("j:key") mod m_bits. At most m_bits rows — broadcastable no
    matter how large the member table was."""
    cols = None
    for j in range(k):
        pj = df.select(
            (_hex_long(
                F.md5(F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string"))),
                1, 8,
            ) % m_bits).alias("pos")
        )
        cols = pj if cols is None else cols.unionByName(pj)
    return cols.distinct()


def bloom_probe(
    df: DataFrame, key_col: str, bits: DataFrame,
    m_bits: int = 256, k: int = 3,
) -> DataFrame:
    """df + (candidate int): 1 iff ALL k positions of the key are set —
    a superset of the true members (no false negatives; false-positive
    rate ~ (set_bits/m)^k). The filter rides a broadcast join against
    the <= m_bits-row bit set: the probe side never shuffles, which is
    the point — prune a 100-TB scan down to candidates before the
    expensive exact join."""
    probe = df
    hit_cols = []
    for j in range(k):
        pos = _hex_long(
            F.md5(F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string"))),
            1, 8,
        ) % m_bits
        probe = probe.withColumn(f"_pos{j}", pos)
    marked = F.broadcast(bits.withColumn("_set", F.lit(1)))
    for j in range(k):
        probe = probe.join(
            marked.withColumnRenamed("pos", f"_pos{j}")
                  .withColumnRenamed("_set", f"_hit{j}"),
            f"_pos{j}", "left",
        )
        hit_cols.append(F.coalesce(F.col(f"_hit{j}"), F.lit(0)))
    cand = hit_cols[0]
    for h in hit_cols[1:]:
        cand = cand * h
    out = probe.withColumn("candidate", cand.cast("int"))
    return out.drop(*[f"_pos{j}" for j in range(k)],
                    *[f"_hit{j}" for j in range(k)])

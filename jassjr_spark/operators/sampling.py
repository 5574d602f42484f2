"""Deterministic sampling for training-data pipelines.

A 100-TB corpus job cannot use ``df.sample()`` for anything that must be
reproducible, auditable, or joinable across runs: Spark's sampler is
seeded per-partition, so the selected set changes with partitioning,
AQE decisions, and cluster size. These operators instead hash a stable
row KEY — membership is a pure function of (key, seed, fraction),
independent of physical layout, re-executable on any engine (the DuckDB
oracle reproduces it exactly), and monotone in ``fraction`` (raising
0.1 → 0.2 keeps every previously sampled row — the standard trick for
growing a training subset without resampling).

u(key) = int(md5(seed ':' key)[:8], 16) / 2^32  ∈ [0, 1);  keep u < f.

All Column math (md5 + conv are JVM built-ins; no UDF); the filter is a
narrow map — no shuffle, no skew sensitivity, scan-pruned when the key
column is partition-correlated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DENOM = float(2 ** 32)


def sample_hash_col(key_col, seed: int = 42):
    """The [0,1) deterministic hash Column for ``key_col`` (any type;
    cast to its canonical string form first)."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42,
) -> DataFrame:
    """Uniform reproducible sample: keep rows with u(key) < fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(sample_hash_col(F.col(key_col), seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, key_col: str,
    seed: int = 42, default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum reproducible sample: stratum s keeps rows with
    u(key) < fractions[s] (``default_fraction`` for unlisted strata).
    The fractions table is a driver-known broadcast literal — the
    canonical shape for "keep 10% of English, 100% of low-resource
    languages" corpus-balancing passes."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    u = sample_hash_col(F.col(key_col), seed)
    thr = F.lit(float(default_fraction))
    for s, f in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(float(f))).otherwise(thr)
    return df.filter(u < thr)


def quota_topk(
    df: DataFrame, group_col: str, order_col: str, n: int,
    desc: bool = True, tie_col: str | None = None,
) -> DataFrame:
    """Per-group quota: the top ``n`` rows of each group by ``order_col``
    (ties broken by ``tie_col`` descending for cross-engine determinism).
    The "best k documents per language / per domain" selection step of a
    curation pipeline; one hash-partition window, combiner-friendly."""
    order = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).desc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("qrank", F.row_number().over(w).cast("long"))
        .filter(F.col("qrank") <= n)
    )

"""Composable training-data curation pipeline.

The individual cleaning operators (exact dedup, benchmark
decontamination, quality gates, PII redaction) each exist as oracled
primitives; a real corpus run chains them. ``curate`` is that chain as
ONE lazy DataFrame plan — Catalyst sees every stage at once, so column
pruning and filter ordering happen across stage boundaries (e.g. the
quality tokenization never reads rows dedup already dropped), and
nothing materializes until the caller acts.

Stage order is the cheap-first discipline of web-corpus pipelines:

1. exact dedup (hash groupBy — removes bulk duplicates before anything
   tokenizes them),
2. benchmark decontamination (broadcast n-gram sweep, dedup.py),
3. quality gates (length / stopword-density / repetitiveness Column
   math, textstats.py),
4. PII redaction (regexp projection, textstats.py) — a transform, not a
   filter, so it runs last on the smallest surviving set.

``curate_report`` computes the per-stage survivor counts (one count per
stage boundary) — the funnel a pipeline owner monitors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassjr_spark.operators.dedup import decontaminate, dedup_exact
from jassjr_spark.operators.textstats import quality_scores, redact


@dataclass(frozen=True)
class QualityGates:
    min_tokens: int = 20
    min_stopword_ratio: float = 0.02   # language-ish gate
    min_distinct_ratio: float = 0.35   # repetitiveness gate


def _stages(
    docs: DataFrame,
    benchmark: DataFrame | None,
    gates: QualityGates,
    decon_n: int,
    decon_min_shared: int,
) -> list[tuple[str, DataFrame]]:
    d0 = docs.select("docid", "content")
    d1 = dedup_exact(d0)
    stages = [("input", d0), ("dedup", d1)]
    d2 = d1
    if benchmark is not None:
        contaminated = (
            decontaminate(d1, benchmark, n=decon_n,
                          min_shared=decon_min_shared)
            .select("docid").distinct()
        )
        d2 = d1.join(contaminated, "docid", "left_anti")
        stages.append(("decontaminate", d2))
    q = quality_scores(d2)
    keep = q.filter(
        (F.col("n_tokens") >= gates.min_tokens)
        & (F.col("stopword_ratio") >= gates.min_stopword_ratio)
        & (F.col("distinct_ratio") >= gates.min_distinct_ratio)
    ).select("docid")
    d3 = d2.join(keep, "docid")
    stages.append(("quality", d3))
    return stages


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    gates: QualityGates = QualityGates(),
    decon_n: int = 8,
    decon_min_shared: int = 1,
    redact_pii: bool = True,
) -> DataFrame:
    """docs(docid, content) -> the curated corpus, one lazy plan.

    Output: (docid, content, clean_sha[, n_email, n_number]) — with
    redact_pii the content column IS the scrubbed text and clean_sha
    fingerprints it (the shippable-corpus integrity invariant).
    """
    survivors = _stages(docs, benchmark, gates, decon_n, decon_min_shared)[-1][1]
    if not redact_pii:
        return survivors.withColumn("clean_sha", F.sha2("content", 256))
    r = redact(survivors)
    return r.select(
        "docid", F.col("clean").alias("content"), "clean_sha",
        "n_email", "n_number",
    )


def curate_report(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    gates: QualityGates = QualityGates(),
    decon_n: int = 8,
    decon_min_shared: int = 1,
) -> list[tuple[str, int]]:
    """The stage funnel: [(stage, surviving rows)], input first."""
    return [
        (name, df.count())
        for name, df in _stages(docs, benchmark, gates, decon_n,
                                decon_min_shared)
    ]

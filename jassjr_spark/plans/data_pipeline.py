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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassjr_spark.operators.dedup import decontaminate, dedup_exact
from jassjr_spark.operators.textstats import quality_scores, redact


@dataclass(frozen=True)
class QualityGates:
    min_tokens: int = 20
    min_stopword_ratio: float = 0.02   # language-ish gate
    min_distinct_ratio: float = 0.35   # repetitiveness gate
    # Gopher-style n-gram repetition caps (textstats.repetition_stats);
    # None = gate disabled. A zero-token doc has no character mass to
    # score and fails an ENABLED repetition gate (moot while min_tokens
    # cuts it first).
    max_top2gram_frac: float | None = None
    max_dup5gram_frac: float | None = None


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
    if (gates.max_top2gram_frac is not None
            or gates.max_dup5gram_frac is not None):
        from jassjr_spark.operators.textstats import repetition_stats

        rep = repetition_stats(d2)
        if gates.max_top2gram_frac is not None:
            rep = rep.filter(
                F.col("top2gram_frac") <= gates.max_top2gram_frac
            )
        if gates.max_dup5gram_frac is not None:
            rep = rep.filter(
                F.col("dup5gram_frac") <= gates.max_dup5gram_frac
            )
        keep = keep.join(rep.select("docid"), "docid")
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


def pack_shards(
    df: DataFrame,
    size_col: str,
    order_cols: list[str],
    cap: int,
    cleanup: list | None = None,
) -> DataFrame:
    """df + (shard long): token-budget export sharding — documents in
    ``order_cols`` order are packed into consecutive shards of ~``cap``
    units (tokens, bytes) each, documents never split:

        shard = floor(running_total_BEFORE_this_doc / cap)

    so a shard closes once the docs assigned to it reach the cap (the
    last doc may straddle; an oversized doc advances the counter past
    several ids — shard ids are monotone and may skip). This is the
    writer layout step of a training-data export: shard = output file
    of bounded token count, corpus order preserved.

    Scale path: the running total is a DISTRIBUTED prefix sum — the
    same two-pass shape as index_build.assign_docids (range-partition
    on the order key, per-partition window sum, one collected row of
    partition totals turned into broadcast offsets). No single-task
    global window: the plan has no Exchange SinglePartition (plan-
    gated in tests), so it holds at 10^12 rows. The staged frame is
    checkpoint-pinned for the same reason assign_docids pins it:
    repartitionByRange SAMPLES its bounds, and the totals pass and the
    assignment pass must see identical partition membership.
    ``cleanup`` receives a handle to free the pinned staging (see
    assign_docids).
    """
    from jassjr_spark.operators.index_build import _StagedCleanup

    if cap <= 0:
        raise ValueError("cap must be positive")
    spark = df.sparkSession
    staged = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    if spark.sparkContext.getCheckpointDir():
        staged = staged.checkpoint(eager=False)
    else:
        staged = staged.localCheckpoint(eager=False)
    if cleanup is not None:
        cleanup.append(_StagedCleanup(staged))
    totals = {
        r._pid: r.s
        for r in staged.groupBy("_pid")
        .agg(F.sum(size_col).cast("long").alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0)) + F.col("_off")
    return (
        staged.join(F.broadcast(off_df), "_pid")
        .withColumn("_before", before.cast("long"))
        # integer div, not floor(double /): running totals can pass 2^53
        .withColumn("shard", F.expr(f"_before div {int(cap)}").cast("long"))
        .drop("_pid", "_off", "_before")
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


def mix_weights(
    docs: DataFrame,
    domain_col: str = "lang",
    targets: dict[str, float] | None = None,
    max_upsample: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Domain-mixing resample weights: how much to up/down-sample each
    domain so the shipped corpus hits a target token distribution.

    -> (domain, n_docs, n_tokens, share, target, weight, eff_tokens):
    ``share`` = domain tokens / corpus tokens; ``target`` = requested
    share (uniform across observed domains when ``targets`` is None,
    else normalized from the dict — domains absent from the dict get 0);
    ``weight`` = min(target/share, max_upsample) — the per-doc sampling
    multiplier, capped because upsampling a tiny domain 100x just
    replays the same documents; ``eff_tokens`` = round(n_tokens *
    weight): the token mass the mix actually yields, the number a
    training-run planner budgets with.

    One exploded token count + one domain-sized aggregation; the domain
    table is tiny, so the shares/weights join is a broadcast. This is
    the planning step of data mixing (the execution step is
    sampling.stratified_sample / quota sampling with these weights).
    """
    from jassjr_spark.constants import TOKEN_RE

    tok_count = F.size(
        F.regexp_extract_all(F.lower("content"), F.lit(TOKEN_RE), 0)
    ).cast("long")
    per_domain = (
        docs.select(F.col(domain_col).alias("domain"),
                    tok_count.alias("toks"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("n_tokens"))
    )
    tot = per_domain.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens")
    )
    d = per_domain.crossJoin(F.broadcast(tot))
    if targets is None:
        n_domains = per_domain.count()
        target = F.lit(1.0) / F.lit(float(n_domains))
    else:
        z = sum(targets.values())
        if z <= 0:
            raise ValueError("targets must have positive mass")
        mapping = F.create_map(
            *[F.lit(x) for kv in targets.items()
              for x in (kv[0], kv[1] / z)]
        )
        target = F.coalesce(mapping[F.col("domain")], F.lit(0.0))
    share = F.col("n_tokens").cast("double") / F.col("tot_tokens")
    weight = F.least(target / share, F.lit(float(max_upsample)))
    return d.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(share, round_to).alias("share"),
        F.round(target, round_to).alias("target"),
        F.round(weight, round_to).alias("weight"),
        F.round(F.col("n_tokens").cast("double") * weight, 1)
        .alias("eff_tokens"),
    )

"""Streaming event analytics: funnel, retention cohorts, daily
anomalies, and as-of enrichment recomputed continuously from an event
stream.

These analytics are HOLISTIC — a user's funnel completion, cohort
week, or per-user daily z-score can change retroactively as history
grows, so unlike the windowed/session aggregates (streaming/stateful.py)
they cannot be expressed as a watermarked streaming aggregation with
bounded per-key state. The production shape is therefore the
``foreachBatch`` recompute loop every streaming warehouse uses for
cumulative reports (the same pattern as streaming/search_stream.py):

* each micro-batch lands idempotently in a partitioned event store
  (``epoch=<n>`` subdirectories — a replayed epoch OVERWRITES its own
  partition, so at-least-once foreachBatch delivery still yields an
  exactly-once store);
* the existing BATCH operators (operators/events.py — single-scan
  funnel fold, two-aggregate retention, join-free anomaly z-scores)
  recompute over the whole store and atomically replace the reports.

Scale shape: the store is append-only columnar partitions (at 10^12
events you'd partition by day as well and let the analytics' own
predicate pushdown prune); each recompute is the SAME one-or-two-shuffle
plan the batch path runs, and its trigger cadence — availableNow for a
periodic job, processingTime='10 minutes' for a resident one — bounds
cost per unit time. The stream's cumulative output is, by construction,
IDENTICAL to a batch run over the on-time subset (tested in
tests/test_streaming.py), because it literally is that batch run.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from jassjr_spark.operators.events import (
    asof_join, daily_anomalies, funnel, retention_cohorts,
)

ANALYTICS: dict[str, Callable[..., DataFrame]] = {
    "funnel": funnel,
    "retention": retention_cohorts,
    "anomalies": daily_anomalies,
    # as-of enrichment of the landed events against a REFERENCE table
    # (dimension snapshots, prices, config history) passed as
    # analytics_kwargs={"asof": {"right": <DataFrame>, ...}} — the right
    # side is a driver-held handle, so it can itself be a lazily-read
    # store that grows between triggers
    "asof": asof_join,
}


def start_event_analytics_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    store_path: str,
    output_base: str,
    checkpoint: str,
    analytics: tuple[str, ...] = ("funnel", "retention", "anomalies"),
    analytics_kwargs: dict[str, dict] | None = None,
    trigger_available_now: bool = True,
):
    """events_stream: streaming DataFrame with at least (user_id, ts,
    event_type). Lands each micro-batch under
    ``{store_path}/epoch=<id>``, then rewrites
    ``{output_base}/{analytic}`` parquet from the full store.

    analytics_kwargs: per-analytic keyword overrides, e.g.
    ``{"funnel": {"steps": (...), "within_us": ...},
    "anomalies": {"z": 2.5}}``.
    """
    unknown = set(analytics) - set(ANALYTICS)
    if unknown:
        raise ValueError(f"unknown analytics {sorted(unknown)}; "
                         f"choose from {sorted(ANALYTICS)}")
    kw = analytics_kwargs or {}
    if "asof" in analytics and "right" not in kw.get("asof", {}):
        raise ValueError(
            "the 'asof' analytic needs a reference table: pass "
            "analytics_kwargs={'asof': {'right': <DataFrame>}}"
        )

    def handle(batch: DataFrame, epoch_id: int) -> None:
        # idempotent landing: a replayed epoch rewrites ONLY its own
        # partition directory (overwrite of a static path, not dynamic
        # partition overwrite — no other epoch is touched)
        batch.write.mode("overwrite").parquet(
            f"{store_path}/epoch={epoch_id}"
        )
        # recompute over everything landed so far; basePath keeps the
        # epoch partition column out of the event schema
        all_events = (
            spark.read.option("basePath", store_path)
            .parquet(f"{store_path}/epoch=*")
            .drop("epoch")
        )
        for name in analytics:
            ANALYTICS[name](all_events, **kw.get(name, {})).write.mode(
                "overwrite"
            ).parquet(f"{output_base}/{name}")

    writer = events_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

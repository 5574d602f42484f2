"""Event-time operators over the events table — tumbling-window and
session-window aggregation.

The reference is batch-only full text (SURVEY.md §2.4: no streaming, no
windows), so these are additive training-pipeline capabilities: the same
declarative ops serve batch DataFrames AND Structured Streaming inputs
(streaming/stateful.py drives them with watermarks; windowed aggregation
is Spark's native late-data-tolerant streaming aggregate).

Cross-engine discipline: window boundaries are exchanged as epoch
MICROSECONDS (unix_micros <-> DuckDB epoch_us) — timestamp objects differ
in timezone handling between engines, int64 microseconds never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_tz_ts(events: DataFrame) -> DataFrame:
    """Parquet event timestamps arrive as TimestampNTZ; unix_micros needs
    an instant. The session tz is UTC here, matching DuckDB's
    naive-timestamp-as-UTC epoch_us — int64 micros agree across engines.

    No-op when ts is already an instant: replacing the column would
    produce a fresh attribute and silently DROP a withWatermark tag set
    by a streaming caller (append-mode aggregation then fails)."""
    from pyspark.sql.types import TimestampType

    if isinstance(events.schema["ts"].dataType, TimestampType):
        return events
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type:
    (window_start_us, event_type, n_events, sum_value).

    F.window is epoch-aligned; at 10^12 events this is the canonical
    two-phase hash aggregate (partial per partition, shuffle on the
    (window, type) key), and the SAME expression is a streaming aggregate
    under a watermark."""
    events = _with_tz_ts(events)
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based):
    (user_id, session_start_us, n_events, duration_us).

    Uses F.session_window — Spark's native merging session aggregate
    (streaming-capable with watermarks). duration is last-event minus
    first-event (NOT including the trailing gap, so the quantity is
    engine-independent)."""
    events = _with_tz_ts(events)
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .alias("duration_us"),
        )
        .select("user_id", "session_start_us", "n_events", "duration_us")
    )


def hopping_event_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Hopping (sliding) event-time windows per event_type:
    (window_start_us, event_type, n_events, sum_value) — each event
    lands in window/slide overlapping epoch-aligned windows (the
    trailing-indicator dashboards and rate alerts are computed on).

    Same two-phase hash-aggregate shape as the tumbling variant —
    Spark's F.window(slide=...) expands each row to its member windows
    BEFORE the partial aggregate, so the shuffle carries pre-combined
    (window, type) partials, not x(window/slide) raw rows. Streaming-
    capable under a watermark like every window aggregate here."""
    events = _with_tz_ts(events)
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def top_users_per_window(
    events: DataFrame, window: str = "1 hour", k: int = 3
) -> DataFrame:
    """Per tumbling window: the k most active users ->
    (window_start_us, user_id, n_events, rank). Ties break user_id
    ascending (deterministic across engines). The leaderboard shape:
    one (window, user) hash aggregate, then a rank window PARTITIONED
    BY window — Spark plants partial+final WindowGroupLimit below the
    shuffle for rank <= k, so only k-ish rows per window survive each
    side of the exchange."""
    from pyspark.sql import Window as W

    events = _with_tz_ts(events)
    per_user = events.groupBy(
        F.window("ts", window).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = W.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "user_id", "n_events", "rank",
        )
    )

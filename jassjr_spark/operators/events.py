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


def epoch_bucket(ts, width_us: int):
    """Fixed-width epoch bucket with FLOOR semantics for every epoch,
    including pre-1970 negatives (plain ``(us / W).cast('long')``
    truncates toward zero, merging the buckets either side of epoch 0).
    pmod yields the positive remainder, so the numerator is an exact
    multiple of the width and the double divide is exact: any i64 epoch
    divided by a >=1s width quotients well inside 53 bits."""
    us = F.unix_micros(ts)
    return ((us - F.pmod(us, F.lit(width_us))) / F.lit(width_us)).cast("long")


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Distributed as-of join: each left row gains the RIGHT row with the
    greatest right.ts <= left.ts for the same key (inclusive, i.e.
    DuckDB's ``ASOF LEFT JOIN ... ON l.ts >= r.ts`` semantics); left rows
    with no prior right row keep NULLs.

    Spark has no native as-of join; the scale shape here is the
    union-and-carry construction, NOT a join: tag both inputs, union,
    and per key take ``last(right payload, ignoreNulls) OVER (ORDER BY
    ts, side ROWS UNBOUNDED PRECEDING)``. One shuffle on the key, one
    partition-local sort — the same cost as a co-partitioned merge join
    but with no build side, no skew ambiguity, and it streams at any
    right-side size (a broadcast-range implementation would cap the
    right side). At equal timestamps the right row sorts FIRST
    (side 0 < side 1) so an exactly-simultaneous right row is visible to
    the left row, matching the inclusive >= contract.

    Right rows are pre-deduplicated to one per (key, ts) by taking the
    lexicographic struct-max over the payload columns — ROW-CONSISTENT
    (the winning row's fields stay together; a per-column max() could
    synthesize a row that never existed when payloads have >1 column)
    and reproducible in SQL as max(ROW(...)) / max_by.
    """
    from pyspark.sql import Window as W

    reserved = {"side", "r", "asof"} & set(left.columns)
    if reserved:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)} on the "
            "left input (internal tags + the output struct); rename them "
            "before joining"
        )
    left = _with_tz_ts(left)
    right = _with_tz_ts(right.select(on, ts, *right_cols))

    winner = F.max(F.struct(*[F.col(c) for c in right_cols])).alias("_w")
    right = (
        right.groupBy(on, ts).agg(winner)
        .select(on, ts, *[F.col(f"_w.{c}").alias(c) for c in right_cols])
    )
    r_payload = F.struct(
        F.col(ts).alias("r_ts"), *[F.col(c) for c in right_cols]
    )
    r_tagged = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("side"),
        r_payload.alias("r"),
    )
    l_tagged = left.withColumn("side", F.lit(1)).withColumn(
        "r", F.lit(None).cast(r_tagged.schema["r"].dataType)
    )
    unioned = l_tagged.select(
        *[F.col(c) for c in left.columns], "side", "r"
    ).unionByName(r_tagged, allowMissingColumns=True)

    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("asof", F.last("r", ignorenulls=True).over(w))
    return carried.filter(F.col("side") == 1).drop("side", "r")


def range_join_campaigns(
    events: DataFrame, campaigns: DataFrame
) -> DataFrame:
    """Non-equi range join: events whose timestamp falls inside each
    (possibly overlapping) campaign window -> per-campaign
    (campaign_id, n_events, sum_value). An event inside k overlapping
    windows counts toward all k.

    The scale shape: the campaign table is dimension-tiny, so the right
    plan is an explicit broadcast + nested-loop range predicate (Spark
    cannot hash a BETWEEN) — every executor streams its events partition
    once against the broadcast ranges, no shuffle of the fact side at
    all; the only exchange is the final k-row aggregate. The predicate
    compares int64 epoch micros, never timestamps (engine-portable).
    """
    events = _with_tz_ts(events)
    e = events.select(
        F.unix_micros(F.col("ts")).alias("t"), F.col("value")
    )
    joined = e.join(
        F.broadcast(campaigns),
        (F.col("t") >= F.col("start_us")) & (F.col("t") < F.col("end_us")),
        "inner",
    )
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: cohort = each user's first active epoch
    week (integer floor(epoch_us / week_us) — pure int64 math, no
    calendar functions, so every engine agrees), offset = active week -
    cohort week -> (cohort_week, week_offset, n_users) with n_users =
    distinct users from that cohort active at that offset.

    Two hash aggregates: per-(user, week) distinct (map-side
    combinable), a tiny per-user min() for the cohort, then the final
    (cohort, offset) count — the classic growth-accounting rollup, all
    shuffles on low-cardinality keys."""
    WEEK_US = 7 * 24 * 3600 * 1_000_000
    events = _with_tz_ts(events)
    weekly = events.select(
        "user_id",
        epoch_bucket(F.col("ts"), WEEK_US).alias("week"),
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each prefix of ``steps``, the number
    of users who completed it in order (greedy earliest-completion:
    step i's timestamp is the MIN event time of that type at-or-after
    the user's step i-1 time; the comparison is >=, so same-microsecond
    progressions count, and both engines resolve them identically).
    ``within_us`` optionally requires the whole funnel to finish within
    that horizon of the step-1 time. Returns
    (step, event_type, n_users, conversion) where conversion is the
    ratio to the previous step rounded to 4 places (1.0 at step 1;
    0.0 past an empty step). EVERY step emits a row — zero-survivor
    steps included, matching the SQL oracle's global per-step counts.

    Scale shape: ONE pass, ONE shuffle. Funnel-type events shuffle once
    on user_id into per-user time-sorted arrays, and a JVM-side
    F.aggregate fold walks each array once, greedily filling the k step
    times (ascending scan ⇒ first eligible occurrence == the chained
    MIN — provably the same semantics as the k-CTE oracle; ties sort
    (t, step) so a step-1 event at the same microsecond is visible to
    step 2). k per-step non-null counts + a k-row window finish the
    report. An earlier implementation chained k filter→agg→join passes
    and union'd the survivor sets; Spark re-executed the shared prefix
    per branch (no exchange reuse across the union), costing O(k²)
    scans — measured 11 scans / 13 exchanges for k=4. State here is
    bounded by each user's count of FUNNEL-TYPE events (the groupBy
    collect_list); a pathological bot user bounds at its own event
    count, never the corpus."""
    from pyspark.sql import Window as W

    k = len(steps)
    events = _with_tz_ts(events)
    step_of = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col("event_type")
    ).cast("int")
    e = (
        events.filter(F.col("event_type").isin(list(steps)))
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("t"),
            step_of.alias("s"),
        )
    )
    per_user = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "s"))).alias("evs")
    )

    init = F.array_repeat(F.lit(None).cast("long"), k)

    def visit(acc, x):
        # fill slot i (1-based step i+1) iff: still empty, this event IS
        # that step, the previous step time exists and is <= t, and the
        # horizon from the step-1 time holds. transform reads the OLD
        # acc, which is correct: one event carries exactly one step.
        def slot(v, i):
            prev_ok = F.when(i == 0, F.lit(True)).otherwise(
                (F.element_at(acc, i) <= x["t"])
                & F.element_at(acc, i).isNotNull()
            )
            horizon_ok = (
                F.lit(True) if within_us is None
                else F.when(i == 0, F.lit(True)).otherwise(
                    x["t"] <= F.element_at(acc, 1) + F.lit(int(within_us))
                )
            )
            take = v.isNull() & (x["s"] == i + 1) & prev_ok & horizon_ok
            return F.when(take, x["t"]).otherwise(v)

        return F.transform(acc, slot)

    folded = per_user.select(F.aggregate("evs", init, visit).alias("acc"))
    sums = folded.agg(*[
        F.count(F.element_at("acc", i + 1)).cast("long").alias(f"n{i + 1}")
        for i in range(k)
    ])
    melted = sums.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.col(f"n{i + 1}").alias("n_users"),
            )
            for i in range(k)
        ])).alias("x")
    ).select("x.step", "x.n_users")

    spark = events.sparkSession
    steps_df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps, start=1)],
        "step long, event_type string",
    )
    filled = steps_df.join(melted, "step", "left").withColumn(
        "n_users", F.coalesce(F.col("n_users"), F.lit(0)).cast("long")
    )
    w = W.orderBy("step")  # k rows: the single-partition window is fine
    prev = F.lag("n_users").over(w)
    return filled.select(
        "step", "event_type", "n_users",
        F.when(F.col("step") == 1, F.lit(1.0))
        .when(prev == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_users") / prev, 4))
        .alias("conversion"),
    )



def daily_anomalies(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-user daily-volume anomaly detection: flag (user_id, day)
    cells whose event count exceeds that user's mean daily count by more
    than ``z`` population standard deviations (over the user's ACTIVE
    days). Returns (user_id, day, n_events, z_score) for flagged days.

    Numeric discipline: mean/variance are derived from the exact
    integer sums (sum n, sum n^2, count) with the explicit textbook
    formula, NOT a streaming stddev aggregate — the identical double
    expression on identical integers is bit-identical across engines,
    so the oracle comparison never hinges on summation order. Days are
    integer epoch-day buckets (floor(epoch_us / day_us)), calendar-free.

    Scale shape: two chained hash aggregates — (user, day) then user —
    both map-side combinable, then a join back on user_id; the day-level
    aggregate's exchange already hashes on (user_id, day) and the
    per-user side is tiny (one row per user), so the join costs one
    re-use-or-small shuffle, never a window over the raw stream."""
    DAY_US = 86_400_000_000
    events = _with_tz_ts(events)
    daily = (
        events.select(
            "user_id",
            epoch_bucket(F.col("ts"), DAY_US).alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    per_user = daily.groupBy("user_id").agg(
        F.sum("n_events").cast("long").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    joined = daily.join(per_user, "user_id")
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = F.col("s2").cast("double") / F.col("cnt") - mean * mean
    sigma = F.sqrt(var)
    zscore = (F.col("n_events").cast("double") - mean) / sigma
    return (
        joined.filter((var > 0) & (F.col("n_events") > 0))
        .withColumn("z_score", F.round(zscore, 4))
        .filter(F.col("z_score") > F.lit(float(z)))
        .select("user_id", "day", "n_events", "z_score")
    )

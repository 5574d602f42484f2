"""Two-parallelism scaling probe for the event-analytics operators
(as-of join, funnel, retention, daily anomalies) over a deterministic
synthetic event stream — the north-rule evidence shape (same job, same
input, N vs 4N cores) applied to this family.

    python BENCH/events_scale_job.py <cores> [n_events]

Prints one JSON line; run at two levels and diff:

    python BENCH/events_scale_job.py 4  5000000
    python BENCH/events_scale_job.py 16 5000000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
CORPUS = f"/tmp/jassjr_events_scale_{N_EVENTS}.parquet"


def ensure_events() -> None:
    """Deterministic synthetic stream: event times/users/types derived
    from the event id by pure column math — identical bytes at any
    parallelism, generated distributed (no driver-side loop)."""
    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        return
    from pyspark.sql import functions as F

    from jassjr_spark.session import get_spark

    spark = get_spark("events_gen", master="local[32]")
    types = F.array(*[F.lit(t) for t in
                      ("signup", "view", "click", "purchase", "error")])
    base_us = 1_704_067_200 * 1_000_000
    df = (
        spark.range(N_EVENTS).withColumnRenamed("id", "event_id")
        .withColumn("user_id", F.pmod(F.xxhash64("event_id"), F.lit(200_000)))
        .withColumn(
            "ts",
            F.timestamp_micros(
                base_us
                + F.pmod(F.xxhash64("event_id", F.lit(1)),
                         F.lit(30 * 86_400_000_000))
            ).cast("timestamp_ntz"),
        )
        .withColumn(
            "event_type",
            F.element_at(
                types,
                (F.pmod(F.xxhash64("event_id", F.lit(2)), F.lit(5)) + 1)
                .cast("int"),
            ),
        )
        .withColumn(
            "value",
            (F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(10_000))
             / 100.0),
        )
        .withColumn("props", F.lit(""))
    )
    df.repartition(64).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def main() -> None:
    ensure_events()
    from pyspark.sql import functions as F

    from jassjr_spark.operators.events import (
        asof_join, daily_anomalies, funnel, retention_cohorts,
    )
    from jassjr_spark.session import get_spark

    spark = get_spark("events_scale", master=f"local[{CORES}]",
                      shuffle_partitions=CORES * 2)
    ev = spark.read.parquet(CORPUS).repartition(CORES * 2).cache()
    n = ev.count()  # materialize the cache (generation cost excluded)

    out = {"cores": CORES, "n_events": n}

    t0 = time.perf_counter()
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase")
    # aggregate ON the carried payload: a bare count() would let the
    # optimizer prune the unreferenced window and measure nothing
    asof_join(clicks, purchases).agg(
        F.count("asof.value").alias("n_matched")).collect()
    out["asof_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    funnel(ev, within_us=14 * 86_400_000_000).collect()
    out["funnel_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    retention_cohorts(ev).count()
    out["retention_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    daily_anomalies(ev, z=2.5).count()
    out["anomalies_sec"] = round(time.perf_counter() - t0, 3)

    out["total_sec"] = round(
        out["asof_sec"] + out["funnel_sec"] + out["retention_sec"]
        + out["anomalies_sec"], 3)
    out["events_per_sec"] = round(4 * n / out["total_sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same builder settings are the ones
we would ship for a multi-executor cluster (AQE on, Arrow on, sane shuffle
partitioning). Nothing here is local-mode-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jassjr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # Under spark-submit (its env loader exports SPARK_ENV_LOADED before
    # exec'ing the driver) the launcher owns --master, deploy conf, and
    # driver memory — forcing .master() here would silently turn a cluster
    # submission into local mode. An explicit ``master`` argument still
    # wins (tests pass one on purpose).
    submit_managed = master is None and bool(os.environ.get("SPARK_ENV_LOADED"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not submit_managed:
        master = master or f"local[{cpus}]"
        if shuffle_partitions is None:
            # local[N] → N; cluster → spark-submit conf (AQE coalesces).
            shuffle_partitions = cpus if master.startswith("local") else 256
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "WARN")
    )
    if not submit_managed:
        builder = (
            builder.master(master)
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "24g"))
        )
    elif shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

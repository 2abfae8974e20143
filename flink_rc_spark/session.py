"""SparkSession factory tuned for this engine.

Local-mode defaults match the test box (local[32], single JVM); every
setting is chosen so the *same* logical plans scale to a real cluster:
AQE handles runtime re-planning (partition coalescing, skew joins),
shuffle partitions default to core count locally but would be
raised/auto-coalesced on a cluster, Arrow is on so any pandas-UDF
exchange is columnar.

Note: when the driver calls ``queries()[k](spark, sf_dir)`` it supplies
its *own* session; every query builder must be correct under any
reasonable session config. This factory is for our tests and bench.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "flink_rc_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # The in-memory status store retains ~1000 executions/jobs/
        # stages even with the UI off; across a ~190-query bench sweep
        # that retention taxes the driver (listener bus + heap) and
        # measurably degrades later keys. Keep only a working set.
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.ui.retainedExecutions", "10")
        .config("spark.appStateStore.asyncTracking.enable", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

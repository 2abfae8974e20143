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
        # Scan-split granularity sized to the LOCAL data, not the
        # 128 MB cluster default: the multi-file local tables (sf1
        # lineitem = 16 x 6.5 MB) otherwise pack into ONE split
        # (16 files x (6.5 MB + 4 MB openCost) fits one 128 MB bin),
        # serializing every scan stage — filters, projections,
        # partial aggs — onto a single core; measured q_tpch_q6 at
        # sf1 2.7 s -> 0.4 s with 16-way scans, and the 2 MB bin gives
        # the 8 x 0.7 MB sf1 documents table file-per-split regex
        # parallelism too. Single-file tables
        # are one row group, so this cannot over-split them. On a
        # real lake the defaults are right (files are many and
        # 128 MB amortizes task overhead); these two lines are the
        # local stand-in for that file multiplicity.
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "512k")
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

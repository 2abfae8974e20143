"""AQE skew-join probe: proves the runtime half of the skew story.

The engine's declared skew mitigations are (a) salted aggregation /
salted windows for low-cardinality hot GROUP keys (q_agg_salted,
q_win_salted — oracle-proven equivalent to the straggler spelling) and
(b) **AQE skew-join splitting** for hot JOIN keys. This probe
demonstrates (b) empirically: it synthesizes a join where ONE key owns
~30% of the left side, forces a sort-merge join (broadcast disabled),
and checks the ADAPTIVE final plan for ``skew=true`` — i.e. Spark
split the hot partition into parallel sub-partitions at runtime, the
thing a 1000-executor cluster needs so one straggler task doesn't gate
the stage.

Usage: python tools/skew_probe.py [rows]
Prints the skew flag, partition stats, and wall times with AQE skew
handling on vs off. Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_rc_spark.session import get_spark  # noqa: E402


def build(spark, n_rows: int):
    # left: one hot key (0) owns ~30% of rows; the rest uniform over 10k keys
    left = spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(10_000)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 997).alias("payload"),
    )
    # right: fat enough per key that the join output is real work
    right = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("dim_payload"),
    )
    return left, right


def run_join(spark, n_rows: int, skew_on: bool) -> tuple[float, bool]:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # force sort-merge (no broadcast escape hatch) and make the skew
    # thresholds reachable at probe scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    left, right = build(spark, n_rows)
    j = left.join(right, "k").select(
        F.sum(F.length("dim_payload") + F.col("payload")).alias("s")
    )
    t0 = time.perf_counter()
    j.collect()
    wall = time.perf_counter() - t0
    plan = j._jdf.queryExecution().executedPlan().toString()
    return wall, "skew=true" in plan


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("skew_probe")
    try:
        run_join(spark, n_rows // 10, True)  # warm
        t_on, flag_on = run_join(spark, n_rows, True)
        t_off, flag_off = run_join(spark, n_rows, False)
        print(
            f"rows={n_rows}  hot-key share ~30%\n"
            f"AQE skew ON : {t_on:6.2f}s  skew-split-in-plan={flag_on}\n"
            f"AQE skew OFF: {t_off:6.2f}s  skew-split-in-plan={flag_off}",
            flush=True,
        )
        assert flag_on, "expected skew=true in the adaptive final plan"
        assert not flag_off, "skew split should not appear with skewJoin off"
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

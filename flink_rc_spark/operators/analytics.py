"""Product-analytics operators over the events stream: funnel
conversion and cohort retention.

These are the two canonical "who did what, in what order, when"
queries every event warehouse runs; they compose the declared window /
aggregate / join surface into user-journey analyses the same way the
TPC-H wave composes it into warehouse reports.

Reference parity: none — the reference is a numeric dataflow engine
(SURVEY.md §1.1); this is driver-north-star analytics surface.

100 TB story:
- The funnel is ONE scan and ONE shuffle: events group to their user
  key, the per-user journey folds inside array HOFs (filter/transform/
  array_min — all JVM codegen, no Python), and the final step counts
  are a global partial+final aggregate of 4 counters. No self-joins,
  no per-step re-scan of the fact (the textbook funnel anti-pattern:
  k steps = k joins).
- Cohort retention is one window (min-over-user, reusing the same
  hash partitioning a groupBy would need anyway), one distinct on
  (user, cohort, week) — which AQE-coalesces since week cardinality
  is tiny — and a count-distinct rollup. Per-user event skew is
  bounded by the per-user event volume, the same bound the
  sessionization ops carry.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load


@register(
    "q_funnel_steps",
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS users_total,
               (SELECT COUNT(*) FROM s1) AS reached_view,
               (SELECT COUNT(*) FROM s2) AS reached_click,
               (SELECT COUNT(*) FROM s3) AS reached_purchase
    """,
    tags=("analytics", "agg", "hof"),
)
def q_funnel_steps(spark, sf_dir):
    """Ordered funnel view → click → purchase: a user reaches step k
    only with an event strictly after their step-(k−1) time (first
    qualifying occurrence, the standard strict-ordering funnel).

    The oracle spells it as the straggler 3-pass CTE chain (each step
    re-scans events); the builder folds the whole journey in ONE scan:
    per-user sorted event list → step times via filter/transform/
    array_min HOFs → 4 global counters. The driver hash proves the
    single-pass rewrite equals the 3-pass spelling.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    # step times: earliest qualifying event strictly after the prior step
    j = per_user.withColumn(
        "t1",
        F.expr(
            "array_min(transform(filter(evs, x -> x.event_type = 'view'),"
            " x -> x.ts))"
        ),
    ).withColumn(
        "t2",
        F.expr(
            "array_min(transform(filter(evs, x -> x.event_type = 'click'"
            " AND t1 IS NOT NULL AND x.ts > t1), x -> x.ts))"
        ),
    ).withColumn(
        "t3",
        F.expr(
            "array_min(transform(filter(evs, x -> x.event_type = 'purchase'"
            " AND t2 IS NOT NULL AND x.ts > t2), x -> x.ts))"
        ),
    )
    return j.agg(
        F.count("*").alias("users_total"),
        F.count("t1").alias("reached_view"),
        F.count("t2").alias("reached_click"),
        F.count("t3").alias("reached_purchase"),
    )


@register(
    "q_retention_cohort",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT)
                   AS week_offset,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e
        JOIN first_seen USING (user_id)
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    tags=("analytics", "window", "agg"),
)
def q_retention_cohort(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-activity week,
    counted as active in each subsequent week they produced any event.

    The oracle joins a first-seen CTE back to the fact (two scans);
    the builder computes the cohort week as a min-over-user WINDOW on
    the single scan — the window's hash partitioning on user_id is the
    same exchange the join spelling would need, minus the second scan
    and the join itself. Week arithmetic is integer-exact (both
    engines truncate weeks to Monday 00:00, so the day difference is
    always a multiple of 7).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    cohorted = ev.withColumn(
        "cohort_week", F.date_trunc("week", F.min("ts").over(w))
    ).withColumn("active_week", F.date_trunc("week", F.col("ts")))
    return (
        cohorted.groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q_anomaly_zscore",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(value AS DECIMAL(12,4))
                            * CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sq,
                   COUNT(*) AS n
            FROM events
            GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               CAST(CAST(value AS DECIMAL(12,4)) AS DOUBLE) AS value_q,
               ROUND((CAST(CAST(value AS DECIMAL(12,4)) AS DOUBLE) - s / n)
                     / sqrt((sq - s * s / n) / (n - 1)), 4) AS zscore
        FROM events e
        JOIN stats USING (event_type)
        WHERE abs((CAST(CAST(value AS DECIMAL(12,4)) AS DOUBLE) - s / n)
                  / sqrt((sq - s * s / n) / (n - 1))) > 3.0
        ORDER BY event_id
    """,
    tags=("analytics", "agg"),
)
def q_anomaly_zscore(spark, sf_dir):
    """Z-score outlier detection per event type: events more than 3
    sample standard deviations from their type's mean — the streaming
    monitoring primitive, expressed batch-first.

    Determinism without rounding the WHERE boundary away: values are
    quantized to DECIMAL(12,4) once, then mean and variance come from
    EXACT decimal Σx / Σx² (order-independent), so the double
    std/z-score arithmetic runs on bit-identical inputs in both
    engines and the |z| > 3 cut selects the same rows. 100 TB: the
    stats are a 5-group partial+final agg BROADCAST back over the
    fact — one scan for stats, one for scoring (the same two-pass
    shape as q_subq_scalar); no window over the full fact.
    """
    from flink_rc_spark.functions.exact import dec

    ev = load(spark, sf_dir, "events")
    vq = dec("value", 12, 4)
    stats = ev.groupBy("event_type").agg(
        F.sum(vq).cast("double").alias("s"),
        F.sum(vq * vq).cast("double").alias("sq"),
        F.count("*").alias("n"),
    )
    z = (vq.cast("double") - F.col("s") / F.col("n")) / F.sqrt(
        (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            vq.cast("double").alias("value_q"),
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_id")
    )

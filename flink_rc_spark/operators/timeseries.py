"""Time-series operators: resampling / gap-filling.

Reference parity: the reference consumes dense, index-aligned series
(SURVEY.md §1.1 — (index, vector) tuples); real event data is sparse
and irregular, so the bridge operator a user needs before feeding the
RC module is resample-to-grid. Expressed relationally: a generated
calendar spine x key grid, left-joined against the bucketed
aggregates, with explicit defaults for empty buckets.

100 TB story: the spine is tiny (time span / step — independent of
row count) and broadcast; the aggregation is the usual partial+final
hash agg; the gap-fill join is therefore broadcast-left-join, no
extra shuffle beyond the groupBy. A per-key forward-fill variant is
`last(value, ignorenulls=True)` over a (key, time) window — same
shape as q_win_first_last.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.functions.exact import dsum
from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load


@register(
    "q_ts_resample",
    oracle="""
        WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS mn,
                          date_trunc('hour', MAX(ts)) AS mx
                   FROM events),
        cal AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
                FROM b),
        types AS (SELECT DISTINCT event_type FROM events),
        agg AS (SELECT date_trunc('hour', ts) AS h, event_type,
                       COUNT(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM events GROUP BY 1, 2)
        SELECT cal.h AS hour_start, types.event_type AS event_type,
               COALESCE(agg.n, 0) AS n,
               COALESCE(agg.total, 0.0) AS total
        FROM cal CROSS JOIN types
        LEFT JOIN agg ON agg.h = cal.h AND agg.event_type = types.event_type
        ORDER BY hour_start, types.event_type
    """,
)
def q_ts_resample(spark, sf_dir):
    """Resample events to a dense hourly grid per event_type,
    zero-filling empty buckets — the sparse-to-dense bridge the RC
    pipeline needs (the reference assumes dense indexed series).
    """
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        dsum("value", 18, 2).alias("total"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(mn, mx, INTERVAL 1 HOUR)")).alias("h")
    )
    types = e.select("event_type").distinct()
    grid = cal.crossJoin(types)
    return (
        grid.join(agg, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("hour_start"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("hour_start", "event_type")
    )

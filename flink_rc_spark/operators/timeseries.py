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

from pyspark.sql import Window
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


@register(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               lag(event_type) OVER w AS prev_type,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, ts, event_type, rn
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id,
           event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY rn) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY rn) IS NULL
               AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
    tags=("timeseries", "window"),
)
def q_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension (type 2) build from an event stream —
    the warehouse pattern for "what was each user's state over time":
    collapse each user's consecutive runs of the same event_type into
    [valid_from, valid_to) intervals, open-ended on the current run
    (gaps-and-islands via lag-compare + lead).

    Scale: two windows over the SAME (user_id)-partitioned ordering —
    Spark plans ONE exchange + sort and reuses it for both window
    operators; the change filter shrinks the second window's input to
    the run boundaries. No global sort, no self-join (the naive SCD2
    spelling joins the table to itself on adjacency).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    nxt = F.lead("ts").over(w2)
    return (
        changes.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "q_ts_interpolate",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS mn,
                      date_trunc('hour', MAX(ts)) AS mx
               FROM events),
    cal AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
            FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (SELECT date_trunc('hour', ts) AS h, event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(value) AS v
            FROM events GROUP BY 1, 2),
    grid AS (
        SELECT cal.h, types.event_type, agg.v
        FROM cal CROSS JOIN types
        LEFT JOIN agg ON agg.h = cal.h AND agg.event_type = types.event_type
    ),
    ctx AS (
        SELECT h, event_type, v,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wp AS ph,
               first_value(v IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wf AS nh
        FROM grid
        WINDOW wp AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT h AS hour_start, event_type,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                     pv + (nv - pv)
                          * (CAST(epoch(h) - epoch(ph) AS DOUBLE)
                             / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
                WHEN pv IS NOT NULL THEN pv
                ELSE nv END AS v_interp,
           v IS NULL AS is_interpolated
    FROM ctx
    ORDER BY event_type, hour_start
    """,
    tags=("timeseries", "window"),
)
def q_ts_interpolate(spark, sf_dir):
    """Linear interpolation over the dense hourly grid: missing hours
    get pv + (nv-pv) * elapsed-fraction between the nearest known
    neighbors (forward/backward fill at the edges) — the gap-repair
    step between resampling and any model that assumes dense series
    (the RC pipeline included).

    Mechanics: IGNORE NULLS last_value/first_value over mirrored
    unbounded frames find each gap's bracketing observations without
    a self-join or explode-per-gap. The interpolation arithmetic is
    spelled in the same operation order on both engines over
    exactly-agreed inputs (decimal-exact hourly means, integer epoch
    deltas), so the doubles hash-match. Scale: one exchange per window
    partition key (event_type), grid size = hours x types.
    """
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        (dsum("value", 18, 2) / F.count("value")).alias("v")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(mn, mx, INTERVAL 1 HOUR)")).alias("h")
    )
    types = e.select("event_type").distinct()
    grid = cal.crossJoin(types).join(agg, ["h", "event_type"], "left")

    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("h"))
    ctx = grid.select(
        "h",
        "event_type",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_h, ignorenulls=True).over(wf).alias("nh"),
    )
    frac = (
        (F.unix_timestamp("h") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return ctx.select(
        F.col("h").alias("hour_start"),
        "event_type",
        interp.alias("v_interp"),
        F.col("v").isNull().alias("is_interpolated"),
    ).orderBy("event_type", "hour_start")


@register(
    "q_ts_ewma",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               list_reduce(list(value ORDER BY ts, event_id),
                           (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("timeseries", "hof", "agg"),
)
def q_ts_ewma(spark, sf_dir):
    """Exponentially weighted moving average (α=0.25) of each user's
    event values in time order — the classic smoothing recurrence
    s_t = α·x_t + (1−α)·s_{t−1}, seeded with the first observation.

    A recurrence is a sequential fold, and both engines run list folds
    left-to-right (Spark `aggregate` with null-init-then-seed ≡ DuckDB
    `list_reduce`, which seeds from the first element), so with the
    exact binary fractions 0.25/0.75 every intermediate double is
    BIT-IDENTICAL cross-engine — no rounding needed even though this
    is float arithmetic. Ordering ties break on event_id, making the
    fold order total.

    This is the same shape the RC module's reservoir recurrence uses
    (state folded along a time-ordered series, parallel across
    series); expressing the scalar case as a pure JVM array fold shows
    the recurrence family needs Python only when state is a vector.
    100 TB: one hash agg keyed on the series id; per-series memory =
    the series (the same per-key bound every sessionization op has).
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        F.expr(
            "aggregate(transform(s, x -> x.value), CAST(NULL AS DOUBLE),"
            " (acc, x) -> IF(acc IS NULL, x, 0.25 * x + 0.75 * acc))"
        ).alias("ewma"),
    ).orderBy("user_id")


@register(
    "q_scd2_lookup",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               lag(event_type) OVER w AS prev_type,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, ts, event_type, rn
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    dim AS (
        SELECT user_id, event_type,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY rn) AS valid_to
        FROM changes
    ),
    probes AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_id % 97 = 0
    )
    SELECT p.event_id, p.user_id, p.ts,
           d.event_type AS state_at_ts, d.valid_from
    FROM probes p
    JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    ORDER BY p.event_id
    """,
    tags=("timeseries", "join", "window"),
)
def q_scd2_lookup(spark, sf_dir):
    """Point-in-time (temporal) lookup against the SCD2 dimension:
    for a deterministic ~1% probe set of events, find the version row
    whose [valid_from, valid_to) interval covers the probe timestamp —
    the "what was this user's state WHEN the fact happened" join every
    versioned-dimension warehouse runs.

    The intervals partition each user's timeline (half-open,
    consecutive), so every probe matches EXACTLY one version — row
    count == probe count is part of what the hash verifies. Plan: the
    dim build reuses q_scd2_intervals' one-exchange double window; the
    temporal join is an equi-join on user_id with the range condition
    as a residual predicate — never a cartesian, and at 100 TB both
    sides bucket by the same user key (the dim is tiny relative to
    facts after run-collapse).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state_at_ts"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    probes = e.filter(F.col("event_id") % 97 == 0).select(
        "event_id", "user_id", "ts"
    )
    return (
        probes.join(
            dim,
            (F.col("d_user") == F.col("user_id"))
            & (F.col("valid_from") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select("event_id", "user_id", "ts", "state_at_ts", "valid_from")
        .orderBy("event_id")
    )


@register(
    "q_ts_forecast_eval",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            FROM events
            GROUP BY event_type, h
        ),
        lagged AS (
            SELECT event_type, h, v,
                   lag(v, 168) OVER (PARTITION BY event_type ORDER BY h)
                       AS forecast
            FROM hourly
        )
        SELECT event_type,
               COUNT(forecast) AS n_eval,
               CAST(SUM(CAST(ROUND(abs(v - forecast), 2) AS DECIMAL(18,2)))
                    AS DOUBLE) / COUNT(forecast) AS mae,
               CAST(SUM(CASE WHEN v > forecast THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_over
        FROM lagged
        WHERE forecast IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("timeseries", "window", "agg"),
)
def q_ts_forecast_eval(spark, sf_dir):
    """Seasonal-naive forecast evaluation: predict each hour's volume
    with the same hour LAST WEEK (lag 168 on the hourly series) and
    score MAE per event type — the baseline any learned forecaster
    (the RC module's ESN included; tests/test_rc.py asserts the ESN
    beats naive persistence on Mackey-Glass) must beat, expressed as a
    declared query so the eval itself is hash-verified.

    Exactness: hourly sums are decimal; |v − forecast| of two exact
    doubles is deterministic, rounded to cents and routed back through
    DECIMAL for the order-free MAE numerator. One exchange: the hourly
    agg, the lag window, and the final agg share the event_type
    partitioning.
    """
    from flink_rc_spark.functions.exact import dsum

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value", 18, 2).alias("v"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.withColumn("forecast", F.lag("v", 168).over(w)).filter(
        F.col("forecast").isNotNull()
    )
    abs_err = F.round(F.abs(F.col("v") - F.col("forecast")), 2).cast(
        "decimal(18,2)"
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("forecast").alias("n_eval"),
            (F.sum(abs_err).cast("double") / F.count("forecast")).alias("mae"),
            F.sum(F.when(F.col("v") > F.col("forecast"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_over"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_changepoint_cusum — CUSUM changepoint detection per series
# ---------------------------------------------------------------------------


@register(
    "q_changepoint_cusum",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   SUM(CAST(value AS DECIMAL(12,4))) AS s
            FROM events
            GROUP BY 1, 2
        ),
        pre AS (
            SELECT event_type, day, s,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS idx,
                   CAST(SUM(s) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING)
                        AS DECIMAL(18,4)) AS prefix,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_days,
                   CAST(SUM(s) OVER (PARTITION BY event_type)
                        AS DECIMAL(18,4)) AS total
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ),
        scored AS (
            SELECT event_type, day, n_days,
                   abs(CAST(n_days AS DECIMAL(6,0)) * prefix
                       - CAST(idx AS DECIMAL(6,0)) * total) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(CAST(n_days AS DECIMAL(6,0)) * prefix
                                    - CAST(idx AS DECIMAL(6,0)) * total) DESC,
                                day ASC) AS rk
            FROM pre
        )
        SELECT event_type, day AS cp_day, n_days,
               ROUND(CAST(score AS DOUBLE) / n_days, 4) AS max_abs_cusum
        FROM scored
        WHERE rk = 1
        ORDER BY event_type
    """,
    tags=("timeseries", "window", "agg"),
)
def q_changepoint_cusum(spark, sf_dir):
    """CUSUM changepoint detection on each event type's daily-total
    series: the day where the cumulative deviation from the series
    mean |Σ_{i≤d}(s_i − μ)| peaks — the classic single-changepoint
    estimator (level-shift localization) a monitoring pipeline runs
    over its metric rollups.

    Exactness trick: the textbook statistic needs μ = total/n (an
    inexact double). Scaling by n keeps everything in integers/
    decimals: n·Σprefix − idx·total = n·(prefix − idx·μ), so the
    ARGMAX is taken over exact decimal scores — both engines pick the
    same day even when two days differ in the 15th digit — and only
    the reported magnitude divides by n (one IEEE op, rounded).
    Precision is kept in-range by quantizing daily sums to
    DECIMAL(18,4) and the n/idx factors to DECIMAL(6,0), so products
    stay ≤ 25 digits in BOTH engines (no silent Spark precision-loss
    rounding at 38).

    100 TB: one hash agg to daily grain (the cardinality crusher —
    everything after runs on |types|×|days| rows), two windows
    partitioned by type, one ranking window. The same shape batch
    rollup + anomaly scoring takes at warehouse scale; no UDF, no
    driver loop.
    """
    from flink_rc_spark.functions.exact import dec

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(dec("value", 12, 4)).alias("s"))

    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).cast("bigint").alias("idx"),
        F.sum("s").over(w_run).cast("decimal(18,4)").alias("prefix"),
        F.count("*").over(w_all).cast("bigint").alias("n_days"),
        F.sum("s").over(w_all).cast("decimal(18,4)").alias("total"),
    )
    score = F.abs(
        F.col("n_days").cast("decimal(6,0)") * F.col("prefix")
        - F.col("idx").cast("decimal(6,0)") * F.col("total")
    )
    scored = pre.select(
        "event_type",
        "day",
        "n_days",
        score.alias("score"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                score.desc(), F.col("day").asc()
            )
        )
        .alias("rk"),
    )
    return (
        scored.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            "n_days",
            F.round(F.col("score").cast("double") / F.col("n_days"), 4).alias(
                "max_abs_cusum"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q_ts_acf",
    oracle="""
    WITH lagged AS (
        SELECT user_id,
               CAST(FLOOR(value) AS BIGINT) AS q,
               lag(CAST(FLOOR(value) AS BIGINT), 1) OVER w AS q1,
               lag(CAST(FLOOR(value) AS BIGINT), 2) OVER w AS q2,
               lag(CAST(FLOOR(value) AS BIGINT), 3) OVER w AS q3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sums AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(q) AS s,
               SUM(q * q) AS qq,
               SUM(q * q1) AS c1, SUM(q * q2) AS c2, SUM(q * q3) AS c3,
               SUM(CASE WHEN q1 IS NOT NULL THEN q END) AS a1,
               SUM(CASE WHEN q2 IS NOT NULL THEN q END) AS a2,
               SUM(CASE WHEN q3 IS NOT NULL THEN q END) AS a3,
               SUM(q1) AS b1, SUM(q2) AS b2, SUM(q3) AS b3
        FROM lagged GROUP BY user_id
    )
    SELECT user_id, n,
           CASE WHEN n * n * qq - n * s * s = 0 THEN NULL ELSE
             CAST(n * n * c1 - n * s * (a1 + b1) + (n - 1) * s * s AS DOUBLE)
             / CAST(n * n * qq - n * s * s AS DOUBLE) END AS acf1,
           CASE WHEN n * n * qq - n * s * s = 0 THEN NULL ELSE
             CAST(n * n * c2 - n * s * (a2 + b2) + (n - 2) * s * s AS DOUBLE)
             / CAST(n * n * qq - n * s * s AS DOUBLE) END AS acf2,
           CASE WHEN n * n * qq - n * s * s = 0 THEN NULL ELSE
             CAST(n * n * c3 - n * s * (a3 + b3) + (n - 3) * s * s AS DOUBLE)
             / CAST(n * n * qq - n * s * s AS DOUBLE) END AS acf3
    FROM sums
    WHERE n >= 8
    ORDER BY user_id
    """,
    tags=("timeseries", "window", "agg"),
)
def q_ts_acf(spark, sf_dir):
    """Per-series AUTOCORRELATION function at lags 1-3 — the
    diagnostic every forecasting pipeline runs before choosing model
    order (Box-Jenkins identification), and the seasonality probe for
    the RC module's input series.

    FLOAT POLICY — one division, everything else integer: the textbook
    estimator r_k = SUM((x_t - mean)(x_{t-k} - mean)) / SUM((x - mean)^2)
    subtracts a float mean per row, which no cross-engine hash
    survives. Multiplying both sides through by n^2 (mean = s/n)
    turns numerator and denominator into pure BIGINT combinations of
    map-side sums:

        num_k * n^2 = n^2*C_k - n*s*(A_k + B_k) + (n-k)*s^2
        den   * n^2 = n^2*Q   - n*s^2

    with C_k = SUM(q_t*q_{t-k}), A_k/B_k the head/tail partial sums
    and Q = SUM(q^2), all over integer units q = FLOOR(value). The
    single final BIGINT/BIGINT division is bit-identical cross-engine.
    Constant series (den = 0) yield NULL, not a div-by-zero.

    100 TB: lag alignment is one (user_id) shuffle; the twelve sums
    ride a partial+final hash agg on the SAME partitioning (no second
    exchange — lag and groupBy share the key). Integer headroom: with
    q <= 1e3 the n^2*C_k term stays under 9.2e18 up to ~1e6 rows per
    series; past that, swap the BIGINT sums for DECIMAL(38,0) (no
    cross-engine constraint in production).
    """
    ev = load(spark, sf_dir, "events")
    q = F.floor("value").cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        q.alias("q"),
        F.lag(q, 1).over(w).alias("q1"),
        F.lag(q, 2).over(w).alias("q2"),
        F.lag(q, 3).over(w).alias("q3"),
    )
    sums = lagged.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
        F.sum(F.col("q") * F.col("q1")).alias("c1"),
        F.sum(F.col("q") * F.col("q2")).alias("c2"),
        F.sum(F.col("q") * F.col("q3")).alias("c3"),
        F.sum(F.when(F.col("q1").isNotNull(), F.col("q"))).alias("a1"),
        F.sum(F.when(F.col("q2").isNotNull(), F.col("q"))).alias("a2"),
        F.sum(F.when(F.col("q3").isNotNull(), F.col("q"))).alias("a3"),
        F.sum("q1").alias("b1"),
        F.sum("q2").alias("b2"),
        F.sum("q3").alias("b3"),
    )
    n, s = F.col("n"), F.col("s")
    den = n * n * F.col("qq") - n * s * s

    def acf(k: int):
        num = (
            n * n * F.col(f"c{k}")
            - n * s * (F.col(f"a{k}") + F.col(f"b{k}"))
            + (n - F.lit(k)) * s * s
        )
        return F.when(den != 0, num.cast("double") / den.cast("double"))

    return (
        sums.filter(n >= 8)
        .select(
            "user_id",
            "n",
            acf(1).alias("acf1"),
            acf(2).alias("acf2"),
            acf(3).alias("acf3"),
        )
        .orderBy("user_id")
    )


@register(
    "q_ts_decompose",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                        * 10000 AS BIGINT) AS x_micro
            FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
        ), tr AS (
            SELECT event_type, d, x_micro,
                   CASE WHEN CAST(COUNT(*) OVER w AS BIGINT) = 7
                        THEN CAST(SUM(x_micro) OVER w AS BIGINT) // 7
                   END AS trend_micro
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ), seas AS (
            -- exact-floor signed division: shift the dividend positive by
            -- K*cnt (K = 1e16 bounds |detrended sum| by construction), floor
            -- on positives (// == div == trunc), shift back
            SELECT event_type, date_diff('day', DATE '1970-01-01', d) % 7 AS dow,
                   (CAST(SUM(x_micro - trend_micro) AS BIGINT)
                      + 10000000000000000 * CAST(COUNT(*) AS BIGINT))
                     // CAST(COUNT(*) AS BIGINT) - 10000000000000000 AS seas_micro
            FROM tr WHERE trend_micro IS NOT NULL
            GROUP BY event_type, date_diff('day', DATE '1970-01-01', d) % 7
        )
        SELECT tr.event_type,
               CAST(date_diff('day', DATE '1970-01-01', tr.d) AS BIGINT)
                 AS day_epoch,
               tr.x_micro, tr.trend_micro, seas.seas_micro,
               tr.x_micro - tr.trend_micro - seas.seas_micro AS resid_micro
        FROM tr
        JOIN seas ON tr.event_type = seas.event_type
                 AND date_diff('day', DATE '1970-01-01', tr.d) % 7 = seas.dow
        WHERE tr.trend_micro IS NOT NULL
    """,
    tags=("timeseries", "window"),
)
def q_ts_decompose(spark, sf_dir):
    """Additive seasonal-trend decomposition of the daily value series
    per event type: trend = centered 7-day moving average (full
    windows only), seasonal = day-of-week mean of the detrended
    series, residual = x − trend − seasonal.

    Integer-exact throughout: daily sums are DECIMAL cents lifted to
    micro-units (×1e4); the MA divides positive integers (floor ==
    trunc, both engines agree); the seasonal mean's dividend CAN be
    negative — Spark div truncates while DuckDB // floors — so it
    uses the exact-floor shift idiom: add K·cnt (K = 1e16 bounds the
    detrended sum), divide positive, subtract K. Day-of-week =
    epoch_day mod 7 (no locale/weekstart dependence).

    Plan: one hash agg to |types|×|days| rows; the MA window
    partitions by type (parallel, tiny); the seasonal frame is
    |types|×7 rows joined back broadcast. Decomposing 100 TB of raw
    events costs exactly the daily-rollup agg — everything after is
    bounded by the calendar, not the data.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        (
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("long")
            * 10000
        )
        .cast("long")
        .alias("x_micro")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "d",
        "x_micro",
        F.when(
            F.count("*").over(w) == 7, F.sum("x_micro").over(w).cast("long")
        ).alias("ma_sum"),
    ).withColumn(
        "trend_micro", F.expr("ma_sum div 7")
    ).drop("ma_sum")
    dow = (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7).alias(
        "dow"
    )
    seas = (
        tr.filter(F.col("trend_micro").isNotNull())
        .groupBy("event_type", dow)
        .agg(
            F.expr(
                "(CAST(SUM(x_micro - trend_micro) AS BIGINT)"
                " + 10000000000000000L * COUNT(*))"
                " div COUNT(*) - 10000000000000000L"
            ).alias("seas_micro")
        )
    )
    out = (
        tr.filter(F.col("trend_micro").isNotNull())
        .withColumn(
            "dow", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7
        )
        .join(F.broadcast(seas), ["event_type", "dow"])
    )
    return out.select(
        "event_type",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_epoch"),
        "x_micro",
        "trend_micro",
        "seas_micro",
        (
            F.col("x_micro") - F.col("trend_micro") - F.col("seas_micro")
        ).alias("resid_micro"),
    )


@register(
    "q_ts_outlier_mad",
    oracle="""
        WITH x AS (
            SELECT event_type, event_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events
        ), med AS (
            SELECT event_type, cents AS median_c
            FROM (
                SELECT event_type, cents,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY cents, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM x
            ) WHERE rn = (n + 1) // 2
        ), dev AS (
            SELECT x.event_type, x.event_id, x.cents,
                   ABS(x.cents - med.median_c) AS ad
            FROM x JOIN med ON x.event_type = med.event_type
        ), mad AS (
            SELECT event_type, ad AS mad_c
            FROM (
                SELECT event_type, ad,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY ad, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM dev
            ) WHERE rn = (n + 1) // 2
        )
        SELECT dev.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(med.median_c) AS median_c,
               MAX(mad.mad_c) AS mad_c,
               CAST(SUM(CASE WHEN dev.ad > 3 * mad.mad_c THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev
        JOIN med ON dev.event_type = med.event_type
        JOIN mad ON dev.event_type = mad.event_type
        GROUP BY dev.event_type
    """,
    tags=("timeseries", "stats", "window"),
)
def q_ts_outlier_mad(spark, sf_dir):
    """Robust outlier screen per event type: median and MAD (median
    absolute deviation) via EXACT order-statistic selection (the
    lower median, rank (n+1) div 2, tie-broken by event_id), then
    count of points with |x − median| > 3·MAD — the standard
    robust-z rule with integer cents end-to-end (no percentile
    interpolation, no floats).

    Plan: two selection passes, each a per-type window over the
    type partition (parallel; the same shuffle a groupBy needs), the
    5-row median/MAD frames broadcast back, one grouped reduce. The
    100 TB upgrade for the selection is the classic two-pass
    histogram-then-narrow exact median (bucket counts, then select
    within the winning bucket) — same integer algebra.
    """
    ev = load(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    wt = Window.partitionBy("event_type")
    med = (
        x.select(
            "event_type",
            "cents",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("cents", "event_id"))
            .alias("rn"),
            F.count("*").over(wt).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("cents").alias("median_c"))
    )
    dev = x.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "cents",
        F.abs(F.col("cents") - F.col("median_c")).alias("ad"),
    )
    mad = (
        dev.select(
            "event_type",
            "ad",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("ad", "event_id"))
            .alias("rn"),
            F.count("*").over(wt).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("ad").alias("mad_c"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("median_c").alias("median_c"),
            F.max("mad_c").alias("mad_c"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad_c"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# q_ts_holt — Holt linear (double-exponential) smoothing, struct-fold
# ---------------------------------------------------------------------------


@register(
    "q_ts_holt",
    oracle="""
        WITH RECURSIVE d0 AS (
            SELECT event_type,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS DOUBLE) AS x,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY (CAST(ts AS DATE) - DATE '1970-01-01')
                   ) AS idx
            FROM events
            GROUP BY event_type, (CAST(ts AS DATE) - DATE '1970-01-01')
        ), nn AS (
            SELECT event_type, CAST(MAX(idx) AS BIGINT) AS n_days
            FROM d0 GROUP BY event_type
        ), r AS (
            SELECT d1.event_type, CAST(1 AS BIGINT) AS idx,
                   d1.x AS l, d2.x - d1.x AS b
            FROM d0 d1
            JOIN d0 d2 ON d2.event_type = d1.event_type AND d2.idx = 2
            WHERE d1.idx = 1
            UNION ALL
            SELECT r.event_type, r.idx + 1,
                   5e-1 * ((d.x + r.l) + r.b),
                   5e-1 * (5e-1 * ((d.x + r.l) + r.b) - r.l) + 5e-1 * r.b
            FROM r JOIN d0 d
              ON d.event_type = r.event_type AND d.idx = r.idx + 1
        )
        SELECT r.event_type, nn.n_days,
               ROUND(r.l, 4) AS level_c,
               ROUND(r.b, 4) AS trend_c,
               ROUND(r.l + 7e0 * r.b, 4) AS fcst7_c
        FROM r JOIN nn ON nn.event_type = r.event_type
        WHERE r.idx = nn.n_days
        ORDER BY r.event_type
    """,
    tags=("timeseries", "hof", "agg"),
)
def q_ts_holt(spark, sf_dir):
    """Holt linear-trend (double-exponential) smoothing of each event
    type's daily revenue, α = β = 0.5, seeded l₁ = x₁, b₁ = x₂ − x₁:
    final level, trend, and the 7-day-ahead forecast l + 7b — the
    first-line trending forecast next to q_ts_ewma's level-only
    smoothing (q_ts_forecast_eval scores this family).

    Determinism: TWO-variable recurrences fold exactly like EWMA's
    scalar one — the accumulator is a struct. 0.5 multiplies are
    exact halvings; every add/subtract is spelled in the SAME
    association ((x + l) + b) in the Spark fold lambda and the
    oracle's recursive CTE, so each intermediate double is
    BIT-IDENTICAL cross-engine and only the reported values round.
    Spark folds a per-series array (pure JVM — vector state needs
    Python, struct state does not); DuckDB iterates the same steps
    recursively.

    Plan at 100 TB: daily hash agg crushes the fact to |types|×|days|;
    the fold is O(days) per series inside one row. Millions of
    independent series parallelize as rows; only horizon-length state
    lives at once.
    """
    ev = load(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("d"),
    ).agg(F.sum(cents).cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(d, x))), s -> s.x)")
        .alias("xv"),
        F.count("*").alias("n_days"),
    )
    fold = F.expr(
        "aggregate(slice(xv, 2, size(xv) - 1),"
        " named_struct('l', element_at(xv, 1),"
        "              'b', element_at(xv, 2) - element_at(xv, 1)),"
        " (acc, x) -> named_struct("
        "   'l', 5e-1 * ((x + acc.l) + acc.b),"
        "   'b', 5e-1 * (5e-1 * ((x + acc.l) + acc.b) - acc.l)"
        "        + 5e-1 * acc.b))"
    )
    return (
        series.filter(F.col("n_days") >= 2)
        .select("event_type", "n_days", fold.alias("st"))
        .select(
            "event_type",
            "n_days",
            F.round(F.col("st.l"), 4).alias("level_c"),
            F.round(F.col("st.b"), 4).alias("trend_c"),
            F.round(F.col("st.l") + F.expr("7e0") * F.col("st.b"), 4).alias(
                "fcst7_c"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_ts_cross_corr — lagged cross-correlation between two daily series
# ---------------------------------------------------------------------------

_XC_R_EXPR = """
    CASE WHEN n > 1
          AND n * sxx - sx * sx > 0
          AND n * syy - sy * sy > 0 THEN
        ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
              6)
    END
"""


@register(
    "q_ts_cross_corr",
    oracle=f"""
        WITH daily AS (
            SELECT (CAST(ts AS DATE) - DATE '1970-01-01') AS d,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ), lags AS (
            SELECT CAST(t.range AS BIGINT) AS lg FROM range(0, 8) t
        ), pairs AS (
            SELECT l.lg, a.x, b.y
            FROM lags l
            JOIN daily a ON TRUE
            JOIN daily b ON b.d = a.d + l.lg
        ), m AS (
            SELECT lg,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pairs GROUP BY lg
        )
        SELECT lg, n, {_XC_R_EXPR} AS r_xy
        FROM m
        ORDER BY lg
    """,
    tags=("timeseries", "stats", "join"),
)
def q_ts_cross_corr(spark, sf_dir):
    """Lagged cross-correlation (lags 0–7 days) between daily click
    volume and daily purchase volume — "do clicks lead purchases, and
    by how many days?", the lead-lag diagnostic behind attribution
    windows (q_ts_acf is the self-correlation sibling).

    Exactness: daily counts are integers; per-lag Pearson moments are
    exact BIGINT sums over the (30 − lag)-pair frame; r is one shared
    double expression rounded once, NULL-guarded for degenerate
    variance.

    Plan at 100 TB: the fact collapses to the 30-row daily frame in
    one hash agg; the lag join is an equi-join on (d + lag) over
    8 × 30 bounded rows. At a decade of days this is still thousands
    of rows — the lag sweep never touches the fact twice.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    lags = spark.range(0, 8).select(F.col("id").alias("lg"))
    a = daily.select(F.col("d").alias("da"), "x")
    b = daily.select(F.col("d").alias("db"), "y")
    pairs = (
        lags.join(F.broadcast(a), F.lit(True))
        .join(b, F.col("db") == F.col("da") + F.col("lg"))
    )
    m = pairs.groupBy("lg").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return m.select("lg", "n", F.expr(_XC_R_EXPR).alias("r_xy")).orderBy(
        "lg"
    )


# ---------------------------------------------------------------------------
# q_ts_sax — SAX symbolization of the daily revenue series
# ---------------------------------------------------------------------------

# z-score pipeline shared by both engines, evaluated on exact integer
# moments (sx BIGINT, sxx DECIMAL(38,0) — daily-cents squares pass
# BIGINT near sf10): population sigma, one sqrt (IEEE-exact), and the
# Gaussian quartile breakpoints +-0.6745 for the 4-letter alphabet.
_SAX_Z = """
    (CAST(paa_num AS DOUBLE) / paa_den - CAST(sx AS DOUBLE) / n)
        / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n)
"""
_SAX_SYMBOL = f"""
    CASE WHEN {_SAX_Z} < -0.6745 THEN 'a'
         WHEN {_SAX_Z} < 0.0 THEN 'b'
         WHEN {_SAX_Z} < 0.6745 THEN 'c'
         ELSE 'd' END
"""
_SAX_W = 8  # PAA segments per series


@register(
    "q_ts_sax",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1
                       AS i,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM daily
        ),
        mom AS (
            SELECT event_type, MAX(n) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sx,
                   SUM(CAST(cents AS DECIMAL(19,0))
                       * CAST(cents AS DECIMAL(19,0))) AS sxx
            FROM idx GROUP BY event_type
        ),
        seg AS (
            SELECT event_type,
                   CAST(i * {_SAX_W} // n AS BIGINT) AS seg,
                   CAST(SUM(cents) AS BIGINT) AS paa_num,
                   COUNT(*) AS paa_den
            FROM idx
            WHERE n >= {_SAX_W}
            GROUP BY event_type, i * {_SAX_W} // n
        )
        SELECT s.event_type, s.seg, s.paa_den AS n_days,
               ROUND({_SAX_Z}, 4) AS paa_z,
               {_SAX_SYMBOL} AS symbol
        FROM seg s JOIN mom m USING (event_type)
        ORDER BY s.event_type, s.seg
    """,
    tags=("timeseries", "window", "agg"),
)
def q_ts_sax(spark, sf_dir):
    """SAX (Symbolic Aggregate approXimation) of each event type's
    daily-revenue series: z-normalize against the series' own mean and
    population sigma, Piecewise Aggregate Approximation into
    {_SAX_W} equal-occupancy segments (seg = floor(i*w/n)), then map
    each segment mean to the 4-letter alphabet at the Gaussian
    quartile breakpoints +-0.6745 — the symbolic index that powers
    motif discovery / anomaly search over massive series collections
    (Lin/Keogh's SAX; the symbol string is what a 100 TB store
    actually indexes instead of raw points).

    Determinism: daily cents are exact integers; series moments are
    exact (sxx through DECIMAL(38,0)); the z-score and the breakpoint
    comparisons are ONE shared double-expression text in both engines
    (sqrt is IEEE-correctly-rounded), so the symbol never straddles an
    engine difference.

    100 TB: fact -> daily hash agg (the cardinality crusher), then two
    per-type windows over |days| rows and a segment hash agg; the
    alphabet mapping is pure scalar codegen. Series parallelize as
    types/keys.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
        .cast("bigint")
        .alias("d"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type",
        "cents",
        (F.row_number().over(w) - 1).alias("i"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    mom = idx.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
        F.sum(
            F.col("cents").cast("decimal(19,0)")
            * F.col("cents").cast("decimal(19,0)")
        ).alias("sxx"),
    )
    seg = (
        idx.filter(F.col("n") >= _SAX_W)
        .groupBy(
            "event_type",
            F.expr(f"CAST(i * {_SAX_W} DIV n AS BIGINT)").alias("seg"),
        )
        .agg(
            F.sum("cents").cast("bigint").alias("paa_num"),
            F.count("*").alias("paa_den"),
        )
    )
    return (
        seg.join(mom.drop("n_days"), "event_type")
        .select(
            "event_type",
            "seg",
            F.col("paa_den").alias("n_days"),
            F.expr(f"ROUND({_SAX_Z}, 4)").alias("paa_z"),
            F.expr(_SAX_SYMBOL).alias("symbol"),
        )
        .orderBy("event_type", "seg")
    )


# ---------------------------------------------------------------------------
# q_ts_dtw — dynamic-time-warping distance between daily share series
# ---------------------------------------------------------------------------

_DTW_INF = 10**15  # barrier; real path costs stay <= days * 1e6


@register(
    "q_ts_dtw",
    oracle=f"""
        WITH b AS (
            SELECT CAST(epoch(date_trunc('day', MIN(ts))) / 86400 AS BIGINT)
                       AS mn,
                   CAST(epoch(date_trunc('day', MAX(ts))) / 86400 AS BIGINT)
                       AS mx
            FROM events
        ),
        spine AS (SELECT unnest(generate_series(mn, mx)) AS d FROM b),
        types AS (SELECT DISTINCT event_type FROM events),
        daily AS (
            SELECT event_type,
                   CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, s.d, COALESCE(a.cents, 0) AS cents
            FROM spine s CROSS JOIN types t
            LEFT JOIN daily a ON a.d = s.d AND a.event_type = t.event_type
        ),
        tot AS (
            SELECT event_type, CAST(SUM(cents) AS BIGINT) AS total
            FROM grid GROUP BY event_type
        ),
        ser AS (
            SELECT g.event_type,
                   list(CAST(g.cents * 1000000 // t.total AS BIGINT)
                        ORDER BY g.d) AS s
            FROM grid g JOIN tot t USING (event_type)
            WHERE t.total > 0
            GROUP BY g.event_type
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(len(a.s) AS BIGINT) AS n_days,
               list_reduce(
                   list_prepend(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, len(b.s)+1),
                                          j -> CAST({_DTW_INF} AS BIGINT))),
                       list_transform(a.s, x -> [x])),
                   (prev, xl) -> list_reduce(
                       list_prepend([CAST({_DTW_INF} AS BIGINT)],
                           list_transform(range(1, len(b.s)+1),
                                          j -> [CAST(j AS BIGINT)])),
                       (row, jl) -> list_append(row,
                           abs(xl[1] - b.s[jl[1]])
                           + least(prev[jl[1]+1], prev[jl[1]], row[jl[1]])))
               )[len(b.s)+1] AS dtw_micro
        FROM ser a JOIN ser b ON a.event_type < b.event_type
        ORDER BY type_a, type_b
    """,
    tags=("timeseries", "join"),
)
def q_ts_dtw(spark, sf_dir):
    """Dynamic-time-warping distance between every pair of event
    types' daily revenue-SHARE series (each day's share of the type's
    total, in exact micro-units on the dense zero-filled day spine) —
    the elastic similarity measure for series whose shapes align
    under local time shifts, where Euclidean (lockstep) comparison
    breaks; the standard distance for series clustering / motif
    retrieval at warehouse scale.

    EXACT: shares are integer micro-units (floor division, positive
    operands), the |x-y| costs and the full DP are integer-only, and
    both engines run the identical left-fold — the outer fold carries
    the previous DP row, the inner fold builds the new row left to
    right (Spark nested ``aggregate``; DuckDB nested ``list_reduce``
    with the list-prepend-init encoding since its reduce seeds from
    the first element) — so dtw_micro hash-matches with no float
    anywhere.

    100 TB: series materialize as ONE array row per key via the
    resample spine (q_ts_resample's shape); the O(n*m) DP runs
    in-row, JVM-side, per pair — pairs parallelize as rows, and a
    banded DP (|i-j| <= w) is the documented refinement when series
    get long (the fold shape is unchanged, the inner range shrinks).
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
        .cast("bigint")
        .alias("d"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    b = ev.agg(
        (F.unix_timestamp(F.date_trunc("day", F.min("ts"))) / 86400)
        .cast("bigint")
        .alias("mn"),
        (F.unix_timestamp(F.date_trunc("day", F.max("ts"))) / 86400)
        .cast("bigint")
        .alias("mx"),
    )
    spine = b.select(F.explode(F.expr("sequence(mn, mx)")).alias("d"))
    types = ev.select("event_type").distinct()
    grid = (
        spine.crossJoin(types)
        .join(daily, ["event_type", "d"], "left")
        .select(
            "event_type", "d", F.coalesce("cents", F.lit(0)).alias("cents")
        )
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("cents").cast("bigint").alias("total")
    )
    ser = (
        grid.join(tot, "event_type")
        .filter(F.col("total") > 0)
        .select(
            "event_type",
            "d",
            F.expr("CAST(cents * 1000000 DIV total AS BIGINT)").alias("share"),
        )
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(d, share))), p -> p.share)"
            ).alias("s")
        )
    )
    a = ser.select(F.col("event_type").alias("type_a"), F.col("s").alias("sa"))
    bb = ser.select(F.col("event_type").alias("type_b"), F.col("s").alias("sb"))
    dtw_expr = f"""
        element_at(
            aggregate(sa,
                array(CAST(0 AS BIGINT)) || array_repeat(CAST({_DTW_INF} AS BIGINT), size(sb)),
                (prev, x) -> aggregate(sequence(1, size(sb)),
                    array(CAST({_DTW_INF} AS BIGINT)),
                    (row, j) -> row || array(
                        abs(x - element_at(sb, CAST(j AS INT)))
                        + least(element_at(prev, CAST(j AS INT) + 1),
                                element_at(prev, CAST(j AS INT)),
                                element_at(row, CAST(j AS INT)))))),
            size(sb) + 1)
    """
    return (
        a.join(bb, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.size("sa").cast("bigint").alias("n_days"),
            F.expr(dtw_expr).alias("dtw_micro"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# q_win_regr_slope — rolling 7-day OLS slope per event type
# ---------------------------------------------------------------------------

# slope = (n*sxy - sx*sy) / (n*sxx - sx*sx) on exact BIGINT window
# sums (x = epoch-day, y = daily cents); NULL until the window holds
# 2 distinct days
_SLOPE_EXPR = """
    CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 THEN
        ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
    END
"""


@register(
    "q_win_regr_slope",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, d, cents,
                   COUNT(*) OVER w AS n,
                   CAST(SUM(d) OVER w AS BIGINT) AS sx,
                   CAST(SUM(cents) OVER w AS BIGINT) AS sy,
                   CAST(SUM(d * d) OVER w AS BIGINT) AS sxx,
                   CAST(SUM(d * cents) OVER w AS BIGINT) AS sxy
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, d, cents,
               CAST(n AS BIGINT) AS n_days,
               {_SLOPE_EXPR} AS slope_7d
        FROM win
        ORDER BY event_type, d
    """,
    tags=("timeseries", "window"),
)
def q_win_regr_slope(spark, sf_dir):
    """Rolling 7-day ordinary-least-squares slope of each event type's
    daily revenue (cents/day trend) — the windowed regression readout
    behind "is this metric trending up this week?" dashboards, the
    moving sibling of q_regr_fit's global fit.

    Exactness: the five regression moments are exact BIGINT sums over
    the 7-row frame (integer association-free), and the slope is one
    shared double expression, rounded once — NULL until the frame has
    two distinct days (degenerate denominator guarded).

    100 TB: the fact collapses to the daily frame first (the
    cardinality crusher), then ONE (event_type)-partitioned ordered
    window serves all five moment sums — a single exchange + sort,
    frames never rescan the fact.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
        .cast("bigint")
        .alias("d"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "event_type",
        "d",
        "cents",
        F.count("*").over(w).alias("n"),
        F.sum("d").over(w).cast("bigint").alias("sx"),
        F.sum("cents").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("d") * F.col("d")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("d") * F.col("cents")).over(w).cast("bigint").alias("sxy"),
    )
    return win.select(
        "event_type",
        "d",
        "cents",
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(_SLOPE_EXPR).alias("slope_7d"),
    ).orderBy("event_type", "d")


# ---------------------------------------------------------------------------
# q_seasonality_strength — weekly-seasonality eta² per event-type series
# ---------------------------------------------------------------------------


@register(
    "q_seasonality_strength",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events
            GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
        ), wk AS (
            -- weekday as explicit epoch-day arithmetic (1970-01-05 is
            -- a Monday): no engine dayofweek() convention in play
            SELECT event_type,
                   CAST((d - DATE '1970-01-05') AS BIGINT) % 7 AS wd,
                   x
            FROM daily
        ), grp AS (
            SELECT event_type, wd,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(x) AS BIGINT) AS s_g
            FROM wk GROUP BY event_type, wd
        ), tot AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM wk GROUP BY event_type
        ), between_ AS (
            SELECT event_type,
                   CAST(SUM((s_g * s_g) // n_g) AS BIGINT) AS term
            FROM grp GROUP BY event_type
        )
        SELECT t.event_type, t.n AS n_days,
               CAST(t.n * b.term - t.s * t.s AS BIGINT) AS ssb_scaled,
               CAST(t.n * t.q - t.s * t.s AS BIGINT) AS sst_scaled,
               CASE WHEN t.n * t.q - t.s * t.s > 0 THEN
                   ROUND(CAST(t.n * b.term - t.s * t.s AS DOUBLE)
                         / CAST(t.n * t.q - t.s * t.s AS DOUBLE), 6)
               END AS strength
        FROM tot t JOIN between_ b ON t.event_type = b.event_type
        ORDER BY t.event_type
    """,
    tags=("timeseries", "stats", "agg"),
)
def q_seasonality_strength(spark, sf_dir):
    """WEEKLY-SEASONALITY STRENGTH per event type: eta² of the daily
    event-volume series grouped by weekday (the variance share
    explained by day-of-week) — the readout that decides whether a
    forecast needs a weekly component (q_ts_decompose's 7-day
    smoother) or the series is seasonality-free.

    Exactness: one-way-ANOVA algebra multiplied through by N so both
    sides are integers: SST·N = N·Q − S² is pure BIGINT; for SSB·N the
    per-weekday S_g²/n_g is floor-quantized (S_g² DIV n_g — positive
    operands, truncation ≡ floor; 7 groups, each floor loses < 1
    count² against ~1e10-scale terms, and BOTH engines floor the same
    exact rational, so the quantized statistic IS the contract).
    Weekday comes from explicit epoch-day arithmetic (days since
    Monday 1970-01-05, mod 7) — no engine dayofweek() convention in
    play. Headroom: N·Σterm < 2^63 to ~3e4 daily counts over 10 years
    (≈ sf100); DECIMAL(38,0) past that.

    Plan at 100 TB: the daily rollup is the only fact-sized work (one
    hash agg); weekday/total/between frames are |types|x7 and |types|
    rows riding the same partitioning.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").cast("bigint").alias("x"))
    wk = daily.select(
        "event_type",
        (F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("bigint")
        .alias("wd"),
        "x",
    )
    grp = wk.groupBy("event_type", "wd").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("x").cast("bigint").alias("s_g"),
    )
    tot = wk.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    between = grp.groupBy("event_type").agg(
        F.sum(F.expr("(s_g * s_g) DIV n_g")).cast("bigint").alias("term")
    )
    j = tot.join(between, "event_type")
    ssb = (F.col("n") * F.col("term") - F.col("s") * F.col("s")).cast(
        "bigint"
    )
    sst = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("bigint")
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        ssb.alias("ssb_scaled"),
        sst.alias("sst_scaled"),
        F.when(
            sst > 0,
            F.round(ssb.cast("double") / sst.cast("double"), 6),
        ).alias("strength"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q_rescaled_range — R/S statistic (Hurst-exponent proxy) per series
# ---------------------------------------------------------------------------


@register(
    "q_rescaled_range",
    oracle="""
        WITH c AS (
            SELECT user_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS x,
                   ROW_NUMBER() OVER w AS t,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) OVER w AS BIGINT) AS p
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), tot AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q,
                   CAST(MAX(n_p_minus_ts) AS BIGINT) AS zmax,
                   CAST(MIN(n_p_minus_ts) AS BIGINT) AS zmin
            FROM (
                SELECT user_id, x,
                       CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                           * p
                       - t * CAST(SUM(x) OVER (PARTITION BY user_id)
                                  AS BIGINT) AS n_p_minus_ts
                FROM c
            )
            GROUP BY user_id
        )
        SELECT user_id, n,
               CAST(zmax - zmin AS BIGINT) AS range_scaled,
               CAST(n * q - s * s AS BIGINT) AS var_scaled,
               ROUND(CAST(zmax - zmin AS DOUBLE)
                     / (CAST(n AS DOUBLE)
                        * sqrt(CAST(n * q - s * s AS DOUBLE))), 6)
                   AS rs_stat
        FROM tot
        WHERE n >= 16 AND n * q - s * s > 0
        ORDER BY user_id
    """,
    tags=("timeseries", "stats"),
)
def q_rescaled_range(spark, sf_dir):
    """RESCALED-RANGE (R/S) statistic per user value series — the
    Hurst-exponent building block that separates trending (R/S grows
    like n^H, H > 0.5), mean-reverting (H < 0.5), and random-walk
    behavior; the long-memory diagnostic quant/capacity pipelines run
    before fitting any AR model.

    FLOAT POLICY — integers until the last expression: the cumulative
    deviation Z_t = P_t − t·mean multiplied through by n gives
    n·P_t − t·S, a pure BIGINT per row; R·n = max−min of that column.
    S_dev·n = sqrt(n·(n·Q − S²))·... — spelled as R/S =
    (zmax − zmin) / (n · sqrt(n·Q − S²)/sqrt(n)) reduced to ONE
    division and ONE IEEE-exact sqrt on exact integers:
    rs = (zmax−zmin) / (n·sqrt(n·Q−S²)) · n^{1/2}·... — the reported
    rs_stat keeps the simpler exact contract
    (zmax−zmin)/(n·sqrt(n·Q−S²)), a fixed rescaling of the classical
    R/S by sqrt(n) that preserves the cross-series ordering and the
    H-regime comparisons at fixed n. range_scaled and var_scaled are
    exact BIGINTs for any downstream re-normalization.

    Plan at 100 TB: ONE (user_id) exchange shared by the prefix-sum
    window and the rollup (same key, no second shuffle); per-series
    work is linear. Headroom: n·P_t < 2^63 to ~4e4 events/user at
    cents ≤ 5e4 (documented, per-series bound).
    """
    ev = load(spark, sf_dir, "events")
    x = F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    c = ev.select(
        "user_id",
        x.alias("x"),
        F.row_number().over(w).cast("bigint").alias("t"),
        F.sum(x).over(w).cast("bigint").alias("p"),
    )
    z = c.select(
        "user_id",
        "x",
        (
            F.count("*").over(w_all).cast("bigint") * F.col("p")
            - F.col("t") * F.sum("x").over(w_all).cast("bigint")
        ).alias("n_p_minus_ts"),
    )
    tot = z.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
        F.max("n_p_minus_ts").cast("bigint").alias("zmax"),
        F.min("n_p_minus_ts").cast("bigint").alias("zmin"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    var_scaled = (n * q - s * s).cast("bigint")
    rng = (F.col("zmax") - F.col("zmin")).cast("bigint")
    return (
        tot.filter((n >= 16) & (var_scaled > 0))
        .select(
            "user_id",
            "n",
            rng.alias("range_scaled"),
            var_scaled.alias("var_scaled"),
            F.round(
                rng.cast("double")
                / (n.cast("double") * F.sqrt(var_scaled.cast("double"))),
                6,
            ).alias("rs_stat"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q_interval_sweep — concurrent-open-orders profile (sweep line)
# ---------------------------------------------------------------------------


@register(
    "q_interval_sweep",
    oracle="""
        WITH iv AS (
            SELECT o.o_orderkey,
                   o.o_orderdate AS open_d,
                   MAX(l.l_shipdate) AS close_d
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
        ), deltas AS (
            SELECT open_d AS d, CAST(1 AS BIGINT) AS delta FROM iv
            UNION ALL
            SELECT close_d + INTERVAL 1 DAY, CAST(-1 AS BIGINT) FROM iv
        ), daily AS (
            SELECT CAST(d AS DATE) AS d,
                   CAST(SUM(delta) AS BIGINT) AS delta
            FROM deltas GROUP BY CAST(d AS DATE)
        ), swept AS (
            SELECT d,
                   CAST(SUM(delta) OVER (ORDER BY d) AS BIGINT)
                       AS open_orders
            FROM daily
        ), ranked AS (
            SELECT d, open_orders,
                   ROW_NUMBER() OVER (ORDER BY open_orders DESC, d) AS rk
            FROM swept
        )
        SELECT rk, d AS peak_day, open_orders
        FROM ranked WHERE rk <= 5
        ORDER BY rk
    """,
    tags=("timeseries", "analytics", "window"),
)
def q_interval_sweep(spark, sf_dir):
    """SWEEP-LINE interval concurrency: each order is an open interval
    from order date to its last lineitem ship date; the sweep (+1 at
    open, −1 the day after close, cumulative over days) yields the
    exact number of simultaneously-open orders per day — reported as
    the top-5 peak days, the warehouse-capacity / WIP readout that a
    naive day×interval containment join computes at O(days·orders)
    while the sweep is O(orders + distinct days).

    Exactness: pure integer deltas and cumulative sums; peak ranking
    tie-broken by day.

    Plan at 100 TB: the interval build is one (orderkey) hash agg
    (co-partitioned with the lineitem join key); deltas collapse to
    ONE row per distinct day before the cumulative window, so the
    window runs over the ~|days| frame regardless of order volume —
    the 2-pass range-partitioned prefix sum swaps in past ~1e9
    distinct days (i.e. never).
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_d"))
    )
    deltas = iv.select(
        F.col("o_orderdate").alias("d"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        iv.select(
            F.date_add("close_d", 1).alias("d"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("bigint").alias("delta"))
    # cumulative sweep via the two-phase range-bucketed scan (no
    # single-partition window over the day spine), top-5 peaks via
    # TakeOrdered; the rank over the captured 5-row frame is the
    # structurally-bounded window the plan audit exempts
    from flink_rc_spark.operators.windows import global_scan_salted

    swept = global_scan_salted(
        daily,
        F.col("d").cast("timestamp").cast("double"),
        ["d"],
        [{"kind": "sum", "value": F.col("delta"), "out": "_cum",
          "exclusive": False}],
    ).select("d", F.col("_cum").cast("bigint").alias("open_orders"))
    top5 = swept.orderBy(F.desc("open_orders"), "d").limit(5)
    w_rk = Window.orderBy(F.desc("open_orders"), "d")
    return (
        top5.withColumn("rk", F.row_number().over(w_rk))
        .select("rk", F.col("d").alias("peak_day"), "open_orders")
        .orderBy("rk")
    )

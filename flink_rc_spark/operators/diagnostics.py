"""Model-diagnostic statistics: Jarque-Bera normality, Ljung-Box
portmanteau autocorrelation, and Cronbach's alpha reliability — the
residual / instrument checks a forecasting or survey pipeline runs
after fitting.

Reference parity: none — the reference is a numeric dataflow engine
(SURVEY.md §1.1); this is driver-north-star analytics surface, the
same family as q_anova_oneway / q_ts_acf.

Float policy (SURVEY.md §4.2): every statistic reduces to exact
INTEGER / DECIMAL moment sums first; the double algebra on top is
spelled from ONE shared SQL string evaluated by BOTH engines
(F.expr == oracle text), so the expression trees — and therefore the
IEEE rounding sequences — are identical. sqrt is IEEE-exact
(correctly rounded), so m2^1.5 is written m2*sqrt(m2); no other
transcendental appears.

100 TB story: each key is one scan + one hash agg to a bounded frame
(per-event-type / per-user / single-row); the double algebra runs on
that bounded frame. Integer headroom is documented per key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load


# ---------------------------------------------------------------------------
# q_jarque_bera — JB normality test per event type
# ---------------------------------------------------------------------------

# shared double algebra over the exact moment sums (nd, s1..s4 already
# cast to DOUBLE) — the SAME string runs in Spark and DuckDB so both
# engines execute the identical IEEE tree. Central moments via raw
# moments; skew = m3/(m2*sqrt(m2)); kurt = m4/m2^2;
# JB = n/6 * (skew^2 + (kurt-3)^2/4)
_JB_MU = "(s1d / nd)"
_JB_M2 = f"(s2d / nd - {_JB_MU} * {_JB_MU})"
_JB_M3 = (
    f"(s3d / nd - 3e0 * {_JB_MU} * (s2d / nd)"
    f" + 2e0 * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_M4 = (
    f"(s4d / nd - 4e0 * {_JB_MU} * (s3d / nd)"
    f" + 6e0 * {_JB_MU} * {_JB_MU} * (s2d / nd)"
    f" - 3e0 * {_JB_MU} * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_SKEW = f"({_JB_M3} / ({_JB_M2} * sqrt({_JB_M2})))"
_JB_KURT = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}))"
_JB_STAT = (
    f"(nd / 6e0 * ({_JB_SKEW} * {_JB_SKEW}"
    f" + ({_JB_KURT} - 3e0) * ({_JB_KURT} - 3e0) / 4e0))"
)


@register(
    "q_jarque_bera",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   CAST(SUM(c * c) AS BIGINT) AS s2,
                   CAST(SUM(CAST(c * c AS HUGEINT) * c) AS DECIMAL(38,0))
                       AS s3,
                   CAST(SUM(CAST(c * c AS HUGEINT) * (c * c))
                        AS DECIMAL(38,0)) AS s4
            FROM (
                SELECT event_type,
                       CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                           AS c
                FROM events
            ) GROUP BY event_type
        ), d AS (
            SELECT event_type, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(s1 AS DOUBLE) AS s1d,
                   CAST(s2 AS DOUBLE) AS s2d,
                   CAST(s3 AS DOUBLE) AS s3d,
                   CAST(s4 AS DOUBLE) AS s4d
            FROM m
        )
        SELECT event_type, n,
               ROUND({_JB_SKEW}, 6) AS skewness,
               ROUND({_JB_KURT}, 6) AS kurtosis,
               ROUND({_JB_STAT}, 6) AS jb_stat,
               {_JB_STAT} > 5.991465e0 AS reject_normal
        FROM d
        ORDER BY event_type
    """,
    tags=("stats", "diagnostics"),
)
def q_jarque_bera(spark, sf_dir):
    """JARQUE-BERA normality test of event values per event type — the
    residual-diagnostic every regression/forecast pipeline runs
    (JB = n/6·(S² + (K−3)²/4) ~ χ²₂; reject at the 5% critical value
    5.991465). Skewness and excess kurtosis are reported alongside so
    the readout says HOW normality fails, not just that it does.

    Exactness: the four raw moment sums are exact integers over cents
    (Σc, Σc² in BIGINT; c³ and c⁴ computed per-row in 128-bit —
    DECIMAL(19,0) products in Spark, HUGEINT in DuckDB — and summed
    into DECIMAL(38,0), exact while c⁴ < 1e38 i.e. cents < 1.78e9,
    effectively unbounded for a money domain; sf0.1's 56,021-cent max
    overflowed the earlier BIGINT c⁴ path, caught by the bench sweep).
    The double
    algebra on top is ONE shared SQL string evaluated by both engines
    (identical IEEE tree); sqrt is IEEE-correctly-rounded so
    m2^1.5 = m2·sqrt(m2) carries no libm risk.

    Plan at 100 TB: one scan → one partial+final hash agg to
    |event_type| rows; the moment algebra is driver-scale; the
    128-bit per-row products stay inside whole-stage codegen.
    """
    ev = load(spark, sf_dir, "events")
    c = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    rows = ev.select("event_type", c.alias("c"))
    m = rows.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.sum(
            F.expr(
                "CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"
                " * CAST(c AS DECIMAL(19,0))"
            ).cast("decimal(38,0)")
        ).alias("s3"),
        F.sum(
            F.expr(
                "(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))"
                " * (CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))"
            ).cast("decimal(38,0)")
        ).alias("s4"),
    )
    d = m.select(
        "event_type",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("s1").cast("double").alias("s1d"),
        F.col("s2").cast("double").alias("s2d"),
        F.col("s3").cast("double").alias("s3d"),
        F.col("s4").cast("double").alias("s4d"),
    )
    return d.select(
        "event_type",
        "n",
        F.expr(f"ROUND({_JB_SKEW}, 6)").alias("skewness"),
        F.expr(f"ROUND({_JB_KURT}, 6)").alias("kurtosis"),
        F.expr(f"ROUND({_JB_STAT}, 6)").alias("jb_stat"),
        F.expr(f"{_JB_STAT} > 5.991465e0").alias("reject_normal"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q_ljung_box — portmanteau autocorrelation test per series
# ---------------------------------------------------------------------------

# Q_LB = n(n+2) * Σ_{k=1..3} ρ_k² / (n−k) over the q_ts_acf exact
# integer autocorrelation algebra (num_k, den are BIGINT combinations
# of map-side sums; ρ_k = num_k/den is the only division). Fixed
# 3-term sum written explicitly — one IEEE order.
_LB_TERM = (
    "((CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE))"
    " * (CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE))"
    " / CAST(n - {k} AS DOUBLE))"
)
_LB_STAT = (
    f"(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2e0)"
    f" * (({_LB_TERM.format(k=1)} + {_LB_TERM.format(k=2)})"
    f" + {_LB_TERM.format(k=3)}))"
)


@register(
    "q_ljung_box",
    oracle=f"""
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
    ),
    alg AS (
        SELECT user_id, n,
               CAST(n * n * c1 - n * s * (a1 + b1) + (n - 1) * s * s
                    AS BIGINT) AS num1,
               CAST(n * n * c2 - n * s * (a2 + b2) + (n - 2) * s * s
                    AS BIGINT) AS num2,
               CAST(n * n * c3 - n * s * (a3 + b3) + (n - 3) * s * s
                    AS BIGINT) AS num3,
               CAST(n * n * qq - n * s * s AS BIGINT) AS den
        FROM sums WHERE n >= 8
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           ROUND({_LB_STAT}, 6) AS lb_stat,
           {_LB_STAT} > 7.814728e0 AS reject_white_noise
    FROM alg
    WHERE den <> 0
    ORDER BY user_id
    """,
    tags=("stats", "diagnostics", "timeseries"),
)
def q_ljung_box(spark, sf_dir):
    """LJUNG-BOX portmanteau test (lags 1-3) per user event series —
    "is this series white noise, or does autocorrelation remain?" —
    the companion readout to q_ts_acf that turns its three
    coefficients into ONE χ²₃ decision (5% critical value 7.814728),
    i.e. the residual-whiteness gate after any forecast fit.

    Exactness: reuses q_ts_acf's n²-multiplied integer algebra — each
    ρ_k is a BIGINT/BIGINT ratio; Q = n(n+2)·Σρ_k²/(n−k) is a fixed
    3-term double expression spelled from ONE shared SQL string, so
    both engines fold the identical IEEE sequence. Constant series
    (den = 0) are excluded, as in q_ts_acf.

    Plan at 100 TB: identical to q_ts_acf — lag alignment and the
    twelve sums share ONE (user_id) exchange; the test algebra runs on
    the per-series rollup. Integer headroom ~1e6 rows/series at
    q ≤ 1e3 (q_ts_acf's documented bound), DECIMAL(38,0) past that.
    """
    from pyspark.sql import Window

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
    alg = (
        sums.filter(n >= 8)
        .select(
            "user_id",
            "n",
            (
                n * n * F.col("c1")
                - n * s * (F.col("a1") + F.col("b1"))
                + (n - 1) * s * s
            )
            .cast("bigint")
            .alias("num1"),
            (
                n * n * F.col("c2")
                - n * s * (F.col("a2") + F.col("b2"))
                + (n - 2) * s * s
            )
            .cast("bigint")
            .alias("num2"),
            (
                n * n * F.col("c3")
                - n * s * (F.col("a3") + F.col("b3"))
                + (n - 3) * s * s
            )
            .cast("bigint")
            .alias("num3"),
            (n * n * F.col("qq") - n * s * s).cast("bigint").alias("den"),
        )
        .filter(F.col("den") != 0)
    )
    return alg.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"ROUND({_LB_STAT}, 6)").alias("lb_stat"),
        F.expr(f"{_LB_STAT} > 7.814728e0").alias("reject_white_noise"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q_cronbach_alpha — internal-consistency reliability across item scores
# ---------------------------------------------------------------------------


@register(
    "q_cronbach_alpha",
    oracle="""
        WITH cells AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY user_id, event_type
        ), nu AS (
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM cells
        ), item AS (
            -- per-item variance numerator over ALL users (absent
            -- (user,item) cells are exact zeros: they add 0 to both
            -- sums, so only n_users must come from the full roster)
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                   CAST(SUM(vnum) AS BIGINT) AS item_var_num
            FROM (
                SELECT event_type,
                       (SELECT n_users FROM nu) * SUM(x * x)
                           - SUM(x) * SUM(x) AS vnum
                FROM cells GROUP BY event_type
            )
        ), tot AS (
            SELECT CAST((SELECT n_users FROM nu) * SUM(t * t)
                        - SUM(t) * SUM(t) AS BIGINT) AS total_var_num
            FROM (
                SELECT user_id, SUM(x) AS t FROM cells GROUP BY user_id
            )
        )
        SELECT i.k, (SELECT n_users FROM nu) AS n_users,
               i.item_var_num, t.total_var_num,
               ROUND((CAST(i.k AS DOUBLE) / (CAST(i.k AS DOUBLE) - 1e0))
                     * (1e0 - CAST(i.item_var_num AS DOUBLE)
                            / CAST(t.total_var_num AS DOUBLE)), 6)
                   AS alpha
        FROM item i, tot t
    """,
    tags=("stats", "diagnostics"),
)
def q_cronbach_alpha(spark, sf_dir):
    """CRONBACH'S ALPHA internal-consistency reliability, treating the
    5 event types as survey items and each user's per-type event count
    as the item score — "do these engagement signals measure one
    underlying trait?" (the instrument check before averaging signals
    into a single engagement score).

    Exactness: α = k/(k−1)·(1 − Σᵢvarᵢ/var_total) where every variance
    NUMERATOR n·Σx² − (Σx)² is an exact BIGINT — the n² denominators
    cancel between the ratio's sides, so no float variance is ever
    materialized; α is ONE double expression on three exact integers.
    Absent (user,item) cells are exact zeros: they contribute 0 to Σx
    and Σx², so only n_users needs the full roster (one distinct
    count).

    Plan at 100 TB: one (user_id, event_type) hash agg is the only
    fact-sized work; the item rollup (k rows), the per-user totals
    (rides the same cells frame), and the single-row combine are all
    bounded. Headroom: n_users·Σx² < 2^63 holds to ~1e9 users at
    ~100 events/user-item; DECIMAL(38,0) past that.
    """
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("x")
    )
    nu = cells.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    per_item = (
        cells.groupBy("event_type")
        .agg(
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum("x").cast("bigint").alias("sx"),
        )
        .crossJoin(F.broadcast(nu))
        .select(
            (
                F.col("n_users") * F.col("sxx") - F.col("sx") * F.col("sx")
            ).alias("vnum")
        )
    )
    item = per_item.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("vnum").cast("bigint").alias("item_var_num"),
    )
    tot = (
        cells.groupBy("user_id")
        .agg(F.sum("x").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
            F.sum("t").cast("bigint").alias("st"),
        )
        .crossJoin(F.broadcast(nu))
        .select(
            (
                F.col("n_users") * F.col("stt") - F.col("st") * F.col("st")
            )
            .cast("bigint")
            .alias("total_var_num"),
            "n_users",
        )
    )
    return item.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_users",
        "item_var_num",
        "total_var_num",
        F.round(
            (F.col("k").cast("double") / (F.col("k").cast("double") - 1.0))
            * (
                F.lit(1.0)
                - F.col("item_var_num").cast("double")
                / F.col("total_var_num").cast("double")
            ),
            6,
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# q_iqr_outliers — Tukey-fence outlier audit per event type
# ---------------------------------------------------------------------------


@register(
    "q_iqr_outliers",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
            FROM events
        ), vals AS (
            SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY event_type, v
        ), cum AS (
            SELECT event_type, v,
                   CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY v)
                        AS BIGINT) AS cumn,
                   CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
                       AS tot
            FROM vals
        ), quart AS (
            SELECT event_type,
                   MAX(tot) AS n,
                   CAST(MIN(CASE WHEN 4 * cumn >= tot THEN v END)
                        AS BIGINT) AS q1_cents,
                   CAST(MIN(CASE WHEN 4 * cumn >= 3 * tot THEN v END)
                        AS BIGINT) AS q3_cents
            FROM cum GROUP BY event_type
        )
        SELECT q.event_type, q.n, q.q1_cents, q.q3_cents,
               CAST(q.q3_cents - q.q1_cents AS BIGINT) AS iqr_cents,
               CAST(SUM(CASE WHEN 2 * c.v <
                        2 * q.q1_cents - 3 * (q.q3_cents - q.q1_cents)
                        THEN 1 ELSE 0 END) AS BIGINT) AS lo_outliers,
               CAST(SUM(CASE WHEN 2 * c.v >
                        2 * q.q3_cents + 3 * (q.q3_cents - q.q1_cents)
                        THEN 1 ELSE 0 END) AS BIGINT) AS hi_outliers,
               ROUND(CAST(SUM(CASE WHEN 2 * c.v <
                        2 * q.q1_cents - 3 * (q.q3_cents - q.q1_cents)
                        OR 2 * c.v >
                        2 * q.q3_cents + 3 * (q.q3_cents - q.q1_cents)
                        THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(q.n AS DOUBLE), 6) AS outlier_rate
        FROM quart q JOIN c ON c.event_type = q.event_type
        GROUP BY q.event_type, q.n, q.q1_cents, q.q3_cents
        ORDER BY q.event_type
    """,
    tags=("stats", "diagnostics", "quality"),
)
def q_iqr_outliers(spark, sf_dir):
    """TUKEY-FENCE (1.5·IQR boxplot) outlier audit per event type —
    the robust complement to q_anomaly_zscore (mean/std melts under
    the very outliers it hunts; quartiles don't) and the distribution
    gate q_ts_outlier_mad runs per-series, here per-segment.

    Exactness: quartiles use the lower-quartile threshold pick
    (MIN v with 4·cum ≥ k·tot) over the DISTINCT-VALUE frame — the
    q_weighted_median discipline, integer-only; the 1.5·IQR fences are
    compared as 2·v vs 2·q ± 3·IQR, so the half never materializes.
    One double (the rate) at the end.

    Plan at 100 TB: pass 1 collapses the fact to distinct cents values
    per type (the cumulative window runs over value cardinality, not
    rows); pass 2 re-scans the fact against the broadcast |types|-row
    quartile frame (the q_winsorize two-scan shape) — no fact-sized
    window, no sort of raw rows.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "v"
        ),
    )
    from pyspark.sql import Window

    vals = c.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w_cum = Window.partitionBy("event_type").orderBy("v")
    w_all = Window.partitionBy("event_type")
    cum = vals.select(
        "event_type",
        "v",
        F.sum("n").over(w_cum).cast("bigint").alias("cumn"),
        F.sum("n").over(w_all).cast("bigint").alias("tot"),
    )
    quart = cum.groupBy("event_type").agg(
        F.max("tot").alias("n"),
        F.min(F.when(4 * F.col("cumn") >= F.col("tot"), F.col("v")))
        .cast("bigint")
        .alias("q1_cents"),
        F.min(F.when(4 * F.col("cumn") >= 3 * F.col("tot"), F.col("v")))
        .cast("bigint")
        .alias("q3_cents"),
    )
    iqr = F.col("q3_cents") - F.col("q1_cents")
    lo = 2 * F.col("v") < 2 * F.col("q1_cents") - 3 * iqr
    hi = 2 * F.col("v") > 2 * F.col("q3_cents") + 3 * iqr
    joined = c.join(F.broadcast(quart), "event_type")
    return (
        joined.groupBy("event_type", "n", "q1_cents", "q3_cents")
        .agg(
            F.sum(F.when(lo, 1).otherwise(0)).cast("bigint").alias(
                "lo_outliers"
            ),
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "hi_outliers"
            ),
            F.round(
                F.sum(F.when(lo | hi, 1).otherwise(0)).cast("double")
                / F.max("n").cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .select(
            "event_type",
            "n",
            "q1_cents",
            "q3_cents",
            iqr.cast("bigint").alias("iqr_cents"),
            "lo_outliers",
            "hi_outliers",
            "outlier_rate",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_power_analysis — A/B sample-size calculator from measured baseline
# ---------------------------------------------------------------------------

# z_{alpha/2} at 0.05 and z_beta at power 0.8, as pinned literals (no
# inverse-normal at runtime); relative MDE 10%
_PWR_EXPR = (
    "(pow(1.959964e0 + 0.841621e0, 2)"
    " * (p1 * (1e0 - p1) + p2 * (1e0 - p2))"
    " / ((p2 - p1) * (p2 - p1)))"
)


@register(
    "q_power_analysis",
    oracle=f"""
        WITH base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS purchases
            FROM events
        ), rates AS (
            SELECT n_events, purchases,
                   CAST(purchases AS DOUBLE) / CAST(n_events AS DOUBLE)
                       AS p1,
                   1.1e0 * (CAST(purchases AS DOUBLE)
                            / CAST(n_events AS DOUBLE)) AS p2
            FROM base
        )
        SELECT n_events, purchases,
               ROUND(p1, 6) AS baseline_rate,
               ROUND(p2, 6) AS target_rate,
               CAST(CEIL({_PWR_EXPR}) AS BIGINT) AS required_n_per_arm
        FROM rates
    """,
    tags=("stats", "diagnostics"),
)
def q_power_analysis(spark, sf_dir):
    """A/B-TEST POWER ANALYSIS: the sample size per arm needed to
    detect a 10% relative lift in the measured purchase rate at
    α = 0.05 (two-sided) and 80% power — the planning readout that
    precedes every q_ab_ztest run (an experiment sized below this
    line is noise). n = (z_{α/2}+z_β)²·(p₁(1−p₁)+p₂(1−p₂))/(p₂−p₁)².

    Exactness: the baseline counts are exact BIGINTs; the z constants
    are pinned literals (no inverse-normal at runtime); the double
    algebra is ONE shared SQL string in both engines; CEIL on the
    identical double is exact.

    Plan at 100 TB: one scan → single-row aggregate; the algebra is
    driver-scale.
    """
    ev = load(spark, sf_dir, "events")
    base = ev.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("purchases"),
    )
    rates = base.select(
        "n_events",
        "purchases",
        (F.col("purchases").cast("double") / F.col("n_events").cast("double"))
        .alias("p1"),
        (
            F.lit(1.1)
            * (
                F.col("purchases").cast("double")
                / F.col("n_events").cast("double")
            )
        ).alias("p2"),
    )
    return rates.select(
        "n_events",
        "purchases",
        F.round("p1", 6).alias("baseline_rate"),
        F.round("p2", 6).alias("target_rate"),
        F.expr(f"CAST(CEIL({_PWR_EXPR}) AS BIGINT)").alias(
            "required_n_per_arm"
        ),
    )

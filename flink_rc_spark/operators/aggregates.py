"""Aggregation queries (SURVEY.md §2.2 "Aggregations").

The flagship ``q_agg_group`` is the TPC-H Q1 shape — scan → filter →
project → hash aggregate → sort, i.e. the full Spark lifecycle.

Scale story (100 TB): groupBy aggregates get partial (map-side) +
final aggregation from Catalyst automatically, so the shuffle carries
one row per (group × partition), not per input row. Low-cardinality
groups (returnflag × linestatus ≈ 6) make the exchange negligible at
any scale. All double sums go through DECIMAL (see functions/exact.py)
so results are order-independent — bit-identical whether computed on 32
partitions locally or 10k partitions on a cluster, and hash-equal to
the DuckDB oracle.

Reference parity: the reference has no grouped aggregation at all —
its only aggregate is a streamed MSE (SURVEY.md §2.1 R10); this module
is part of the beyond-reference relational surface mandated by
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.functions.exact import davg, dec, dlit, dsum
from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


@register(
    "q_agg_global",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(l_extendedprice) AS avg_price,
               MIN(l_quantity) AS min_qty,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
    """,
)
def q_agg_global(spark, sf_dir):
    """Ungrouped count/sum/avg/min/max over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "q_agg_group",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                    AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                        * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
                    AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark, sf_dir):
    """FLAGSHIP — TPC-H Q1 shape: pricing summary report.

    Also served by ``entry()`` at sf0.001. Partial+final hash
    aggregation; ~6 output groups regardless of scale.
    """
    li = load(spark, sf_dir, "lineitem")
    dprice = dec("l_extendedprice")
    disc_price = dprice * (dlit(1) - dec("l_discount"))
    charge = disc_price * (dlit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_agg_distinct",
    oracle="""
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_distinct_qty
        FROM lineitem
    """,
)
def q_agg_distinct(spark, sf_dir):
    """COUNT(DISTINCT) and SUM(DISTINCT).

    Scale note: multiple distinct aggregates expand to Expand + two-phase
    aggregation; at 100 TB prefer one distinct per query or
    approx_count_distinct (q_agg_approx) when exactness isn't required.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_distinct_qty"),
    )


@register(
    "q_agg_approx",
    oracle=None,  # approximate by design → rows-only check
)
def q_agg_approx(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    cardinality estimation: constant memory per group, no Expand.

    rsd=0.02: register count scales ~1/rsd^2, and 0.02 is 3.4x faster
    than 0.01 at sf0.1 (0.53 s vs 1.81 s) while staying far inside the
    +-5% bound asserted by test_agg_approx_within_tolerance.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_agg_having",
    oracle="""
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 12
    """,
)
def q_agg_having(spark, sf_dir):
    """Post-aggregation filter (HAVING)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("n_orders") > 12)
    )


@register(
    "q_agg_rollup",
    oracle="""
        SELECT n_name, c_mktsegment,
               COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals; join side (nation, 25 rows) broadcasts."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("sum_bal"))
    )


@register(
    "q_agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark, sf_dir):
    """CUBE over two grouping columns (Expand ×4 then hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS with grouping() indicator flags (via Spark SQL)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_agg_conditional",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(o_totalprice AS DECIMAL(12,2))
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O'
                        THEN CAST(o_totalprice AS DECIMAL(12,2))
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def q_agg_conditional(spark, sf_dir):
    """Pivot-style conditional aggregation: SUM(CASE WHEN ...)."""
    o = load(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(12,2)")
    return o.groupBy("o_orderpriority").agg(
        F.sum(
            F.when(F.col("o_orderstatus") == "F", dec("o_totalprice")).otherwise(zero)
        )
        .cast("double")
        .alias("total_f"),
        F.sum(
            F.when(F.col("o_orderstatus") == "O", dec("o_totalprice")).otherwise(zero)
        )
        .cast("double")
        .alias("total_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", F.lit(1))).alias("n_p"),
    )


@register(
    "q_agg_stats",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
               ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark, sf_dir):
    """Statistical aggregates — incl. regr_slope/intercept, which is the
    reference's linear readout fit (SURVEY.md §2.1 R5) in its 1-D case
    expressed as pure SQL. Rounded identically on both sides (these are
    not order-independent like decimal sums; noise ≪ round unit).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
    )


@register(
    "q_agg_collect",
    oracle="""
        SELECT o_orderpriority,
               ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',')
                   AS statuses,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def q_agg_collect(spark, sf_dir):
    """collect_set with deterministic ordering, emitted as a joined
    string so the value-hash is stable across engines."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_pivot",
    oracle="""
        SELECT n_name,
               CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                    THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
                   AS AUTOMOBILE,
               CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                    THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
                   AS BUILDING,
               CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'
                    THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
                   AS FURNITURE,
               CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'
                    THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
                   AS HOUSEHOLD,
               CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                    THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
                   AS MACHINERY
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
)
def q_agg_pivot(spark, sf_dir):
    """Pivot: per-nation account balance pivoted across market segments
    (`df.groupBy().pivot(values).agg()`).

    Explicit pivot values keep the plan a single pass — without them
    Spark runs an extra distinct-values job; with them the pivot
    compiles to the same conditional-aggregation shape as the oracle
    SQL (one hash aggregate, no extra shuffle). Decimal-routed sums
    keep the value hash exact.
    """
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(dsum("c_acctbal"))
        .orderBy("n_name")
    )


@register(
    "q_agg_salted",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_agg_salted(spark, sf_dir):
    """Salted two-phase aggregation — the explicit skew-mitigation
    pattern: phase 1 aggregates on (key, salt) spreading one hot key
    over 16 reducers, phase 2 merges salt partials per key. The result
    is provably identical to the plain GROUP BY (the oracle *is* the
    plain GROUP BY); decimal sums make the merge order-insensitive.

    At 100 TB: use when one key holds >> 1/parallelism of all rows and
    AQE skew handling can't help (skew in an aggregation, not a join).
    Salt fan-out trades one extra small shuffle for eliminating the
    straggler reducer.
    """
    e = load(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("pt"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pt").cast("double").alias("total"),
        )
        .orderBy("event_type")
    )


@register(
    "q_agg_percentile",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q_agg_percentile(spark, sf_dir):
    """Exact interpolated percentiles (median, p90) per return flag.

    Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition. Computed over l_quantity
    deliberately: Spark's exact Percentile is a merged
    value->count map, so its partial-aggregation traffic scales with
    the column's *distinct* count — ~50 for quantity (cheap at any
    table size) vs ~every-row for a money column (3.3 s vs 0.4 s
    measured at sf0.1). High-cardinality columns at 100 TB belong to
    approx_percentile (t-digest), as in q_agg_approx.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_order_nested",
    oracle="""
        SELECT o_orderkey, o_orderdate,
               COUNT(*) AS n_lines,
               list(l_linenumber || ':' || l_partkey || ':'
                    || CAST(CAST(l_quantity AS INT) AS VARCHAR)
                    ORDER BY l_linenumber || ':' || l_partkey || ':'
                    || CAST(CAST(l_quantity AS INT) AS VARCHAR)) AS lines
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey < 200
        GROUP BY o_orderkey, o_orderdate
        ORDER BY o_orderkey
    """,
    tags=("agg", "nested"),
)
def q_order_nested(spark, sf_dir):
    """Nested document assembly: each order with its line items
    collected into a lexicographically-ordered array — the denormalization
    step that builds JSON/parquet EXPORT documents from a star schema
    (the inverse of q_explode). Lines serialize to
    'linenumber:partkey:qty' strings so the nested payload stays
    byte-comparable cross-engine (struct arrays stringify differently
    per client; strings don't), sorted BY that string — line numbers
    are not unique per order in this data, so the serialized form is
    the only total order both engines can agree on.

    One shuffle on the orderkey; per-group memory is bounded by lines
    per order (~7 max in TPC-H data — the safest collect_list bound in
    the schema). The orderkey block filter bounds the declared output;
    the plan is block-size-independent.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    li = load(spark, sf_dir, "lineitem")
    line_str = F.concat_ws(
        ":",
        F.col("l_linenumber"),
        F.col("l_partkey"),
        F.col("l_quantity").cast("int"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("line", line_str)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_lines"),
            F.sort_array(F.collect_list("line")).alias("lines"),
        )
        .orderBy("o_orderkey")
    )


_ANALYZE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q_analyze_stats",
    oracle=f"""
        WITH s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   {", ".join(
                       f"CAST(COUNT({c}) AS BIGINT) AS cnt_{c},"
                       f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv_{c},"
                       f" MIN({c}) AS min_{c}, MAX({c}) AS max_{c}"
                       for c in _ANALYZE_COLS)}
            FROM lineitem
        )
        {" UNION ALL ".join(
            f'''SELECT '{c}' AS col_name, n_rows,
                       n_rows - cnt_{c} AS n_nulls,
                       ndv_{c} AS ndv, min_{c} AS min_val, max_{c} AS max_val
                FROM s''' for c in _ANALYZE_COLS)}
        ORDER BY col_name
    """,
    tags=("agg", "stats"),
)
def q_analyze_stats(spark, sf_dir):
    """ANALYZE-style column statistics — row count, null count, exact
    NDV, min/max per measure column — the table metadata a cost-based
    optimizer (and every min/max-skipping file format) feeds on. The
    numbers here are what Catalyst's CBO reads from
    ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``; declaring
    the computation as a query makes the stats pipeline itself
    hash-verified.

    ONE scan computes all four columns' stats as a single aggregate
    row (count-distinct sub-aggregates expand to the standard
    expand-node plan); the per-column output rows are a driver-side
    unpivot of that row. 100 TB: exact NDV per column is the expand's
    shuffle — production trades it for HLL (q_sketch_hll) above a
    cardinality budget; min/max/nulls stay single-pass partial+final
    either way.
    """
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in _ANALYZE_COLS:
        aggs += [
            F.count(c).cast("bigint").alias(f"cnt_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"ndv_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    s = li.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"cnt_{c}")).alias("n_nulls"),
            F.col(f"ndv_{c}").alias("ndv"),
            F.col(f"min_{c}").alias("min_val"),
            F.col(f"max_{c}").alias("max_val"),
        )
        for c in _ANALYZE_COLS
    ]
    return (
        s.select(F.explode(F.array(*rows)).alias("kv"))
        .select("kv.*")
        .orderBy("col_name")
    )


# ---------------------------------------------------------------------------
# q_agg_argmax — max_by / min_by with deterministic struct tie-breaks
# ---------------------------------------------------------------------------


@register(
    "q_agg_argmax",
    oracle="""
        WITH c AS (
            SELECT event_type, event_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
            FROM events
        ), ranked AS (
            SELECT event_type, event_id, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY v DESC, event_id DESC)
                       AS r_top,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY v ASC, event_id ASC)
                       AS r_bot
            FROM c
        )
        SELECT event_type,
               CAST(MAX(CASE WHEN r_top = 1 THEN v END) AS BIGINT)
                   AS top_cents,
               CAST(MAX(CASE WHEN r_top = 1 THEN event_id END) AS BIGINT)
                   AS top_event_id,
               CAST(MAX(CASE WHEN r_bot = 1 THEN v END) AS BIGINT)
                   AS bottom_cents,
               CAST(MAX(CASE WHEN r_bot = 1 THEN event_id END) AS BIGINT)
                   AS bottom_event_id
        FROM ranked
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q_agg_argmax(spark, sf_dir):
    """ARGMAX/ARGMIN aggregation (max_by/min_by): per event type, the
    event carrying the highest and lowest value — the "which row set
    the record" readout that otherwise costs a self-join. Spelled as
    MAX/MIN over a (value, event_id) STRUCT so ties break
    deterministically on the id INSIDE the aggregate (Spark's plain
    max_by is non-deterministic under ties — the struct form is the
    portable discipline); the oracle spells the identical order with
    ROW_NUMBER.

    Exactness: struct comparison is lexicographic on exact integers;
    no doubles anywhere.

    Plan at 100 TB: ONE partial+final hash agg — each partition folds
    its local champion struct, the shuffle carries |types| structs.
    The oracle's window spelling would shuffle the whole fact; the
    struct-max spelling is the scale winner and they agree by hash.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "v"
        ),
    )
    top = F.max(F.struct(F.col("v"), F.col("event_id")))
    bot = F.min(F.struct(F.col("v"), F.col("event_id")))
    return (
        c.groupBy("event_type")
        .agg(top.alias("t"), bot.alias("b"))
        .select(
            "event_type",
            F.col("t.v").cast("bigint").alias("top_cents"),
            F.col("t.event_id").cast("bigint").alias("top_event_id"),
            F.col("b.v").cast("bigint").alias("bottom_cents"),
            F.col("b.event_id").cast("bigint").alias("bottom_event_id"),
        )
        .orderBy("event_type")
    )

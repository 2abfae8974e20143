"""Agreement / concentration / dependence statistics (wave 24).

Six classical readouts a data-quality or experimentation team runs on
warehouse facts: McNemar's paired test, Cohen's and Fleiss' kappa,
Lorenz/Gini inequality, the Herfindahl-Hirschman concentration index,
and mutual information between two categorical columns.

Determinism policy (SURVEY.md §4.2): every statistic is derived from
EXACT integer/decimal moments aggregated engine-side; the final
floating expression is ONE shared text evaluated on those integers in
both Spark and DuckDB (the q_welch_ttest precedent), rounded once.
The mutual-information total additionally needs a SUM of ~120 double
terms — doubles are summed by an explicit sorted left-fold
(sort_array + aggregate in Spark, list_sort + list_reduce in DuckDB)
so both engines add in the identical sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_rc_spark.plans.inspect import checkpoint
from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

# ---------------------------------------------------------------------------
# q_mcnemar — paired-binary marginal-homogeneity test (Edwards correction)
# ---------------------------------------------------------------------------

# Edwards continuity-corrected McNemar statistic (|b-c|-1)^2/(b+c) on
# the two discordant counts; squares as explicit products (pow() is
# libm-dependent, x*x is one IEEE multiply in both engines)
_MCNEMAR_EXPR = """
    CASE WHEN n10 + n01 > 0 THEN
        ROUND((CAST(abs(n10 - n01) AS DOUBLE) - 1.0)
              * (CAST(abs(n10 - n01) AS DOUBLE) - 1.0)
              / (n10 + n01), 6)
    END
"""


@register(
    "q_mcnemar",
    oracle=f"""
        WITH pairs AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT COUNT(*) AS n_users,
                   CAST(SUM(x * y) AS BIGINT) AS n11,
                   CAST(SUM(x * (1 - y)) AS BIGINT) AS n10,
                   CAST(SUM((1 - x) * y) AS BIGINT) AS n01,
                   CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS n00
            FROM pairs
        )
        SELECT n_users, n11, n10, n01, n00,
               {_MCNEMAR_EXPR} AS chi2_mcnemar
        FROM s
    """,
    tags=("stats", "agg"),
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired binary outcomes: per user, (ever
    clicked) x (ever purchased). The discordant counts b=n10, c=n01
    drive the Edwards continuity-corrected statistic
    (|b-c|-1)^2/(b+c) — the paired sibling of the chi-square test
    (q_chi2_test treats the table as unpaired).

    Exactness: the four contingency cells are exact integer counts
    (per-user MAX then SUM); the statistic is one shared double
    expression text on those integers, rounded once.

    100 TB: one hash agg keyed on user_id (partial MAX map-side) then
    a single global 4-counter fold — no shuffle beyond the user agg,
    all statistics on one row.
    """
    ev = load(spark, sf_dir, "events")
    pairs = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    s = pairs.agg(
        F.count("*").alias("n_users"),
        F.sum(x * y).cast("long").alias("n11"),
        F.sum(x * (1 - y)).cast("long").alias("n10"),
        F.sum((1 - x) * y).cast("long").alias("n01"),
        F.sum((1 - x) * (1 - y)).cast("long").alias("n00"),
    )
    return s.select(
        "n_users", "n11", "n10", "n01", "n00",
        F.expr(_MCNEMAR_EXPR).alias("chi2_mcnemar"),
    )


# ---------------------------------------------------------------------------
# q_cohen_kappa — two-rater chance-corrected agreement
# ---------------------------------------------------------------------------

# kappa = (n*(n11+n00) - pe_num) / (n*n - pe_num) where
# pe_num = a1*b1 + a0*b0 (expected-agreement numerator, exact BIGINT).
# n*n stays inside BIGINT through sf100 (n=1.5e8 -> 2.25e16 << 9.2e18);
# past n ~ 3e9 route the moments through DECIMAL(38,0).
_KAPPA_EXPR = """
    CASE WHEN n * n > pe_num THEN
        ROUND(CAST(n * (n11 + n00) - pe_num AS DOUBLE)
              / CAST(n * n - pe_num AS DOUBLE), 6)
    END
"""


@register(
    "q_cohen_kappa",
    oracle=f"""
        WITH r AS (
            SELECT CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS a,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS b
            FROM orders
        ),
        s AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(a * b) AS BIGINT) AS n11,
                   CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
                   CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
                   CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
            FROM r
        ),
        m AS (
            SELECT n, n11, n10, n01, n00,
                   (n11 + n10) * (n11 + n01)
                       + (n01 + n00) * (n10 + n00) AS pe_num
            FROM s
        )
        SELECT n, n11, n10, n01, n00,
               ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
               ROUND(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe,
               {_KAPPA_EXPR} AS kappa
        FROM m
    """,
    tags=("stats", "agg"),
)
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic "raters" of each order —
    rater A: high-value (o_totalprice >= 150000); rater B: urgent-ish
    priority (1-URGENT / 2-HIGH) — the chance-corrected agreement
    readout used for labeling-quality audits of annotation pipelines.

    kappa = (po - pe)/(1 - pe) is computed as the exactly-equivalent
    integer-moment ratio (n*(n11+n00) - pe_num)/(n*n - pe_num): one
    double division on exact BIGINTs, shared text, rounded once.

    100 TB: single scan, 5-counter global partial+final aggregate;
    the marginal products are driver-free scalar arithmetic on one row.
    """
    o = load(spark, sf_dir, "orders")
    r = o.select(
        F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0).alias("a"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(a * b).cast("long").alias("n11"),
        F.sum(a * (1 - b)).cast("long").alias("n10"),
        F.sum((1 - a) * b).cast("long").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n00"),
    )
    m = s.withColumn(
        "pe_num",
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00")),
    )
    return m.select(
        "n", "n11", "n10", "n01", "n00",
        F.expr("ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6)").alias("po"),
        F.expr(
            "ROUND(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6)"
        ).alias("pe"),
        F.expr(_KAPPA_EXPR).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# q_fleiss_kappa — m-rater agreement (m=4 lineitem "votes" per order)
# ---------------------------------------------------------------------------

# P-bar = (s2 - N*m)/(N*m*(m-1)), Pe-bar = ss/(N*m)^2, kappa =
# (P-bar - Pe-bar)/(1 - Pe-bar); m=4 inlined. All moments exact
# BIGINT (s2 <= 16N, ss <= (4N)^2 — inside BIGINT through sf1000).
_FLEISS_EXPR = """
    CASE WHEN n_items > 0 AND ss < 16 * n_items * n_items THEN
        ROUND(((CAST(s2 - n_items * 4 AS DOUBLE)
                / (CAST(n_items AS DOUBLE) * 12.0))
               - (CAST(ss AS DOUBLE)
                  / (CAST(n_items AS DOUBLE) * 4.0
                     * CAST(n_items AS DOUBLE) * 4.0)))
              / (1.0 - (CAST(ss AS DOUBLE)
                        / (CAST(n_items AS DOUBLE) * 4.0
                           * CAST(n_items AS DOUBLE) * 4.0))), 6)
    END
"""


@register(
    "q_fleiss_kappa",
    oracle=f"""
        WITH m4 AS (
            SELECT l_orderkey
            FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) = 4
        ),
        votes AS (
            SELECT l.l_orderkey, l.l_returnflag, COUNT(*) AS n_ij
            FROM lineitem l JOIN m4 USING (l_orderkey)
            GROUP BY l.l_orderkey, l.l_returnflag
        ),
        per_item AS (
            SELECT l_orderkey, SUM(n_ij * n_ij) AS sq_i
            FROM votes GROUP BY l_orderkey
        ),
        per_cat AS (
            SELECT l_returnflag, SUM(n_ij) AS s_j FROM votes
            GROUP BY l_returnflag
        ),
        s AS (
            SELECT (SELECT COUNT(*) FROM m4) AS n_items,
                   (SELECT CAST(SUM(sq_i) AS BIGINT) FROM per_item) AS s2,
                   (SELECT CAST(SUM(s_j * s_j) AS BIGINT) FROM per_cat) AS ss
        )
        SELECT n_items, s2, ss,
               {_FLEISS_EXPR} AS kappa_fleiss
        FROM s
    """,
    tags=("stats", "agg", "join"),
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa treating each 4-lineitem order as an item rated by
    m=4 "raters" voting a return-flag category — the multi-annotator
    agreement statistic (is return behavior consistent within an
    order?), the m-rater generalization of q_cohen_kappa.

    Moments: s2 = sum over items of sum_j n_ij^2 and ss = sum_j S_j^2
    are exact BIGINTs; the kappa is one shared double expression
    (P-bar, Pe-bar, ratio) on them, guarded against the degenerate
    all-one-category table (Pe-bar = 1), rounded once.

    100 TB: the m=4 filter and the vote counts are two hash aggs on
    the same l_orderkey key (one exchange, reused); per-category sums
    collapse to 3 rows. No window, no join wider than the key agg.
    """
    li = load(spark, sf_dir, "lineitem")
    m4 = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") == 4)
        .select("l_orderkey")
    )
    votes = (
        li.join(m4, "l_orderkey")
        .groupBy("l_orderkey", "l_returnflag")
        .agg(F.count("*").alias("n_ij"))
    )
    per_item = votes.groupBy("l_orderkey").agg(
        F.sum(F.col("n_ij") * F.col("n_ij")).alias("sq_i")
    )
    per_cat = votes.groupBy("l_returnflag").agg(F.sum("n_ij").alias("s_j"))
    s = (
        per_item.agg(
            F.count("*").alias("n_items"),
            F.sum("sq_i").cast("long").alias("s2"),
        )
        .crossJoin(
            per_cat.agg(
                F.sum(F.col("s_j") * F.col("s_j")).cast("long").alias("ss")
            )
        )
    )
    return s.select(
        "n_items", "s2", "ss", F.expr(_FLEISS_EXPR).alias("kappa_fleiss")
    )


# ---------------------------------------------------------------------------
# q_lorenz_gini — Gini coefficient of customer spend
# ---------------------------------------------------------------------------

# G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), x ascending; the
# rank-weighted sum runs in DECIMAL(38,0) (BIGINT would overflow past
# ~sf1: n^2/2 * mean-cents ~ 3e17 at sf1, 100x that at sf10).
_GINI_EXPR = """
    CASE WHEN n > 0 AND st > 0 THEN
        ROUND((2.0 * CAST(sw AS DOUBLE)
               - (CAST(n AS DOUBLE) + 1.0) * CAST(st AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(st AS DOUBLE)), 6)
    END
"""


@register(
    "q_lorenz_gini",
    oracle=f"""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT cents,
                   ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
                   COUNT(*) OVER () AS n
            FROM cust
        ),
        s AS (
            SELECT MAX(n) AS n,
                   CAST(SUM(cents) AS BIGINT) AS st,
                   SUM(CAST(i AS DECIMAL(19,0))
                       * CAST(cents AS DECIMAL(19,0))) AS sw,
                   CAST(SUM(CASE WHEN i * 5 > 4 * n THEN cents ELSE 0 END)
                        AS BIGINT) AS t20
            FROM ranked
        )
        SELECT n AS n_customers, st AS total_cents,
               {_GINI_EXPR} AS gini,
               CASE WHEN st > 0 THEN
                   ROUND(CAST(t20 AS DOUBLE) / CAST(st AS DOUBLE), 6)
               END AS share_top20
        FROM s
    """,
    tags=("stats", "window", "agg"),
)
def q_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer lifetime spend (exact integer
    cents) plus the top-quintile revenue share — the inequality /
    whale-concentration readout behind "20% of customers drive X% of
    revenue" (the Lorenz-curve summary; q_pareto_abc bins the same
    curve, this key integrates it).

    Exactness: spend is exact DECIMAL cents; the rank-weighted sum
    sum(i * x_i) runs in DECIMAL(38,0); the Gini is one shared double
    expression on (n, st, sw), rounded once. Ties in cents are
    rank-invariant for the statistic (swapping equal x leaves
    sum(i*x_i) unchanged), so the custkey tiebreak is cosmetic.

    Scale: the customer-total rank is the TWO-PHASE range-bucketed
    count scan (`global_scan_salted` — parallel buckets, no
    single-partition sort); the fact-sized work is only the
    per-customer hash agg.
    """
    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    # two-phase range-bucketed rank over (cents, custkey) — no
    # single-partition row_number window over the customer rollup;
    # the grand count is a 1-row broadcast
    from flink_rc_spark.operators.windows import global_scan_salted

    cust = cust.transform(checkpoint, eager=True)  # shared by count + scan
    nrow = cust.agg(F.count("*").alias("n"))
    ranked = global_scan_salted(
        cust,
        "cents",
        ["cents", "o_custkey"],
        [{"kind": "count", "value": None, "out": "i", "exclusive": False}],
        materialize=False,
    ).crossJoin(F.broadcast(nrow)).select("cents", "i", "n")
    s = ranked.agg(
        F.max("n").alias("n"),
        F.sum("cents").cast("long").alias("st"),
        F.sum(
            F.col("i").cast("decimal(19,0)")
            * F.col("cents").cast("decimal(19,0)")
        ).alias("sw"),
        F.sum(
            F.when(F.col("i") * 5 > 4 * F.col("n"), F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("t20"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("st").alias("total_cents"),
        F.expr(_GINI_EXPR).alias("gini"),
        F.expr(
            """CASE WHEN st > 0 THEN
                   ROUND(CAST(t20 AS DOUBLE) / CAST(st AS DOUBLE), 6)
               END"""
        ).alias("share_top20"),
    )


# ---------------------------------------------------------------------------
# q_herfindahl — per-nation supplier revenue concentration (HHI)
# ---------------------------------------------------------------------------

# HHI = sum(share_i^2) = ssq / st^2 with ssq = sum(rev_i^2) in
# DECIMAL(38,0) (rev^2 ~ 3e16 cents^2 per supplier at sf1; the
# per-nation sum tops BIGINT around sf1, so squares are decimal);
# n_equivalent = 1/HHI is the "equivalent equal-size firms" readout.
_HHI_EXPR = """
    CASE WHEN st > 0 THEN
        ROUND(CAST(ssq AS DOUBLE)
              / (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6)
    END
"""
_NEQ_EXPR = """
    CASE WHEN ssq > 0 THEN
        ROUND(CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
              / CAST(ssq AS DOUBLE), 4)
    END
"""


@register(
    "q_herfindahl",
    oracle=f"""
        WITH rev AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100
                        AS BIGINT) AS cents
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY s.s_nationkey, l.l_suppkey
        ),
        hhi AS (
            SELECT s_nationkey,
                   COUNT(*) AS n_suppliers,
                   CAST(SUM(cents) AS BIGINT) AS st,
                   SUM(CAST(cents AS DECIMAL(19,0))
                       * CAST(cents AS DECIMAL(19,0))) AS ssq
            FROM rev GROUP BY s_nationkey
        )
        SELECT n.n_name AS nation, h.n_suppliers,
               {_HHI_EXPR} AS hhi,
               {_NEQ_EXPR} AS n_equivalent
        FROM hhi h JOIN nation n ON h.s_nationkey = n.n_nationkey
        ORDER BY nation
    """,
    tags=("stats", "agg", "join"),
)
def q_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation: HHI = sum over suppliers of (revenue share)^2, plus
    the equivalent-firm count 1/HHI — the antitrust / supply-risk
    readout ("how concentrated is our supply base per region?").

    Exactness: revenue is exact DECIMAL cents; shares are never
    materialized — HHI = sum(rev^2)/(sum(rev))^2 with the squares in
    DECIMAL(38,0), one shared double expression per nation.

    100 TB: fact-side hash agg on (nationkey, suppkey) after a
    broadcast join to the supplier dim; the per-nation reduction is
    25 rows. No window, no shuffle beyond the supplier-key agg.
    """
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    rev = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    hhi = rev.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("st"),
        F.sum(
            F.col("cents").cast("decimal(19,0)")
            * F.col("cents").cast("decimal(19,0)")
        ).alias("ssq"),
    )
    return (
        hhi.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            hhi.s_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            F.expr(_HHI_EXPR).alias("hhi"),
            F.expr(_NEQ_EXPR).alias("n_equivalent"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# q_mutual_info — MI between event_type and hour-of-day
# ---------------------------------------------------------------------------

# per-cell contribution (n_xy/N) * ln(n_xy*N / (n_x*n_y)) — counts are
# exact BIGINTs, ln runs once per cell on the exact rational (the
# q_cooccur_pmi policy); the <=120-term total is summed by an explicit
# sorted left-fold so both engines add in the identical order.
_MI_TERM = """
    (CAST(n_xy AS DOUBLE) / nn)
        * ln(CAST(n_xy AS DOUBLE) * nn
             / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
"""


@register(
    "q_mutual_info",
    oracle=f"""
        WITH cells AS (
            SELECT event_type AS x, hour(ts) AS y, COUNT(*) AS n_xy
            FROM events GROUP BY 1, 2
        ),
        mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
        my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
        tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS nn FROM cells),
        terms AS (
            SELECT c.x, c.y,
                   CAST({_MI_TERM} AS DOUBLE) AS t
            FROM cells c
            JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
        )
        SELECT (SELECT COUNT(*) FROM cells) AS n_cells,
               (SELECT nn FROM tot) AS n_events,
               ROUND(list_reduce(
                   list_prepend(
                       CAST(0.0 AS DOUBLE),
                       list_transform(
                           list_sort(list({{'x': x, 'y': y, 't': t}})),
                           s -> s.t)),
                   (a, b) -> a + b), 6) AS mi_nats
        FROM terms
    """,
    tags=("stats", "agg", "join"),
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event_type and hour-of-day —
    the dependence strength behind "is activity type time-of-day
    driven?", the summed generalization of q_cooccur_pmi's per-pair
    PMI (MI = expectation of PMI over the joint).

    Determinism: cell/marginal counts are exact BIGINTs; each of the
    <= |types| x 24 terms evaluates ln once on the exact rational;
    the total is an explicit sorted left-fold (sort_array + aggregate
    here, list_sort + list_reduce in DuckDB) so both engines sum the
    identical IEEE sequence, rounded once at the end.

    100 TB: one fact-side hash agg to <= 120 cells; marginals and the
    fold are driver-scale. The joins to the marginals are broadcasts
    of tiny frames.
    """
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"), F.hour("ts").alias("y")
    ).agg(F.count("*").alias("n_xy"))
    mx = cells.groupBy("x").agg(F.sum("n_xy").cast("long").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").cast("long").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").cast("long").alias("nn"))
    terms = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x", "y", F.expr(f"CAST({_MI_TERM} AS DOUBLE)").alias("t")
        )
    )
    n_cells = terms.agg(
        F.count("*").alias("n_cells")
    )
    folded = terms.agg(
        F.expr(
            """ROUND(aggregate(
                   sort_array(collect_list(struct(x, y, t))),
                   CAST(0.0 AS DOUBLE),
                   (a, s) -> a + s.t), 6)"""
        ).alias("mi_nats")
    )
    return (
        n_cells.crossJoin(folded)
        .crossJoin(tot)
        .select("n_cells", F.col("nn").alias("n_events"), "mi_nats")
    )


# ---------------------------------------------------------------------------
# q_weighted_median — quantity-weighted price percentiles per return flag
# ---------------------------------------------------------------------------


@register(
    "q_weighted_median",
    oracle="""
        WITH vals AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS v,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w,
                   COUNT(*) AS n
            FROM lineitem GROUP BY 1, 2
        ),
        cum AS (
            SELECT flag, v, w, n,
                   CAST(SUM(w) OVER (PARTITION BY flag ORDER BY v)
                        AS BIGINT) AS cumw,
                   CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot,
                   CAST(SUM(n) OVER (PARTITION BY flag) AS BIGINT) AS n_rows
            FROM vals
        )
        SELECT flag,
               MAX(n_rows) AS n_rows,
               MAX(tot) AS total_weight,
               MIN(CASE WHEN 4 * cumw >= tot THEN v END) AS wp25_cents,
               MIN(CASE WHEN 2 * cumw >= tot THEN v END) AS wmedian_cents,
               MIN(CASE WHEN 4 * cumw >= 3 * tot THEN v END) AS wp75_cents
        FROM cum
        GROUP BY flag
        ORDER BY flag
    """,
    tags=("stats", "window", "agg"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-WEIGHTED price percentiles (p25/median/p75) per return
    flag: each lineitem's price counts with multiplicity l_quantity —
    the inventory-weighted distribution summary ("what price does the
    median UNIT ship at?"), which plain percentile_approx cannot
    answer (q_agg_percentile weights rows equally). Lower weighted
    median: smallest v with 2*cumw(v) >= total.

    Exactness: prices are exact integer cents, weights exact integer
    quantities; the percentile picks are pure integer threshold
    comparisons on the cumulative weight — no interpolation, no
    floats anywhere.

    100 TB: the fact collapses to the (flag, price) distinct-value
    frame first (hash agg with map-side combine — the q_mw_utest
    midrank discipline), so the ordered cumulative window runs over
    distinct values per flag, not rows. One exchange keyed on flag.
    """
    li = load(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"),
        F.count("*").alias("n"),
    )
    wcum = Window.partitionBy("flag").orderBy("v")
    wall = Window.partitionBy("flag")
    cum = vals.select(
        "flag",
        "v",
        F.sum("w").over(wcum).cast("bigint").alias("cumw"),
        F.sum("w").over(wall).cast("bigint").alias("tot"),
        F.sum("n").over(wall).cast("bigint").alias("n_rows"),
    )
    return (
        cum.groupBy("flag")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("tot").alias("total_weight"),
            F.min(
                F.when(4 * F.col("cumw") >= F.col("tot"), F.col("v"))
            ).alias("wp25_cents"),
            F.min(
                F.when(2 * F.col("cumw") >= F.col("tot"), F.col("v"))
            ).alias("wmedian_cents"),
            F.min(
                F.when(4 * F.col("cumw") >= 3 * F.col("tot"), F.col("v"))
            ).alias("wp75_cents"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# q_cliffs_delta — ordinal effect size for the purchase-vs-click metric
# ---------------------------------------------------------------------------

# delta = (#{x>y} - #{x<y}) / (n1*n2): dominance counts from the
# distinct-value frame (never the pair join); one double division of
# exact BIGINTs, rounded once. BIGINT headroom: gt/lt <= n1*n2
# (~1.6e15 at sf100); past that the counts route through DECIMAL.
_CLIFFS_EXPR = """
    CASE WHEN n1 > 0 AND n2 > 0 THEN
        ROUND((CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
              / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
    END
"""


@register(
    "q_cliffs_delta",
    oracle=f"""
        WITH x AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        vals AS (
            SELECT c,
                   CAST(SUM(g) AS BIGINT) AS c1,
                   CAST(SUM(1 - g) AS BIGINT) AS c2
            FROM x GROUP BY c
        ),
        cum AS (
            SELECT c, c1, c2,
                   CAST(COALESCE(SUM(c2) OVER (ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS c2_less,
                   CAST(SUM(c2) OVER () AS BIGINT) AS n2,
                   CAST(SUM(c1) OVER () AS BIGINT) AS n1
            FROM vals
        )
        , mom AS (
            SELECT MAX(n1) AS n1, MAX(n2) AS n2,
                   CAST(SUM(c1 * c2_less) AS BIGINT) AS n_gt,
                   CAST(SUM(c1 * (n2 - c2_less - c2)) AS BIGINT) AS n_lt,
                   CAST(SUM(c1 * c2) AS BIGINT) AS n_eq
            FROM cum
        )
        SELECT n1, n2, n_gt, n_lt, n_eq,
               {_CLIFFS_EXPR} AS delta
        FROM mom
    """,
    tags=("stats", "window", "agg"),
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta between purchase and click values — the ordinal
    (rank-based) effect size that accompanies q_mw_utest the way
    q_effect_size's Cohen d accompanies q_welch_ttest: delta =
    P(x > y) - P(x < y), robust to non-normality and outliers.

    Dominance counts come from the distinct-value frame, NEVER a pair
    join: for each value v, c1(v) purchases at v dominate the
    c2-below cumulative — gt = sum c1(v) * C2_less(v), lt by
    complement, eq = sum c1*c2. All exact BIGINTs; delta is one
    shared double expression, rounded once.

    100 TB: identical shape to q_mw_utest — one hash agg to distinct
    cents values, one TWO-PHASE range-bucketed cumulative scan over
    that frame (`global_scan_salted` — no single-partition window),
    single-row reduce. The O(n1*n2) pair semantics costs
    O(distinct values).
    """
    ev = load(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    )
    vals = x.groupBy("c").agg(
        F.sum("g").cast("bigint").alias("c1"),
        F.sum(1 - F.col("g")).cast("bigint").alias("c2"),
    )
    from flink_rc_spark.operators.windows import global_scan_salted

    vals = vals.transform(checkpoint, eager=True)  # shared by totals + scan
    tot = vals.agg(
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum("c1").cast("bigint").alias("n1"),
    )
    cum = global_scan_salted(
        vals,
        "c",
        [F.col("c")],
        [{"kind": "sum", "value": F.col("c2"), "out": "_cum",
          "exclusive": False}],
        materialize=False,
    ).crossJoin(F.broadcast(tot)).select(
        "c",
        "c1",
        "c2",
        (F.col("_cum") - F.col("c2")).cast("bigint").alias("c2_less"),
        "n2",
        "n1",
    )
    s = cum.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(F.col("c1") * F.col("c2_less")).cast("bigint").alias("n_gt"),
        F.sum(F.col("c1") * (F.col("n2") - F.col("c2_less") - F.col("c2")))
        .cast("bigint")
        .alias("n_lt"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("n_eq"),
    )
    return s.select(
        "n1", "n2", "n_gt", "n_lt", "n_eq",
        F.expr(_CLIFFS_EXPR).alias("delta"),
    )


# ---------------------------------------------------------------------------
# q_profile_entropy — per-column categorical profiling (entropy / top share)
# ---------------------------------------------------------------------------

# the profiled (label, table, column expression) triples — the
# categorical columns a profiler summarizes before modeling
_PROFILE_COLS = (
    ("events.event_type", "events", "event_type"),
    ("documents.lang", "documents", "lang"),
    ("documents.source", "documents", "source"),
    ("orders.o_orderpriority", "orders", "o_orderpriority"),
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
)

# shared per-column statistics texts on the exact (nn, nd, mx) moments
_TOP_SHARE = "ROUND(CAST(mx AS DOUBLE) / CAST(nn AS DOUBLE), 6)"


def _profile_duck_block(label: str, table: str, col: str) -> str:
    tag = label.replace(".", "_")
    return f"""
    cnt_{tag} AS (
        SELECT CAST({col} AS VARCHAR) AS v, COUNT(*) AS c
        FROM {table} GROUP BY 1
    ),
    agg_{tag} AS (
        SELECT CAST(SUM(c) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(MAX(c) AS BIGINT) AS mx,
               list_sort(list({{'v': v, 'c': c}})) AS lst
        FROM cnt_{tag}
    )"""


def _profile_duck_select(label: str) -> str:
    tag = label.replace(".", "_")
    return f"""
        SELECT '{label}' AS col_name, nn AS n_rows, nd AS n_distinct,
               {_TOP_SHARE} AS top_share,
               ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(lst, s ->
                           -(CAST(s.c AS DOUBLE) / nn)
                           * ln(CAST(s.c AS DOUBLE) / nn))),
                   (a, b) -> a + b), 6) AS entropy_nats
        FROM agg_{tag}"""


@register(
    "q_profile_entropy",
    oracle="WITH "
    + ",".join(
        _profile_duck_block(lb, t, c).strip() for lb, t, c in _PROFILE_COLS
    )
    + "\n"
    + "\nUNION ALL\n".join(_profile_duck_select(lb) for lb, _, _ in _PROFILE_COLS)
    + "\nORDER BY col_name",
    tags=("stats", "agg", "profiling"),
)
def q_profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-column PROFILING across tables: for each declared
    column, row count, distinct count, top-value share, and the
    Shannon entropy (nats) of the value distribution — the
    data-profiler summary (ydata-profiling / Deequ class) that flags
    near-constant columns (entropy ~ 0, top_share ~ 1) and
    high-cardinality ones before they reach a model.

    Determinism: counts are exact integers; each category's entropy
    term evaluates ln once on the exact rational c/n; the <= |values|
    per-column total folds in sorted value order in BOTH engines
    (sort_array + aggregate vs list_sort + list_reduce — the
    q_mutual_info discipline), rounded once.

    100 TB: one hash agg per profiled column (map-side combined);
    every fold runs over the bounded distinct-value frame, collected
    to ONE array row per column. Columns fan out as independent
    subplans — a profiler over hundreds of columns batches them the
    same way.
    """
    frames = []
    for label, table, col in _PROFILE_COLS:
        tbl = load(spark, sf_dir, table)
        cnt = tbl.groupBy(
            F.col(col).cast("string").alias("v")
        ).agg(F.count("*").alias("c"))
        agg = cnt.agg(
            F.sum("c").cast("bigint").alias("nn"),
            F.count("*").cast("bigint").alias("nd"),
            F.max("c").cast("bigint").alias("mx"),
            F.sort_array(F.collect_list(F.struct("v", "c"))).alias("lst"),
        )
        frames.append(
            agg.select(
                F.lit(label).alias("col_name"),
                F.col("nn").alias("n_rows"),
                F.col("nd").alias("n_distinct"),
                F.expr(_TOP_SHARE).alias("top_share"),
                F.expr(
                    """ROUND(aggregate(lst, CAST(0.0 AS DOUBLE),
                           (a, s) -> a - (CAST(s.c AS DOUBLE) / nn)
                                     * ln(CAST(s.c AS DOUBLE) / nn)), 6)"""
                ).alias("entropy_nats"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("col_name")

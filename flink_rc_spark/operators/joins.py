"""Join queries (SURVEY.md §2.2 "Joins").

Scale story (100 TB):
- Fact⋈fact equi-joins (lineitem⋈orders) shuffle both sides on the
  key → sort-merge join; AQE converts to broadcast when a side turns
  out small and splits skewed partitions. On a real lake, bucketing
  both facts by orderkey removes this shuffle entirely.
- Dimension joins (nation, region, customer-at-small-SF) are
  broadcast explicitly with ``F.broadcast`` — no shuffle of the fact
  side at any scale.
- The interval self-join and as-of join shuffle once on the equi key
  and do per-key ordered work — the time-range predicate is applied
  inside the sort-merge join, never as a cartesian product (asserted
  by plan tests).

Reference parity: the reference's only join-like operator is pairing
two streams by sequence index (SURVEY.md §2.1 R8, expected in
lm/LinearRegression.java [K:med, unverified]) — covered here by the
general equi-join surface; everything else is beyond-reference
(BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_rc_spark.functions.exact import dec, dlit
from flink_rc_spark.plans.inspect import checkpoint
from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Generic as-of join: each left row gets the payload of the latest
    right row with ``right.ts <= left.ts`` on the same key.

    Implemented as union + ordered window (``last(..., ignorenulls)``
    over unbounded-preceding) — ONE shuffle on (key, ts); no range
    explosion. At 100 TB this scales with the shuffle, and skewed keys
    can be salted because the window only needs per-key time order.
    DuckDB expresses the same thing natively as ASOF JOIN (oracle).
    Equal timestamps: the right row sorts before the left probe
    (side 0 < 1), matching ASOF's inclusive ``<=``.
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_payload],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *right_payload,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag)
    for c in right_payload:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("_side") == 1).drop("_k", "_ts", "_side")


@register(
    "q_join_inner",
    oracle="""
        SELECT l_orderkey, l_linenumber, o_orderstatus, o_orderpriority, l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 150000.0
    """,
)
def q_join_inner(spark, sf_dir):
    """Fact⋈fact equi inner join (sort-merge / AQE-broadcast)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "o_orderstatus", "o_orderpriority", "l_quantity"
    )


@register(
    "q_join_broadcast",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Explicit broadcast of the 5-row dimension — zero shuffle of the
    probe side at any scale (plan-asserted)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_left",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark, sf_dir):
    """Left outer join — customers without orders keep NULL order cols."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
    """,
)
def q_join_right(spark, sf_dir):
    """Right outer join (mirror of q_join_left, probe side flipped)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return o.join(c, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_full",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM (SELECT * FROM customer WHERE c_custkey < 500) c
        FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 50000.0) o
          ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full(spark, sf_dir):
    """Full outer join with NULL padding on both sides."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
    """,
)
def q_join_semi(spark, sf_dir):
    """EXISTS → left semi join (emits each matching left row once)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000.0)
    """,
)
def q_join_anti(spark, sf_dir):
    """NOT EXISTS → left anti join (customers with no >400k order)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_theta",
    oracle="""
        SELECT r_regionkey, n_nationkey, r_name, n_name
        FROM region JOIN nation ON r_regionkey < n_regionkey
    """,
)
def q_join_theta(spark, sf_dir):
    """Pure non-equi (theta) join — broadcast nested loop on a tiny
    side. At scale, theta joins need a broadcastable side or a
    bucketized range-join rewrite (see asof_join for the pattern)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.join(F.broadcast(n), r.r_regionkey < n.n_regionkey).select(
        "r_regionkey", "n_nationkey", "r_name", "n_name"
    )


@register(
    "q_join_multiway",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def q_join_multiway(spark, sf_dir):
    """4-way star join (TPC-H Q5 shape): two fact shuffles + one
    broadcast dim; Catalyst/AQE pick per-join strategy."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (dlit(1) - dec("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_join_selfjoin",
    oracle="""
        SELECT a.event_id AS eid_a, b.event_id AS eid_b, a.user_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 1 HOUR
        WHERE a.event_type = 'error'
    """,
)
def q_join_selfjoin(spark, sf_dir):
    """Interval self-join: for each error event, all events of the same
    user within the following hour. Equi key (user_id) keeps this a
    hash/sort-merge join with a range residual — never cartesian."""
    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid_a"),
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
    )
    b = e.select(
        F.col("event_id").alias("eid_b"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.user_b)
            & (b.ts_b > a.ts_a)
            & (b.ts_b <= a.ts_a + F.expr("INTERVAL 1 HOUR")),
        )
        .select("eid_a", "eid_b", "user_id")
    )


@register(
    "q_join_asof",
    oracle="""
        SELECT e.event_id, e.user_id, p.event_id AS prev_purchase_id
        FROM events e
        ASOF LEFT JOIN (SELECT user_id, ts, event_id
                        FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: each event ↦ the latest purchase of the same user at
    or before its timestamp (union + ordered window; see asof_join)."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("prev_purchase_id")
    )
    left = e.select("event_id", "user_id", "ts")
    out = asof_join(
        left,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["prev_purchase_id"],
    )
    return out.select("event_id", "user_id", "prev_purchase_id")


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark, sf_dir):
    """Explicit small cross join (5 × 25)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_join_interval",
    oracle="""
        WITH iv AS (
            SELECT o_custkey AS cust, o_orderkey AS k,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL 7 DAY AS e
            FROM orders
        )
        SELECT a.cust, a.k AS key_a, b.k AS key_b,
               CAST(date_diff('day',
                              greatest(a.s, b.s),
                              least(a.e, b.e)) AS BIGINT) AS overlap_days
        FROM iv a JOIN iv b
          ON a.cust = b.cust AND a.k < b.k
         AND a.s < b.e AND b.s < a.e
        ORDER BY a.cust, key_a, key_b
    """,
    tags=("join", "interval"),
)
def q_join_interval(spark, sf_dir):
    """INTERVAL OVERLAP self-join: pairs of 7-day order windows of the
    same customer that overlap in time ("concurrent open orders") with
    the exact overlap length — the general interval join, where as-of
    (q_join_asof) is the point-lookup special case and the band theta
    join (q_join_theta) is the fixed-offset special case.

    The oracle spells the textbook quadratic-per-key overlap
    predicate. The builder is the GRID-BUCKETED candidate generator —
    q_geo_radius_join's playbook in one dimension (time): week cells
    sized to the interval width, every interval lands in ≤ 2 cells, so
    candidates come from an EQUI-join on (customer, cell), are
    deduped (a pair may share both cells), and only then verified by
    the exact predicate. The driver hash proves grid candidates +
    verify ≡ the quadratic spelling.

    100 TB: shuffle is on (cust, cell) — time-bounded and key-spread —
    and per-cell occupancy (orders per customer per week) bounds the
    in-bucket quadratic, the same knob as LSH bucket size / geo cell
    occupancy / fuzzy-join block size. An unkeyed interval join
    drops the customer key from the cell id; nothing else changes.
    Overlap arithmetic is whole days on date-truncated timestamps —
    integer-exact in both engines.
    """
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day"),
    )
    cells = iv.select(
        "cust",
        "k",
        "s",
        "e",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr("day div 7"),
                    F.expr("(day + 6) div 7"),
                )
            )
        ).alias("cell"),
    )
    a = cells.select(
        "cust", "cell", F.col("k").alias("ka"), F.col("s").alias("sa"), F.col("e").alias("ea")
    )
    b = cells.select(
        F.col("cust").alias("cust_b"),
        F.col("cell").alias("cell_b"),
        F.col("k").alias("kb"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("cust") == F.col("cust_b"))
            & (F.col("cell") == F.col("cell_b"))
            & (F.col("ka") < F.col("kb")),
        )
        .select("cust", "ka", "kb", "sa", "ea", "sb", "eb")
        .distinct()
        .filter((F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea")))
    )
    return pairs.select(
        "cust",
        F.col("ka").alias("key_a"),
        F.col("kb").alias("key_b"),
        F.datediff(
            F.least("ea", "eb"), F.greatest("sa", "sb")
        )
        .cast("bigint")
        .alias("overlap_days"),
    ).orderBy("cust", "key_a", "key_b")


def diagnose_salt_factor(fact, key_col: str, parts: int = 32) -> int:
    """q_skew_stats' salt_factor for a fact frame's heaviest join key
    — the diagnosis WIRED to the remedy (r7, VERDICT r6 item 5):
    ceil(max_key_rows * parts / total), floored at 1 and capped at
    parts (splitting a key across more reducers than the shuffle has
    partitions buys nothing).

    Cost: one map-side-combinable hash agg over the fact keyed by the
    join key, reduced to a single (max, total) row — the same
    pre-flight a 100 TB pipeline runs before shuffling on a key (AQE's
    skewedJoin makes the equivalent measurement from shuffle stats at
    runtime; this is the explicit, deterministic spelling). The
    collect is one 2-column row: driver-safe.
    """
    row = (
        fact.groupBy(key_col)
        .agg(F.count("*").alias("n_rows"))
        .agg(
            F.max("n_rows").cast("bigint").alias("mx"),
            F.sum("n_rows").cast("bigint").alias("total"),
        )
        .first()
    )
    if not row or not row["total"]:
        return 1
    factor = (row["mx"] * parts + row["total"] - 1) // row["total"]
    return int(max(1, min(parts, factor)))


def pair_support_salted(
    basket: DataFrame,
    key_col: str,
    item_col: str,
    out_a: str,
    out_b: str,
    out_n: str,
    parts: int = 32,
    materialized: bool = False,
) -> DataFrame:
    """Within-key item pairs (out_a < out_b) with co-occurrence
    counts — the market-basket self-join, shared by q_basket_pairs /
    q_link_predict, with the hot-key quadratic handled (r7 verdict
    item 6):

    - the basket is localCheckpoint'ed ONCE: the plain self-join
      otherwise computes the whole basket subtree (fact join +
      distinct) twice — no ReusedExchange fires across join sides —
      and the skew diagnosis then reads the materialized frame for
      the cost of a slim agg;
    - `diagnose_salt_factor`'s measurement decides; on uniform
      baskets (factor 1) the plan is the plain codegen'd equi-join,
      zero overhead;
    - on a skewed key, the ONE-SIDED salt spreads the per-key
      quadratic — but ONLY for the flagged HOT keys (r8 advice: the
      old form replicated the ENTIRE right side `factor` ways, so one
      hot key among many cold ones grew the whole join input up to
      32x). Keys at >= 2x a reducer's fair share (occupancy >= 2 —
      at most parts/2 of them can exist, so the driver-side list is
      bounded by construction) get left-side bucketing by
      hash(item) % factor and right-side replication; cold keys keep
      salt 0 on both sides and join exactly as before. Every (a, b)
      pair still joins exactly once — at a's bucket — so the result
      is IDENTICAL (tested row-for-row vs the plain join); the hot
      key's C(B,2) fan-out and compare work split across `factor`
      tasks instead of one straggler.

    ``materialized=True`` skips the internal localCheckpoint for
    callers that already hold a checkpointed basket (q_assoc_rules
    reuses its basket frame for the item-support and basket-count
    aggregates too — double-checkpointing would re-materialize the
    same rows for nothing).

    r13 tried-and-REVERTED: an Arrow pair-count kernel with in-kernel
    partial aggregation (the q_itemsets_apriori triple-kernel shape —
    collect each basket to a sorted array, enumerate C(B,2) in numpy,
    bincount partials). Measured min-of-3 at sf0.1: q_basket_pairs
    3.56 -> 8.92 s, q_assoc_rules 3.52 -> 9.64 s, q_link_predict
    3.76 -> 8.58 s. Why it loses where the triple kernel wins: partial
    aggregation only collapses when the pair-key space is BOUNDED
    (apriori's 40-word vocabulary caps partials at C(40,3) per task);
    basket pairs over the 20k-part catalog are ~12M mostly-count-1
    partials at sf0.1, so the kernel shipped the same row volume back
    across the Python boundary (Arrow transfer + np.unique sorts) that
    the codegen'd join feeds straight into the JVM hash aggregate.
    The self-join spelling stays (guide §1: the measured loss decides).
    """
    cached = basket if materialized else basket.transform(checkpoint, eager=True)
    kc = cached.groupBy(key_col).agg(F.count("*").alias("_kn"))
    stats = kc.agg(
        F.max("_kn").cast("bigint").alias("mx"),
        F.sum("_kn").cast("bigint").alias("total"),
    ).first()
    if not stats or not stats["total"]:
        factor = 1
    else:
        factor = int(
            max(
                1,
                min(
                    parts,
                    (stats["mx"] * parts + stats["total"] - 1)
                    // stats["total"],
                ),
            )
        )
    a = cached.select(key_col, F.col(item_col).alias(out_a))
    b = cached.select(key_col, F.col(item_col).alias(out_b))
    hot: list = []
    if factor > 1:
        hot = [
            r[0]
            for r in kc.filter(
                F.col("_kn") * parts >= F.lit(2 * stats["total"])
            )
            .select(key_col)
            .collect()  # <= parts/2 rows by construction
        ]
    if hot:
        is_hot = F.col(key_col).isin(hot)
        a = a.withColumn(
            "_ps",
            F.when(
                is_hot, F.pmod(F.xxhash64(out_a), F.lit(factor))
            )
            .otherwise(0)
            .cast("int"),
        )
        # explode is a generator — it cannot sit inside another
        # expression (no .cast() around it); emit it bare, then cast
        # in a separate projection so the join key types match
        b = b.withColumn(
            "_ps",
            F.explode(
                F.when(
                    is_hot, F.sequence(F.lit(0), F.lit(factor - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        ).withColumn("_ps", F.col("_ps").cast("int"))
        joined = a.join(b, [key_col, "_ps"]).drop("_ps")
    else:
        joined = a.join(b, key_col)
    return (
        joined.filter(F.col(out_a) < F.col(out_b))
        .groupBy(out_a, out_b)
        .agg(F.count("*").alias(out_n))
    )


@register(
    "q_join_salted",
    oracle="""
        WITH fact AS (
            SELECT CASE WHEN o_custkey % 10 < 3 THEN 0
                        ELSE o_custkey END AS hk,
                   o_totalprice
            FROM orders
        ),
        dim AS (
            SELECT DISTINCT hk, hk % 7 AS grp FROM fact
        )
        SELECT d.grp,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(f.o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS total_price
        FROM fact f JOIN dim d ON f.hk = d.hk
        GROUP BY d.grp
        ORDER BY d.grp
    """,
    tags=("join", "skew"),
)
def q_join_salted(spark, sf_dir):
    """SALTED JOIN — completing the skew-mitigation trilogy
    (q_agg_salted: hot GROUP key; q_win_salted: hot PARTITION key;
    here: hot JOIN key). The fact's key is deliberately skewed inside
    the query (30% of orders collapse onto key 0 — a hot-user /
    null-key / default-value shape every real fact table has); a plain
    shuffle join would put 30% of the table in ONE reducer. The
    declared plan salts — with the fan-out CHOSEN BY MEASUREMENT, not
    hardcoded (r7): diagnose_salt_factor computes q_skew_stats'
    recommended factor for this fact's heaviest key (~10 for the 30%
    hot key on a 32-partition shuffle), the fact adds
    salt = pmod(orderkey, factor), the dim side replicates ×factor
    via explode, and the join runs on (key, salt) — the hot key's
    rows spread over `factor` reducers. A merge
    hint pins the shuffled SMJ path so the salted exchange is really
    exercised (broadcast would hide the skew — and is the right fix
    ONLY while the dim fits in memory; salting is for when it
    doesn't). The oracle is the PLAIN join: the driver hash proves
    salting changes the partitioning, never the result.

    100 TB notes: salt fan-out multiplies the SMALL side by 8 — cheap
    for dims, and at two-big-tables scale you salt ONLY the hot keys
    (split the fact by a frequency sketch, e.g. q_sketch_cms, salt the
    hot slice, union the plans). AQE's skew-join split handles sort-
    merge stragglers adaptively (measured 2.3x, tools/skew_probe.py);
    the explicit salt is the deterministic spelling that also covers
    hash joins and pre-AQE engines.
    """
    o = load(spark, sf_dir, "orders")
    keyed = o.select(
        F.when(F.col("o_custkey") % 10 < 3, F.lit(0).cast("bigint"))
        .otherwise(F.col("o_custkey"))
        .alias("hk"),
        "o_totalprice",
        "o_orderkey",
    )
    # the measured remedy: q_skew_stats' salt factor for THIS fact's
    # hot key decides the fan-out (salting never changes the result,
    # so the data-dependent-but-deterministic factor is oracle-safe)
    salt_n = diagnose_salt_factor(keyed, "hk", parts=32)
    fact = keyed.select(
        "hk",
        "o_totalprice",
        F.pmod(F.col("o_orderkey"), F.lit(salt_n)).alias("salt"),
    )
    dim = (
        fact.select("hk")
        .distinct()
        .select("hk", (F.col("hk") % 7).alias("grp"))
    )
    dim_exp = dim.select(
        "hk",
        "grp",
        F.explode(F.expr(f"sequence(0, {salt_n - 1})")).alias("salt"),
    )
    joined = fact.join(dim_exp.hint("merge"), ["hk", "salt"])
    return (
        joined.groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("grp")
    )


@register(
    "q_join_asof_nearest",
    oracle="""
        WITH p AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase'
        ), b AS (
            SELECT e.event_id, e.user_id, e.ts,
                   p.event_id AS prev_id, p.ts AS prev_ts
            FROM events e
            ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        ), f AS (
            SELECT e.event_id, p.event_id AS next_id, p.ts AS next_ts
            FROM events e
            ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
        )
        SELECT b.event_id, b.user_id,
               CASE
                 WHEN b.prev_id IS NULL THEN f.next_id
                 WHEN f.next_id IS NULL THEN b.prev_id
                 WHEN epoch_us(b.ts) - epoch_us(b.prev_ts)
                      <= epoch_us(f.next_ts) - epoch_us(b.ts) THEN b.prev_id
                 ELSE f.next_id
               END AS nearest_purchase_id,
               CASE
                 WHEN b.prev_id IS NULL AND f.next_id IS NULL THEN NULL
                 WHEN b.prev_id IS NULL
                   THEN epoch_us(f.next_ts) - epoch_us(b.ts)
                 WHEN f.next_id IS NULL
                   THEN epoch_us(b.prev_ts) - epoch_us(b.ts)
                 WHEN epoch_us(b.ts) - epoch_us(b.prev_ts)
                      <= epoch_us(f.next_ts) - epoch_us(b.ts)
                   THEN epoch_us(b.prev_ts) - epoch_us(b.ts)
                 ELSE epoch_us(f.next_ts) - epoch_us(b.ts)
               END AS dt_us
        FROM b JOIN f ON b.event_id = f.event_id
    """,
)
def q_join_asof_nearest(spark, sf_dir):
    """NEAREST-neighbor as-of join: each event ↦ the temporally
    CLOSEST purchase of the same user, either direction, ties to the
    earlier side — the sensor-fusion/feature-alignment semantics
    (backward-only as-of, q_join_asof, biases features stale; nearest
    is what clock-skewed sources need). dt_us is signed (≤ 0 looking
    back, ≥ 0 looking forward), integer epoch microseconds.

    Spark lacks ASOF JOIN; the declared rewrite runs asof_join's
    union+ordered-window pass twice — backward on ts, forward on
    NEGATED epoch micros (a forward as-of IS a backward as-of on the
    reversed clock) — then one row-local CASE picks the nearer side.
    The oracle spells it as two native DuckDB ASOF joins.

    Plan: two (user, time)-ordered windows — same single-shuffle
    shape as q_join_asof, one per direction (the second reuses the
    user_id hash partitioning); no range explosion, no self-join.
    """
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("prev_id"),
        F.unix_micros("ts").alias("prev_um"),
    )
    left = e.select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("um")
    )
    back = asof_join(
        left, purchases, "user_id", "ts", "ts", ["prev_id", "prev_um"]
    )
    fwd_right = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (-F.unix_micros("ts")).alias("nts"),
        F.col("event_id").alias("next_id"),
        F.unix_micros("ts").alias("next_um"),
    )
    left2 = back.withColumn("nts", -F.col("um"))
    both = asof_join(
        left2, fwd_right, "user_id", "nts", "nts", ["next_id", "next_um"]
    )
    d_prev = F.col("um") - F.col("prev_um")
    d_next = F.col("next_um") - F.col("um")
    pick_prev = F.col("next_id").isNull() | (
        F.col("prev_id").isNotNull() & (d_prev <= d_next)
    )
    return both.select(
        "event_id",
        "user_id",
        F.when(pick_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("nearest_purchase_id"),
        F.when(
            F.col("prev_id").isNull() & F.col("next_id").isNull(),
            F.lit(None).cast("long"),
        )
        .when(pick_prev, F.col("prev_um") - F.col("um"))
        .otherwise(d_next)
        .alias("dt_us"),
    )

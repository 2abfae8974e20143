"""Set-operation queries (SURVEY.md §2.2 "Set operations").

Scale story (100 TB): UNION ALL is free (no shuffle — partitions
concatenate). Distinct-flavored ops (UNION / INTERSECT / EXCEPT)
shuffle on the full row — keep projections narrow before them, which
these queries do (key + one attribute).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


@register(
    "q_set_union_all",
    oracle="""
        SELECT c_custkey AS key, 'customer' AS src FROM customer
        WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT o_custkey AS key, 'big_order' AS src FROM orders
        WHERE o_totalprice > 400000.0
    """,
)
def q_set_union_all(spark, sf_dir):
    """UNION ALL (bag semantics, duplicates preserved)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("src")
    )
    b = o.filter(F.col("o_totalprice") > 400000.0).select(
        F.col("o_custkey").alias("key"), F.lit("big_order").alias("src")
    )
    return a.unionByName(b)


@register(
    "q_set_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_union(spark, sf_dir):
    """UNION (set semantics — distinct)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_set_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_intersect(spark, sf_dir):
    """INTERSECT (distinct): customers with both F and O orders."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(op)


@register(
    "q_set_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def q_set_except(spark, sf_dir):
    """EXCEPT (distinct): BUILDING customers with no >300k order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 300000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)


@register(
    "q_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
                   l_quantity AS val
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax', l_tax
            FROM lineitem WHERE l_orderkey < 200
        )
        ORDER BY l_orderkey, l_linenumber, metric
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot (wide -> long) via `stack`: three measure columns melt
    into (metric, val) rows — the inverse of q_agg_pivot. `stack` is a
    generator expression (no shuffle, no UNION re-scan: ONE pass emits
    3 rows per input row, vs the oracle's 3-scan UNION ALL — same
    result, better plan)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount,"
            " 'tax', l_tax) AS (metric, val)"
        ),
    ).orderBy("l_orderkey", "l_linenumber", "metric")


@register(
    "q_set_except_all",
    oracle="""
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM (
            SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
            EXCEPT ALL
            SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        )
        GROUP BY l_partkey
    """,
    tags=("setops", "sql"),
)
def q_set_except_all(spark, sf_dir):
    """EXCEPT ALL — MULTISET difference (bag semantics: a part
    surviving max(cnt_R − cnt_A, 0) times), the variant q_set_except's
    DISTINCT flavor cannot express; the per-part multiplicity rollup
    keeps the declared output bounded while hashing the full bag.

    Plan: both engines rewrite bag-EXCEPT as a counted anti-
    difference — one hash shuffle on the key, no row explosion; the
    same shape at 100 TB as a grouped count join.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_setall_li")
    return spark.sql(
        """
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM (
            SELECT l_partkey FROM _setall_li WHERE l_returnflag = 'R'
            EXCEPT ALL
            SELECT l_partkey FROM _setall_li WHERE l_returnflag = 'A'
        )
        GROUP BY l_partkey
        """
    )


@register(
    "q_set_intersect_all",
    oracle="""
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM (
            SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
            INTERSECT ALL
            SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        )
        GROUP BY l_partkey
    """,
    tags=("setops", "sql"),
)
def q_set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — MULTISET intersection (each part kept
    min(cnt_R, cnt_A) times), completing the bag-semantics pair with
    q_set_except_all; multiplicity rollup bounds the output.

    Plan: counted min-join on the key — one hash shuffle, identical
    cost shape in both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_setall_li")
    return spark.sql(
        """
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM (
            SELECT l_partkey FROM _setall_li WHERE l_returnflag = 'R'
            INTERSECT ALL
            SELECT l_partkey FROM _setall_li WHERE l_returnflag = 'A'
        )
        GROUP BY l_partkey
        """
    )

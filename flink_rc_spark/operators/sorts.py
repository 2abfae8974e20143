"""Sort / limit / top-k queries (SURVEY.md §2.2 "Sorts / limits / top-k").

Scale story (100 TB): global ORDER BY is a range-partitioned sort
(sampling + range exchange) — fine for final output. ORDER BY + LIMIT
never globally sorts: Spark plans TakeOrderedAndProject (per-partition
top-k + driver merge of k·partitions rows). Top-k per group is a
window row_number ≤ k — one shuffle on the group key, no global sort.
All orderings include a unique tiebreak so results are deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


@register(
    "q_sort_multi",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_totalprice > 450000.0
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_totalprice DESC NULLS LAST,
                 o_orderkey
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key ORDER BY with asc/desc and NULLS FIRST/LAST."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc_nulls_first("o_orderstatus"),
            F.desc_nulls_last("o_totalprice"),
            F.asc("o_orderkey"),
        )
    )


@register(
    "q_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
)
def q_topk(spark, sf_dir):
    """Global top-k (TakeOrderedAndProject — no full sort at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(100)
    )


@register(
    "q_topk_per_group",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) t
        WHERE rn <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Top-3 orders per priority via ranked window."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )

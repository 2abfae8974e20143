"""Filter / predicate queries (SURVEY.md §2.2 "Filters / predicates").

The reference's only filtering is a hand-written column bitmask +
train/test index threshold (SURVEY.md §2.1 R2/R9); here predicates are
declarative so Catalyst folds constants, reorders cheap predicates
first, and pushes the eligible conjuncts to the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


@register(
    "q_filter_basic",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
        FROM lineitem
        WHERE l_quantity >= 30.0
          AND l_discount <> 0.0
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_linenumber <= 4
    """,
)
def q_filter_basic(spark, sf_dir):
    """Comparison operators =, <, >, <=, >=, <> on numeric and date."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate"
    ).filter(
        (F.col("l_quantity") >= 30.0)
        & (F.col("l_discount") != 0.0)
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_linenumber") <= 4)
    )


@register(
    "q_filter_compound",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' AND o_totalprice > 100000.0)
           OR (NOT (o_orderpriority = '1-URGENT') AND o_totalprice < 5000.0)
    """,
)
def q_filter_compound(spark, sf_dir):
    """AND / OR / NOT with explicit parenthesization."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    ).filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0))
        | (~(F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 5000.0))
    )


@register(
    "q_filter_between_in_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE p_size BETWEEN 10 AND 20
          AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_name LIKE '%a%'
    """,
)
def q_filter_between_in_like(spark, sf_dir):
    """BETWEEN, IN list and LIKE pattern."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_brand", "p_size").filter(
        F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").like("%a%")
    )


@register(
    "q_filter_null",
    oracle="""
        SELECT (props IS NULL) AS props_is_null,
               (value IS NOT NULL) AS value_not_null,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
)
def q_filter_null(spark, sf_dir):
    """IS NULL / IS NOT NULL three-valued-logic surface (grouped so the
    query is informative even when the generated data has no nulls)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.col("props").isNull().alias("props_is_null"),
        F.col("value").isNotNull().alias("value_not_null"),
    ).agg(F.count("*").alias("n"))

"""Subquery / CTE queries (SURVEY.md §2.2 "Subqueries / CTE").

Built with ``spark.sql`` over registered temp views so Catalyst's
subquery machinery (scalar-subquery broadcast, IN→semi-join rewrite,
correlated-EXISTS decorrelation) is what actually executes — the point
of these keys is exercising the optimizer, not hand-rewriting.

Scale story (100 TB): the scalar subquery executes once and broadcasts
its single row; IN/EXISTS decorrelate to semi-joins (shuffle on the
key, no per-row re-execution).
"""

from __future__ import annotations

from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


def _views(spark, sf_dir, *names):
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "q_subq_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_extendedprice >
              1.5 * (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                            / COUNT(*)
                     FROM lineitem)
    """,
)
def q_subq_scalar(spark, sf_dir):
    """Scalar subquery in a predicate (price > 1.5× global average).

    The average is computed decimal-exact on both sides so the
    comparison threshold is bit-identical (no boundary flakiness).
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_extendedprice >
              1.5 * (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                            / COUNT(*)
                     FROM lineitem)
        """
    )


@register(
    "q_subq_in",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > 200000.0
    """,
)
def q_subq_in(spark, sf_dir):
    """IN (SELECT ...) → left semi join after Catalyst rewrite."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > 200000.0
        """
    )


@register(
    "q_subq_exists_corr",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
    """,
)
def q_subq_exists_corr(spark, sf_dir):
    """Correlated EXISTS — Catalyst decorrelates to a semi-join."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
        """
    )


@register(
    "q_cte",
    oracle="""
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_totalprice > 350000.0
        ),
        cust_big AS (
            SELECT o_custkey, COUNT(*) AS n_big,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_big
            FROM big_orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_mktsegment, n_big, total_big
        FROM customer JOIN cust_big ON c_custkey = o_custkey
    """,
)
def q_cte(spark, sf_dir):
    """Chained CTEs feeding a join (WITH ... AS)."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_totalprice > 350000.0
        ),
        cust_big AS (
            SELECT o_custkey, COUNT(*) AS n_big,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_big
            FROM big_orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_mktsegment, n_big, total_big
        FROM customer JOIN cust_big ON c_custkey = o_custkey
        """
    )

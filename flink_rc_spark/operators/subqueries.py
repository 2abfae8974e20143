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


@register(
    "q_subq_lateral",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                   AS o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_orderkey
    """,
    tags=("subquery", "join", "sql"),
)
def q_subq_lateral(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 4 LATERAL join): each
    customer's top-2 orders by price, written the way an analyst
    writes it in SQL — the per-row subquery form of q_topk_per_group
    (whose window spelling is the classic rewrite). Ties break on
    o_orderkey so LIMIT is total-ordered; both engines support the
    identical LATERAL syntax, and Catalyst DECORRELATES the subquery
    into a partitioned window/join plan rather than executing it
    per-row — which is why the shape survives 100 TB: the executed
    plan is one orders shuffle keyed by customer, the same as the
    window twin, never |customers| subquery executions.
    """
    from flink_rc_spark.sources.tables import load

    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                   AS o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_orderkey
        """
    )

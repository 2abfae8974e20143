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


@register(
    "q_recursive_cte",
    oracle="""
        WITH RECURSIVE edges AS (
            SELECT c_custkey AS v, CAST((c_custkey - 1) // 2 AS BIGINT) AS p
            FROM customer WHERE c_custkey >= 1
        ),
        chain(v, depth, path) AS (
            SELECT v, CAST(1 AS BIGINT), CAST(v AS VARCHAR)
            FROM edges WHERE p = 0
            UNION ALL
            SELECT e.v, chain.depth + 1,
                   chain.path || '/' || CAST(e.v AS VARCHAR)
            FROM edges e JOIN chain ON e.p = chain.v
        )
        SELECT v AS c_custkey, depth, path FROM chain ORDER BY v
    """,
    tags=("subquery", "cte", "iterative"),
)
def q_recursive_cte(spark, sf_dir):
    """NATIVE RECURSIVE CTE (Spark 4's WITH RECURSIVE, SPARK-24497):
    the management-chain enumeration — every customer's depth and
    root-to-node PATH STRING over the same heap-shaped hierarchy
    q_hierarchy_rollup traverses (parent = (c_custkey-1) div 2,
    forest roots at parent 0). Path assembly is recursion's signature
    capability: the pointer-doubling closure can recover depths and
    subtree aggregates, but an ORDERED path string composes naturally
    only top-down, level by level.

    Spark 4.1 executes the recursion as an iterative UNION ALL loop —
    one equi-join per tree LEVEL (the engine-native frontier
    expansion), so rounds = tree depth = O(log n) here; DuckDB runs
    the identical SQL (only CAST AS STRING/VARCHAR differs
    textually), and the hash pins every path. Spark's recursion
    supports UNION ALL only (no UNION dedup yet), which is exactly
    right for a TREE: one path per node, no multiplicity to dedup.

    100 TB: each level is a hash equi-join frontier ⋈ edges — the
    same shuffle shape as q_graph_bfs's hand-written loop, now planned
    by the engine; for cyclic graphs or depth ≫ log n, the
    hand-written variants (frontier + visited anti-join; pointer
    doubling) remain the scale path — that trade is the point of
    owning both spellings. Guard: spark.sql.cteRecursionLevelLimit
    (default 100) bounds runaway recursion, far above any log-depth
    tree.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        WITH RECURSIVE edges AS (
            SELECT c_custkey AS v, CAST((c_custkey - 1) DIV 2 AS BIGINT) AS p
            FROM customer WHERE c_custkey >= 1
        ),
        chain(v, depth, path) AS (
            SELECT v, CAST(1 AS BIGINT), CAST(v AS STRING)
            FROM edges WHERE p = 0
            UNION ALL
            SELECT e.v, chain.depth + 1,
                   chain.path || '/' || CAST(e.v AS STRING)
            FROM edges e JOIN chain ON e.p = chain.v
        )
        SELECT v AS c_custkey, depth, path FROM chain ORDER BY v
    """)


@register(
    "q_pipe_syntax",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2))))
                   AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql", "pipe", "agg"),
)
def q_pipe_syntax(spark, sf_dir):
    """SQL PIPE SYNTAX (Spark 4, SPARK-49555 — the |> operator
    chain): the TPC-H Q1 pricing-summary shape written as a linear
    pipeline — FROM |> WHERE |> EXTEND (computed discount price)
    |> AGGREGATE ... GROUP BY |> ORDER BY — the composable SQL
    dialect analytics notebooks are converging on (BigQuery pipe
    syntax, PRQL, and Spark 4 all implement the same shape).

    Pipe stages desugar in the parser: Catalyst receives the SAME
    logical plan as the classic spelling, so pushdown, partial
    aggregation, and whole-stage codegen are untouched — the DuckDB
    oracle IS the classic desugared SQL, and the hash proves the
    dialect is sugar, not semantics. Sums ride DECIMAL per the
    registry float policy.

    100 TB: identical to q_agg_group/q_tpch_q1 — filter pushed to the
    scan, two-phase hash agg on a 4-group key.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS disc_price
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                         AS sum_qty,
                     CAST(SUM(disc_price) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
    """)

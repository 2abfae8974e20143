"""Scan / projection queries (SURVEY.md §2.2 "Scans / sources / sinks").

100 TB story: projection and predicates are expressed declaratively so
Catalyst pushes them into the parquet scan — column pruning means a
2-column projection reads 2 column chunks, not the table; predicate
pushdown skips row groups via min/max stats. Plan tests in
tests/test_plans.py assert PushedFilters / ReadSchema on these exact
queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


@register(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
)
def q_scan_project(spark, sf_dir):
    """Parquet scan + column projection (reads only 3 of 11 columns)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "q_scan_pruned",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_quantity < 5.0
    """,
)
def q_scan_pruned(spark, sf_dir):
    """Projection + predicate, both pushed into the parquet scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity") < 5.0)
    )

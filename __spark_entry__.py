"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``flink_rc_spark``'s declared-query registry
(flink_rc_spark/registry.py): every implemented operator from
SURVEY.md §2 registers a builder plus (when SQL-expressible) a DuckDB
oracle; this module just re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_rc_spark.registry import REGISTRY, get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, q_agg_group) on sf0.001."""
    get_queries()  # ensure registry is populated
    return REGISTRY["q_agg_group"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (omitted ⇒ rows-only)."""
    return get_oracles()

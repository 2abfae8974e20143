"""Declared-query parity vs DuckDB — local mirror of the driver's t2.

Every registered query with an oracle is compared exactly (row count +
columns + order-insensitive values). Queries without an oracle get a
smoke run (schema resolves, returns rows).
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, load_all

load_all()

WITH_ORACLE = sorted(k for k, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(k for k, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("key", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, key):
    from tests.parity import run_parity

    spec = REGISTRY[key]
    run_parity(spark, duck, sf_dir, key, spec.builder, spec.oracle)


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_smoke(spark, sf_dir, key):
    spec = REGISTRY[key]
    df = spec.builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_agg_approx_within_tolerance(spark, sf_dir):
    """q_agg_approx is rows-only for the driver (approximate by
    design); this bounds it: HLL++ at rsd=0.01 must land within +-5%
    of the exact distinct counts, so the rows-only key is still a
    defensible implementation rather than an unchecked one."""
    row = REGISTRY["q_agg_approx"].builder(spark, sf_dir).first()
    from flink_rc_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem")
    exact = li.selectExpr(
        "count(distinct l_orderkey) AS o", "count(distinct l_partkey) AS p"
    ).first()
    assert abs(row.approx_orders - exact.o) <= 0.05 * exact.o, (row, exact)
    assert abs(row.approx_parts - exact.p) <= 0.05 * exact.p, (row, exact)


def test_prefix_agg_salted_equals_plain_window(spark, sf_dir):
    """The skew-safe two-phase prefix aggregation must equal the plain
    single-window result exactly — on a LOW-cardinality partition key
    (event_type, 5 values), the case where the plain window straggles
    at scale."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from flink_rc_spark.functions.exact import dec
    from flink_rc_spark.operators.windows import prefix_agg_salted
    from flink_rc_spark.sources.tables import load

    e = (
        load(spark, sf_dir, "events")
        .withColumn("us", F.unix_micros("ts"))
        .select("event_id", "event_type", "us", "value")
    )
    salted = prefix_agg_salted(
        e,
        part_col="event_type",
        bucket_on="us",
        order_cols=["us", "event_id"],
        value_col="value",
        n_buckets=8,
    ).select("event_id", "running_sum", "running_n")

    w = (
        W.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    plain = e.select(
        "event_id",
        F.sum(dec("value", 18, 2)).over(w).cast("double").alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )
    a = salted.orderBy("event_id").toPandas()
    b = plain.orderBy("event_id").toPandas()
    assert len(a) == len(b) > 0
    assert (a["running_n"].values == b["running_n"].values).all()
    assert (a["running_sum"].values == b["running_sum"].values).all()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_key_unique_and_documented():
    for k, s in REGISTRY.items():
        assert s.doc.strip(), f"{k} lacks a docstring/doc"


def test_sql_table_udf_inlines(spark, sf_dir):
    """Spark 4 SQL TABLE function (CREATE FUNCTION ... RETURNS TABLE):
    the declarative UDTF companion to q_sql_udf's scalar — define a
    table-valued sequence generator in SQL and assert it inlines to
    the same rows as the built-in it wraps (no Python, no Arrow: pure
    Catalyst inlining)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION seqn(n INT) RETURNS TABLE(i INT) "
        "RETURN SELECT explode(sequence(1, n))"
    )
    got = [r.i for r in spark.sql("SELECT i FROM seqn(5) ORDER BY i").collect()]
    assert got == [1, 2, 3, 4, 5]
    plan = spark.sql("SELECT i FROM seqn(5)")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan

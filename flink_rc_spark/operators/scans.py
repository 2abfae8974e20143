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


def _zorder_spark_expr() -> str:
    """Interleave the low 16 bits of part and supp keys (part gets the
    even bit positions) — 32 generated shift/mask terms, all
    whole-stage-codegen JVM bit ops."""
    terms = []
    for i in range(16):
        terms.append(f"shiftleft(shiftright(p, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright(s, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _zorder_duck_expr() -> str:
    terms = []
    for i in range(16):
        terms.append(f"(((p >> {i}) & 1) << {2 * i})")
        terms.append(f"(((s >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "q_zorder_layout",
    oracle=f"""
        WITH keyed AS (
            SELECT l_partkey % 65536 AS p, l_suppkey % 65536 AS s
            FROM lineitem
        ),
        z AS (SELECT p, s, {_zorder_duck_expr()} AS zval FROM keyed),
        buckets AS (
            SELECT zval >> 12 AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(MIN(p) AS BIGINT) AS min_part,
                   CAST(MAX(p) AS BIGINT) AS max_part,
                   CAST(MIN(s) AS BIGINT) AS min_supp,
                   CAST(MAX(s) AS BIGINT) AS max_supp
            FROM z GROUP BY zval >> 12
        )
        SELECT bucket, n_rows,
               max_part - min_part AS part_span,
               max_supp - min_supp AS supp_span
        FROM buckets
        ORDER BY n_rows DESC, bucket
        LIMIT 20
    """,
    tags=("scan", "layout"),
)
def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) layout audit: interleave the low 16 bits
    of l_partkey and l_suppkey into a single space-filling-curve key,
    bucket rows by the curve key >> 12 (4096-cell tiles), and report
    each bucket's row count and per-dimension key spans — the locality
    evidence (both spans bounded, not table-wide) that makes Z-order
    THE multi-dimensional data-clustering technique for 100 TB lakes:
    a file written in z-order serves min/max-stat file skipping on
    BOTH part and supp predicates at once, where sorting by one key
    serves only that key.

    The interleave is 32 generated shift/mask terms — integer-exact,
    whole-stage codegen, no UDF — and every output is a BIGINT, so the
    oracle hash pins the curve bit-for-bit. The audit itself is one
    scan + one hash agg on the derived bucket; applying the layout in
    production is the same expression feeding
    ``df.repartitionByRange(F.col("zval")).sortWithinPartitions``.
    """
    li = load(spark, sf_dir, "lineitem")
    z = li.select(
        (F.col("l_partkey") % 65536).alias("p"),
        (F.col("l_suppkey") % 65536).alias("s"),
    ).select("p", "s", F.expr(_zorder_spark_expr()).alias("zval"))
    return (
        z.groupBy(F.shiftright("zval", 12).alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("p").cast("bigint").alias("min_part"),
            F.max("p").cast("bigint").alias("max_part"),
            F.min("s").cast("bigint").alias("min_supp"),
            F.max("s").cast("bigint").alias("max_supp"),
        )
        .select(
            "bucket",
            "n_rows",
            (F.col("max_part") - F.col("min_part")).alias("part_span"),
            (F.col("max_supp") - F.col("min_supp")).alias("supp_span"),
        )
        .orderBy(F.desc("n_rows"), "bucket")
        .limit(20)
    )

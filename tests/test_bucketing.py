"""Bucketed co-located join: the write-side answer to repeated big-big
joins at 100 TB. Bucketing both fact tables by the join key with the
same bucket count lets every subsequent join run with ZERO exchange —
the shuffle is paid once at write time, not per query.
"""

from __future__ import annotations

import re

from flink_rc_spark.plans.inspect import formatted_plan
from flink_rc_spark.sources.sinks import write_bucketed_table
from flink_rc_spark.sources.tables import load


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    write_bucketed_table(
        orders, "orders_b", 8, ["o_orderkey"], sort_cols=["o_orderkey"],
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed_table(
        lineitem, "lineitem_b", 8, ["l_orderkey"], sort_cols=["l_orderkey"],
        path=str(tmp_path / "lineitem_b"),
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.sql(
            """
            SELECT o.o_orderkey, o.o_totalprice, l.l_quantity
            FROM orders_b o JOIN lineitem_b l ON o.o_orderkey = l.l_orderkey
            """
        )
        assert joined.count() == lineitem.count()
        plan = formatted_plan(joined)
        exchanges = set(re.findall(r"\((\d+)\) Exchange", plan))
        assert not exchanges, f"bucketed join must not shuffle:\n{plan}"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

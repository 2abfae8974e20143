"""Sink tests: layout (directory partitioning), roundtrip fidelity,
and that a partition-pruned read of the written layout actually prunes.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_rc_spark.plans.inspect import formatted_plan
from flink_rc_spark.sources.sinks import write_csv, write_parquet, write_text
from flink_rc_spark.sources.tables import load


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load(spark, sf_dir, "orders")
    write_parquet(
        orders,
        out,
        partition_by=["o_orderstatus"],
        cluster_by=["o_orderdate"],
        max_records_per_file=10_000,
    )
    # directory layout: one subdir per status value
    subdirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in orders.select("o_orderstatus").distinct().collect()}
    assert subdirs == {f"o_orderstatus={s}" for s in statuses}

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    # partition pruning visible in the plan of a filtered read
    one = sorted(statuses)[0]
    plan = formatted_plan(back.filter(F.col("o_orderstatus") == one))
    assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_salted_partitioned_write_spreads_hot_partition(spark, sf_dir, tmp_path):
    """files_per_partition > 1 must spread a hot partition value over
    several files (straggler mitigation) while keeping the directory
    layout and the data identical."""
    out = str(tmp_path / "orders_salted")
    orders = load(spark, sf_dir, "orders")
    write_parquet(
        orders,
        out,
        partition_by=["o_orderstatus"],
        files_per_partition=4,
        max_records_per_file=1_000_000,  # high: file count from salt only
    )
    # 'O' and 'F' are the hot statuses; they must be written as >1 file
    hot = [d for d in os.listdir(out) if d in ("o_orderstatus=O", "o_orderstatus=F")]
    assert hot
    for d in hot:
        n_files = sum(
            1 for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        )
        assert n_files > 1, f"{d} written as a single file despite salting"
    # roundtrip: same rows, no salt column leaked
    back = spark.read.parquet(out)
    assert set(back.columns) == set(orders.columns)
    assert back.count() == orders.count()


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_csv")
    nation = load(spark, sf_dir, "nation")
    write_csv(nation, out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_timeseries_csv_source_roundtrip(spark, sf_dir, tmp_path):
    """Reference R1/R2 surface: CSV out -> read_timeseries_csv back
    with explicit double schema + column selection; values exact."""
    from flink_rc_spark.sources.tables import read_timeseries_csv

    out = str(tmp_path / "series_csv")
    series = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_id").cast("double").alias("idx"),
            F.col("value").alias("value"),
        )
    )
    write_csv(series, out)
    back = read_timeseries_csv(spark, out, ["idx", "value"])
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "double",
        "double",
    ]
    a = series.orderBy("idx").toPandas()
    b = back.orderBy("idx").toPandas()
    assert a.equals(b)


def test_jsonl_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    """JSONL interchange: write events, read back with the EXPLICIT
    schema (no inference), and get identical rows — including the
    timestamp column (ISO round-trip under the session timezone)."""
    from flink_rc_spark.sources.sinks import write_jsonl
    from flink_rc_spark.sources.tables import read_jsonl

    out = str(tmp_path / "events_jsonl")
    events = load(spark, sf_dir, "events")
    write_jsonl(events, out)
    back = read_jsonl(spark, out, events.schema)
    assert back.schema == events.schema
    assert back.count() == events.count()
    a = events.orderBy("event_id").toPandas()
    b = back.orderBy("event_id").toPandas()
    assert a.equals(b)


def test_text_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "names_txt")
    nation = load(spark, sf_dir, "nation").select(F.col("n_name").alias("value"))
    write_text(nation, out)
    back = spark.read.text(out)
    assert back.count() == nation.count()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from flink_rc_spark.sources.sinks import write_orc

    out = str(tmp_path / "orders_orc")
    orders = load(spark, sf_dir, "orders")
    write_orc(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.orc(out)
    assert back.count() == orders.count()
    # exact value fidelity on a sample column set
    a = {tuple(r) for r in orders.select("o_orderkey", "o_totalprice").collect()}
    b = {tuple(r) for r in back.select("o_orderkey", "o_totalprice").collect()}
    assert a == b
    # partition pruning works on the ORC layout too
    plan = formatted_plan(back.filter(F.col("o_orderstatus") == "F"))
    assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_avro_sink_reports_missing_datasource(spark, sf_dir, tmp_path):
    """The container has no spark-avro datasource; the sink must fail
    with the actionable message (or succeed if a deployment adds the
    package — both are acceptable outcomes of this contract)."""
    import pytest as _pytest

    from flink_rc_spark.sources.sinks import write_avro

    out = str(tmp_path / "orders_avro")
    orders = load(spark, sf_dir, "orders").limit(10)
    try:
        write_avro(orders, out)
    except RuntimeError as e:
        assert "spark-avro" in str(e)
    else:  # pragma: no cover - only on avro-equipped clusters
        assert spark.read.format("avro").load(out).count() == 10


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Spark 4 ships the (formerly spark-xml) XML datasource built in:
    write nation as XML rows, read back with the same rowTag, and
    compare exact values — source-breadth proof alongside
    parquet/CSV/JSONL/ORC/text (XML has no DuckDB oracle, so this is
    non-query surface like the ORC sink)."""
    from flink_rc_spark.sources.tables import load

    nation = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_xml")
    (
        nation.write.format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .mode("overwrite")
        .save(path)
    )
    back = spark.read.format("xml").option("rowTag", "nation").load(path)
    a = {tuple(r) for r in nation.collect()}
    b = {
        tuple(r)
        for r in back.select("n_nationkey", "n_name", "n_regionkey").collect()
    }
    assert a == b


def test_pyds_mackeyglass_matches_fixture_bit_exact(spark):
    """The custom Python DataSource's sid=0 series must equal
    rc/fixtures.mackey_glass BIT-FOR-BIT (same Euler recurrence, same
    x0) — the datasource is a parallel connector over the RC fixture
    spec, not a reimplementation drift risk. Also pins the partition
    layout: one input partition per series (the parallelism claim)."""
    import numpy as np

    from flink_rc_spark.rc.fixtures import mackey_glass
    from flink_rc_spark.sources.pyds import register_mackeyglass

    register_mackeyglass(spark)
    df = (
        spark.read.format("mackeyglass")
        .option("n_series", 3)
        .option("n", 256)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    got = np.array(
        [
            r.value
            for r in df.filter("series_id = 0").orderBy("seq").collect()
        ]
    )
    want = mackey_glass(n=256)
    assert got.shape == want.shape
    assert np.array_equal(got, want)  # bit-exact, no tolerance

    # distinct initial conditions => distinct series per sid
    s1 = df.filter("series_id = 1 and seq = 0").first().value
    assert s1 != want[0]

"""Streaming source + sink plumbing.

``events_stream`` replays the events parquet file through Structured
Streaming's file source — the same schema the batch loader exposes
(ns→µs truncated TimestampType), so every streaming query's oracle is
simply the equivalent batch SQL over the bounded table (stream/batch
unification is Spark's model).

``run_to_memory`` drives a bounded replay to completion synchronously
(memory sink + processAllAvailable) and returns the results as a
batch DataFrame — this is how declared streaming queries satisfy the
driver contract's ``(spark, sf_dir) -> DataFrame`` shape.

100 TB story: the file source is swapped for Kafka/queue by changing
``readStream.format`` only; windows/watermarks/state operators are
source-agnostic. Memory sink is test-only — production sinks are
``writeStream.format("parquet")`` / foreachBatch.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (legacy nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


_STREAM_DIRS: dict[str, str] = {}


def _stream_dir(sf_dir: str) -> str:
    """The file stream source requires a *directory*; expose the single
    events.parquet file through a cached temp dir of symlinks."""
    sf_dir = sf_dir.rstrip("/")
    if sf_dir not in _STREAM_DIRS:
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="flink_rc_spark_events_")
        os.symlink(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        _STREAM_DIRS[sf_dir] = d
    return _STREAM_DIRS[sf_dir]


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(_stream_dir(sf_dir))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def run_to_memory(
    stream_df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Execute a bounded streaming query to completion; return results."""
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    # materialize before the in-memory sink table goes away
    out = spark.table(name).cache()
    out.count()
    return out

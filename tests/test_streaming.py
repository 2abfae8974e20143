"""Streaming-specific semantics checks beyond the oracle parity
(which tests/test_correctness.py already runs for the q_stream_*
keys with oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import REGISTRY, load_all
from flink_rc_spark.sources import load

load_all()


def test_watermark_late_is_strict_subset_of_batch(spark, sf_dir):
    """Append-mode watermarked windows must emit a subset of the batch
    result, and must withhold at least the final window."""
    streamed = REGISTRY["q_stream_watermark_late"].builder(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    extra = streamed.exceptAll(batch)
    assert extra.count() == 0, "stream emitted rows not in batch result"
    assert streamed.count() < batch.count(), "watermark withheld nothing"


def test_stateful_counter_state_survives_batches(spark, sf_dir):
    """The counter must give identical results however the replay is
    split into micro-batches (state carries across batches)."""
    one_batch = REGISTRY["q_stream_stateful_counter"].builder(spark, sf_dir)
    spark.conf.set("spark.sql.streaming.fileSource.maxFilesPerTrigger", "1")
    try:
        again = REGISTRY["q_stream_stateful_counter"].builder(spark, sf_dir)
    finally:
        spark.conf.unset("spark.sql.streaming.fileSource.maxFilesPerTrigger")
    a = one_batch.orderBy("user_id", "event_id").toPandas()
    b = again.orderBy("user_id", "event_id").toPandas()
    assert a.equals(b)

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

import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_parquet_files(sf_dir: str) -> list[str]:
    """``events.parquet`` may be a single file (the shipped testdata)
    or a Spark-written DIRECTORY of part files (e.g. the sf1 set from
    tools/make_sf1.py) — return the concrete file list either way."""
    import os

    path = f"{sf_dir.rstrip('/')}/events.parquet"
    if os.path.isdir(path):
        return sorted(
            f"{path}/{f}" for f in os.listdir(path) if f.endswith(".parquet")
        )
    return [path]


def _events_ts_is_nanos(sf_dir: str) -> bool:
    """Probe the parquet footer (driver-side metadata only) for the
    physical type of ``events.ts``. The test data has shipped as either
    TIMESTAMP(NANOS) (Spark needs legacy nanosAsLong + µs truncation)
    or TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_schema(_events_parquet_files(sf_dir)[0]).field("ts").type
    return pa.types.is_timestamp(t) and t.unit == "ns"


def events_raw_schema(ts_is_nanos: bool) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # raw nanos (legacy nanosAsLong) or native µs TIMESTAMP_NTZ
            T.StructField(
                "ts", T.LongType() if ts_is_nanos else T.TimestampNTZType()
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _stream_dir(sf_dir: str, n_splits: int = 1) -> str:
    """The file stream source requires a *directory*.

    n_splits=1: expose the single events.parquet through a cached temp
    dir of symlinks (zero copy).

    n_splits>1: split the events into `n_splits` event-time-ordered
    parquet files (pyarrow, schema-preserving — ts stays INT64 nanos)
    with strictly increasing mtimes, so that under
    ``maxFilesPerTrigger=1`` the replay becomes a REAL incremental
    stream: event time advances across micro-batches, watermarks move,
    and stateful operators must carry state batch-to-batch. This is the
    local stand-in for a Kafka topic's arrival order.
    """
    import os

    from flink_rc_spark.util import cached_fixture_dir

    sf_dir = sf_dir.rstrip("/")

    def build(d: str) -> None:
        files = _events_parquet_files(sf_dir)
        if n_splits <= 1:
            # single-file AND directory-shaped events tables both
            # become one symlink per concrete part file (zero copy)
            for i, f in enumerate(files):
                os.symlink(f, f"{d}/events-{i:04d}.parquet")
        else:
            import pyarrow.parquet as pq

            tbl = pq.read_table(files if len(files) > 1 else files[0])
            tbl = tbl.sort_by([("ts", "ascending"), ("event_id", "ascending")])
            n = tbl.num_rows
            step = (n + n_splits - 1) // n_splits
            base = 1_700_000_000  # fixed epoch base; only ordering matters
            for i in range(n_splits):
                chunk = tbl.slice(i * step, step)
                if chunk.num_rows == 0:
                    break
                path = f"{d}/part-{i:04d}.parquet"
                pq.write_table(chunk, path)
                os.utime(path, (base + i, base + i))

    return cached_fixture_dir("events_stream", f"{sf_dir}::{n_splits}", build)


# Input volume of the most recent events_stream() call ON THIS THREAD,
# read (and consumed) by run_to_memory's auto state-partition sizing.
# THREAD-LOCAL + consume-once (r9 advice: the old module global was
# last-writer-wins — concurrent builders, or a run_to_memory with no
# preceding events_stream on the same thread, silently sized state
# partitions from another query's volume). Builders call the two
# back-to-back on one thread, which is the only flow that reads a
# recorded value; any other flow falls back to the documented default.
_REPLAY_TL = threading.local()


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    n_splits: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events as a stream. With n_splits>1 the replay defaults
    to one file per trigger (``maxFilesPerTrigger`` is a file-source
    OPTION, not a SQL conf), i.e. n_splits real micro-batches."""
    import os

    try:
        _REPLAY_TL.bytes = sum(
            os.path.getsize(f) for f in _events_parquet_files(sf_dir)
        )
    except OSError:  # pragma: no cover - defensive
        _REPLAY_TL.bytes = None
    ts_is_nanos = _events_ts_is_nanos(sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(events_raw_schema(ts_is_nanos))
    if max_files_per_trigger is None and n_splits > 1:
        max_files_per_trigger = 1
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(_stream_dir(sf_dir, n_splits))
    if ts_is_nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # native µs NTZ → session-TZ (UTC) TimestampType, matching the
    # nanos path's output type so every downstream consumer is unchanged
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "append",
    stats: dict | None = None,
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Execute a bounded streaming query to completion; return results.

    If ``stats`` is passed, records {"num_batches": <micro-batches that
    consumed input rows>} so tests can assert the replay really was
    incremental (state carry-over is only proven when num_batches > 1).

    ``state_partitions``: streaming state operators shuffle on
    ``spark.sql.shuffle.partitions`` with NO AQE coalescing, so a
    session tuned for batch (32-200 partitions) pays 32-200 state-store
    tasks per micro-batch regardless of volume — measured 9.6 s -> 2.8 s
    on the sf0.1 stream-stream join by sizing partitions to the replay.
    The conf is set for the query's planning and restored afterwards
    (harness queries run sequentially). At 100 TB the same knob goes UP
    with key cardinality — the point is sizing it to the data, which
    batch AQE does automatically and streaming does not.

    ``"auto"`` (the default) sizes the knob to the replay's INPUT
    VOLUME recorded by the preceding ``events_stream`` call on the
    SAME THREAD (thread-local, consumed on read — a stream built on
    another thread, or a second run with no fresh ``events_stream``,
    gets the default instead of a stale volume): the r9 split
    probe (tools/streaming_split_probe.py, BASELINE.md) measured the
    NULL-kernel state-API overhead at sf1 dropping 6.1 s -> 2.9 s
    when partitions went 8 -> 32 while sf0.1 was flat — the fixed
    8 that was right for sf0.1 is the bottleneck at 10x. One state
    partition per ~512 KB of compressed input, clamped to [8, 32]
    locally (the cap is the local core count; on a real cluster it
    scales with executor cores).
    """
    spark = stream_df.sparkSession
    if isinstance(state_partitions, str) and state_partitions != "auto":
        # fail at the call site, not batches later inside conf.set
        # (r9 advice: a typo like 'Auto' used to flow into
        # spark.sql.shuffle.partitions as a literal string)
        raise ValueError(
            "state_partitions must be an int, None, or 'auto';"
            f" got {state_partitions!r}"
        )
    if state_partitions == "auto":
        # consume-once, thread-local: only a same-thread, not-yet-used
        # events_stream volume sizes the knob — anything else gets the
        # documented default
        replay_bytes = getattr(_REPLAY_TL, "bytes", None)
        _REPLAY_TL.bytes = None
        if replay_bytes is not None:
            state_partitions = max(8, min(32, replay_bytes // (512 * 1024)))
        else:
            state_partitions = 8
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    prev_parts = None
    if state_partitions is not None:
        # restored only after the bounded replay completes: batch
        # planning reads the conf lazily, so restoring right after the
        # async start() would race batch 0
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    q = None
    try:
        # start() lives INSIDE the try: if analysis fails, the finally
        # still restores shuffle.partitions for subsequent batch queries.
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        if stats is not None:
            import json

            # recentProgress retains only the last
            # spark.sql.streaming.numRecentProgressUpdates entries
            # (default 100) — longer replays would undercount, so flag
            # saturation instead of reporting a silently-low number.
            progress = [
                json.loads(p.json) if hasattr(p, "json") else p
                for p in q.recentProgress
            ]
            stats["num_batches"] = sum(
                1 for p in progress if p["numInputRows"] > 0
            )
            stats["progress_window_saturated"] = len(progress) >= 100
            stats["rows_dropped_by_watermark"] = sum(
                so.get("numRowsDroppedByWatermark", 0)
                for p in progress
                for so in p.get("stateOperators", [])
            )
    finally:
        if q is not None:
            q.stop()
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # The memory sink's rows are driver-held and the registered table
    # SURVIVES q.stop(), later queries, and catalog.clearCache()
    # (probed r13: tools/streaming_fixed_cost_probe.py session) — the
    # former defensive `cache() + count()` tail only copied the rows
    # into block-manager storage and paid one extra job per key,
    # ~0.2-0.3 s x 21 streaming keys of pure overhead.
    return spark.table(name)

"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic Mackey-Glass series generator, registered as
``spark.read.format("mackeyglass")``.

Why this exists: the reference consumes Mackey-Glass series from CSV
files (reference R1); a Spark-first engine can instead expose the
generator AS A SOURCE — Spark 4's Python DataSource API gives it real
``partitions()`` so every series is synthesized on an executor, in
parallel, with no driver materialization and no files. This is the
"custom connector" item of the sources surface, sitting beside the
CSV/JSONL/ORC/XML connectors in sinks.py.

Scale shape: one InputPartition per series ⇒ generation parallelism =
series count, each partition O(series length) memory; options flow
through the standard reader-options channel. The generator is
self-contained (numpy only — no package-shipping dependency for the
executors).

Determinism: Euler recurrence with pinned x₀ = 1.2 + sid/1000 and
fixed dt — pure IEEE double arithmetic, so the same (sid, seq) always
yields the bit-identical value on any executor; the equality test
against rc/fixtures.mackey_glass pins the sid=0 series to the RC
module's fixture generator.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class MGPartition(InputPartition):
    def __init__(self, sid: int):
        self.sid = sid


class MackeyGlassReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_series = int(options.get("n_series", 8))
        self.n = int(options.get("n", 2000))
        self.tau = int(options.get("tau", 17))
        self.warmup = int(options.get("warmup", 1000))

    def partitions(self):
        return [MGPartition(i) for i in range(self.n_series)]

    def read(self, partition: MGPartition):
        import numpy as np

        sid, n, tau, warmup = partition.sid, self.n, self.tau, self.warmup
        total = n + warmup
        x = np.empty(total + tau)
        # per-series deterministic initial condition; sid=0 is exactly
        # rc/fixtures.mackey_glass (equality-tested)
        x[: tau + 1] = 1.2 + sid / 1000.0
        for t in range(tau, total + tau - 1):
            x_tau = x[t - tau]
            x[t + 1] = x[t] + 0.2 * x_tau / (1.0 + x_tau**10) - 0.1 * x[t]
        series = x[tau + warmup :]
        for seq, v in enumerate(series):
            yield (sid, seq, float(v))


class MackeyGlassDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mackeyglass"

    def schema(self) -> str:
        return "series_id bigint, seq bigint, value double"

    def reader(self, schema) -> MackeyGlassReader:
        return MackeyGlassReader(self.options)


_REGISTERED: set[str] = set()


def register_mackeyglass(spark) -> None:
    """Idempotent format registration, memoized per application.

    The first ``spark.dataSource.register`` in a session costs ~1.5 s
    (py4j + pickling the class into the JVM-side Python data source
    manager) and the first ``.load()`` another ~1.7 s (the JVM spawns
    a Python planning runner to call ``schema()``/``partitions()``).
    Both are one-time per-session API costs, independent of data
    volume — memoizing the registration keeps repeat builder calls at
    the ~0.5 s steady state (the r9 bench sweep recorded 3.66 s for a
    fixed 6x512-row frame purely because the key's single in-sweep
    call was also the session's first use of the API)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _REGISTERED:
        return
    spark.dataSource.register(MackeyGlassDataSource)
    _REGISTERED.add(app_id)


# ---------------------------------------------------------------------------
# q_pyds_source — declared key exercising the custom source end-to-end
# ---------------------------------------------------------------------------


def _register_query() -> None:
    from pyspark.sql import functions as F

    from flink_rc_spark.registry import register

    @register(
        "q_pyds_source",
        oracle=None,  # the MG recurrence is sequential — not SQL-expressible;
        # rows-only for the driver, with a bit-exact local equality test
        # against rc/fixtures.mackey_glass (tests/test_sinks.py)
        tags=("source", "rc"),
    )
    def q_pyds_source(spark, sf_dir):
        """Read 6 Mackey-Glass series through the custom Python
        DataSource (one executor-side partition per series) and roll
        up per-series fingerprints: row count, seq span, the seq-0
        value, and the order-independent decimal-quantized value sum.
        Rows-only by necessity (a chaotic delay recurrence has no SQL
        spelling); the quantitative check is the sid=0 bit-equality
        against the RC fixture generator plus the partition-count
        assertion — see tests."""
        from flink_rc_spark.util import ensure_package_shipped

        ensure_package_shipped(spark)  # workers unpickle the DataSource class
        register_mackeyglass(spark)
        df = (
            spark.read.format("mackeyglass")
            .option("n_series", 6)
            .option("n", 512)
            .load()
        )
        return (
            df.groupBy("series_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("seq").alias("seq_min"),
                F.max("seq").alias("seq_max"),
                F.round(
                    F.max(F.when(F.col("seq") == 0, F.col("value"))), 6
                ).alias("first_value"),
                F.sum(F.round(F.col("value"), 6).cast("decimal(14,6)"))
                .cast("double")
                .alias("value_sum_q"),
            )
            .orderBy("series_id")
        )


_register_query()

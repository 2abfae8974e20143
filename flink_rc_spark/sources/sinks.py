"""Sinks (reference parity: SURVEY.md §2.1 R12 — print / writeAsText /
writeAsCsv; plotting excluded as out-of-engine-scope).

The Spark-first sink surface is `df.write` with a layout policy that
matters at 100 TB:

- **Directory partitioning** (`partitionBy`) turns future reads into
  partition-pruned scans — the write-side half of the §4.2 pruning
  story. Choose low-cardinality columns (date buckets, region), never
  high-cardinality keys (one directory per key kills the namenode /
  object-store listing).
- **File sizing** (`maxRecordsPerFile` + a pre-write repartition on
  the partition columns) bounds both small-file explosion (too many
  tasks x partitions) and giant-file skew. Target ~128 MB-1 GB files.
- **In-file clustering** (`sortWithinPartitions`) gives parquet
  row-group min/max statistics real selectivity, so predicate
  pushdown skips row groups, not just directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Partitioned, size-bounded, optionally clustered parquet sink.

    The pre-write `repartition(partition_by)` co-locates each output
    directory's rows into one task (one file per directory per task
    instead of tasks x directories small files); `sortWithinPartitions`
    then clusters rows so parquet row-group stats are selective.

    SKEW CAVEAT: hash-partitioning by the partition columns funnels
    each partition VALUE into a single task — for a skewed
    low-cardinality column that one task becomes the straggler and
    writes one giant file. Set `files_per_partition > 1` to add a salt
    to the pre-write repartition: each hot directory is then written by
    up to that many parallel tasks/files (maxRecordsPerFile still
    bounds each). Directory layout and read-side pruning are
    unaffected — only the file count per directory changes.
    """
    import uuid

    from pyspark.sql import functions as F

    out = df
    if partition_by:
        if files_per_partition > 1:
            # round-robin salt (monotonic id is distinct per row even in
            # a single input partition); the EXPLICIT shuffle partition
            # count keeps AQE from coalescing the salted split back into
            # one task at small volumes
            salt = f"_salt_{uuid.uuid4().hex[:6]}"
            out = (
                out.withColumn(
                    salt,
                    F.pmod(
                        F.monotonically_increasing_id(), F.lit(files_per_partition)
                    ),
                )
                .repartition(files_per_partition * 32, *partition_by, salt)
                .drop(salt)
            )
        else:
            out = out.repartition(*partition_by)
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    sep: str = ",",
    mode: str = "overwrite",
) -> None:
    """CSV sink (reference writeAsCsv). For interchange only — parquet
    is the at-scale format (columnar, compressed, statistics)."""
    df.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink (reference writeAsText): single string column per row."""
    df.write.mode(mode).text(path)


TIMESTAMP_JSON_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of most LLM-data
    tooling. For interchange only: ~5-10x the bytes of parquet, no
    column pruning, no predicate pushdown; convert to parquet at the
    lake boundary. Timestamps use a microsecond ISO format — Spark's
    default JSON format truncates to milliseconds, silently corrupting
    a µs-precision roundtrip."""
    df.write.mode(mode).option("timestampFormat", TIMESTAMP_JSON_FMT).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (built into Spark's distribution). Same columnar /
    statistics / pushdown properties as parquet — useful when the
    surrounding lake (Hive-era warehouses, some Trino deployments) is
    ORC-native. Directory-partitioning semantics identical to
    ``write_parquet``'s."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink — requires the ``spark-avro`` datasource package,
    which is NOT bundled in Spark's default distribution (this
    container ships only the core avro jars Spark uses internally).
    Fails with a clear message instead of Spark's opaque
    ClassNotFoundException; a real deployment adds
    ``org.apache.spark:spark-avro_2.13`` to ``spark.jars.packages``."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        if "avro" in str(e).lower() or "data source" in str(e).lower():
            raise RuntimeError(
                "Avro datasource not on the classpath: add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
            ) from e
        raise


def write_bucketed_table(
    df: DataFrame,
    name: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink — the write-side half of the
    zero-shuffle join story (tests/test_bucketing.py proves the read
    side: two tables bucketed on the same key join with NO Exchange in
    the plan).

    At 100 TB: bucket the fact tables on their join key once at ingest
    and every subsequent equi-join / groupBy on that key skips its
    shuffle. Pick n_buckets so each bucket file lands ~128 MB-1 GB;
    sort_cols adds in-bucket clustering so parquet row-group stats
    prune within buckets. Bucketing requires saveAsTable (metastore
    bucketing metadata) — plain .parquet(path) cannot record it.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode(mode).format("parquet").saveAsTable(name)

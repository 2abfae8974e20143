"""Table sources.

The engine's batch inputs are the driver-generated parquet tables
(TESTDATA.md / FIXTURES.md): a TPC-H-ish star schema plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings``
(vector table). Parquet is self-describing, so loads take the file
schema as authoritative and *validate* it against the expected
StructType (catching silent drift) instead of forcing a cast.

Scale notes (100 TB): parquet scans here are the pushdown surface —
Catalyst prunes columns and pushes predicates into the scan
(verified by q_scan_pruned's plan test). On a real lake these tables
would be directory-partitioned (e.g. orders by month); partition
pruning then composes with the same code because loads go through
``spark.read.parquet`` on a path.

Reference parity: the reference's only source is a CSV time-series
reader with column selection (SURVEY.md §2.1 R1, expected at
higher_level_examples/HigherLevelExampleAbstract.java [K:high,
unverified — reference mount empty]); ``read_timeseries_csv`` covers
that surface with an explicit schema (never inferSchema in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_S = T.StructType
_F = T.StructField

EXPECTED_SCHEMAS: dict[str, T.StructType] = {
    "region": _S([_F("r_regionkey", T.IntegerType()), _F("r_name", T.StringType())]),
    "nation": _S(
        [
            _F("n_nationkey", T.IntegerType()),
            _F("n_name", T.StringType()),
            _F("n_regionkey", T.IntegerType()),
        ]
    ),
    "supplier": _S(
        [
            _F("s_suppkey", T.LongType()),
            _F("s_name", T.StringType()),
            _F("s_nationkey", T.IntegerType()),
            _F("s_acctbal", T.DoubleType()),
        ]
    ),
    "customer": _S(
        [
            _F("c_custkey", T.LongType()),
            _F("c_name", T.StringType()),
            _F("c_nationkey", T.IntegerType()),
            _F("c_acctbal", T.DoubleType()),
            _F("c_mktsegment", T.StringType()),
        ]
    ),
    "part": _S(
        [
            _F("p_partkey", T.LongType()),
            _F("p_name", T.StringType()),
            _F("p_brand", T.StringType()),
            _F("p_type", T.StringType()),
            _F("p_size", T.IntegerType()),
            _F("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": _S(
        [
            _F("o_orderkey", T.LongType()),
            _F("o_custkey", T.LongType()),
            _F("o_orderstatus", T.StringType()),
            _F("o_totalprice", T.DoubleType()),
            _F("o_orderdate", T.TimestampType()),
            _F("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": _S(
        [
            _F("l_orderkey", T.LongType()),
            _F("l_partkey", T.LongType()),
            _F("l_suppkey", T.LongType()),
            _F("l_linenumber", T.IntegerType()),
            _F("l_quantity", T.DoubleType()),
            _F("l_extendedprice", T.DoubleType()),
            _F("l_discount", T.DoubleType()),
            _F("l_tax", T.DoubleType()),
            _F("l_returnflag", T.StringType()),
            _F("l_linestatus", T.StringType()),
            _F("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": _S(
        [
            _F("event_id", T.LongType()),
            _F("ts", T.TimestampType()),  # parquet timestamp[ns] → Spark µs
            _F("user_id", T.LongType()),
            _F("event_type", T.StringType()),
            _F("value", T.DoubleType()),
            _F("props", T.StringType()),  # JSON string like {"k": 87}
        ]
    ),
    "documents": _S(
        [
            _F("doc_id", T.LongType()),
            _F("text", T.StringType()),
            _F("lang", T.StringType()),
            _F("source", T.StringType()),
            _F("n_chars", T.LongType()),
        ]
    ),
    "embeddings": _S(
        [
            _F("vec_id", T.LongType()),
            _F("embedding", T.ArrayType(T.FloatType())),  # len 64
            _F("label", T.IntegerType()),
        ]
    ),
}


def expected_schema(name: str) -> T.StructType:
    return EXPECTED_SCHEMAS[name]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; parquet schema is authoritative.

    ``events.ts`` has shipped as either parquet TIMESTAMP(MICROS)
    (read natively) or TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects ([PARQUET_TYPE_ILLEGAL]); the nanos form is read as
    raw long nanos (legacy nanosAsLong) and truncated to a µs
    TimestampType — the same truncation DuckDB applies casting
    TIMESTAMP_NS → TIMESTAMP, so oracle comparisons agree either way.
    The fix-up is keyed on the dtype Spark actually read, so the loader
    works against both generations of the test data. The scan stays
    distributed and columnar (no driver-side materialization).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:
            # native µs NTZ → session-TZ (UTC) TimestampType, matching
            # the nanos path's output type downstream
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def load_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all tables as temp views (for spark.sql-built queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(prefix + t)


def read_timeseries_csv(
    spark: SparkSession,
    path: str,
    value_cols: list[str],
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV time-series source with column selection (reference R1+R2).

    The reference reads a CSV, selects columns by bitmask, and parses
    doubles; here the schema is explicit (all selected columns double)
    and selection is by name — Catalyst prunes unselected columns at
    the scan.
    """
    schema = T.StructType([_F(c, T.DoubleType()) for c in value_cols])
    df = spark.read.csv(path, header=header, sep=sep, schema=schema)
    return df.select(*[F.col(c) for c in value_cols])


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema — never inferSchema:
    inference costs a full extra pass over the data and silently
    widens/retypes columns between runs. JSONL is the interchange
    format of most LLM-data tooling (one doc per line); at 100 TB it
    is the ingest edge only — convert to parquet immediately (json has
    no pruning/pushdown and splits poorly when compressed)."""
    from flink_rc_spark.sources.sinks import TIMESTAMP_JSON_FMT

    return (
        spark.read.schema(schema)
        .option("timestampFormat", TIMESTAMP_JSON_FMT)
        .json(path)
    )

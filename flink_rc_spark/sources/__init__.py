from flink_rc_spark.sources.tables import (  # noqa: F401
    TABLES,
    expected_schema,
    load,
    load_all_tables,
    register_views,
    read_timeseries_csv,
)

# query-registering modules (imported for their side effect)
import flink_rc_spark.operators.scans  # noqa: F401
import flink_rc_spark.operators.filters  # noqa: F401
import flink_rc_spark.operators.joins  # noqa: F401
import flink_rc_spark.operators.aggregates  # noqa: F401
import flink_rc_spark.operators.windows  # noqa: F401
import flink_rc_spark.operators.sorts  # noqa: F401
import flink_rc_spark.operators.setops  # noqa: F401
import flink_rc_spark.operators.subqueries  # noqa: F401
import flink_rc_spark.operators.timeseries  # noqa: F401
import flink_rc_spark.operators.tpch  # noqa: F401
import flink_rc_spark.operators.analytics  # noqa: F401
import flink_rc_spark.operators.geo  # noqa: F401
import flink_rc_spark.operators.graph  # noqa: F401
import flink_rc_spark.operators.stattests  # noqa: F401
import flink_rc_spark.operators.sqlsurface  # noqa: F401
import flink_rc_spark.operators.inference  # noqa: F401
import flink_rc_spark.operators.mlprims  # noqa: F401

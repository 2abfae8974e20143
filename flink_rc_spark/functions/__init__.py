from flink_rc_spark.functions.exact import dec, dsum, davg  # noqa: F401

# query-registering modules (imported for their side effect)
import flink_rc_spark.functions.scalars  # noqa: F401, E402
import flink_rc_spark.functions.sketches  # noqa: F401, E402

from flink_rc_spark.streaming.replay import events_stream, run_to_memory  # noqa: F401

# query-registering modules (imported for their side effect)
import flink_rc_spark.streaming.windows  # noqa: F401, E402
import flink_rc_spark.streaming.stateful  # noqa: F401, E402

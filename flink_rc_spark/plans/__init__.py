from flink_rc_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    assert_pushed_filters,
    assert_pruned_columns,
    assert_broadcast_join,
    assert_no_cartesian,
    codegen_stage_count,
    global_window_violations,
    checkpoint,
    PRE_CHECKPOINT_VIOLATIONS,
)

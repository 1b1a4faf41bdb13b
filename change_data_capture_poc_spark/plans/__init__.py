from change_data_capture_poc_spark.plans.inspect import (  # noqa: F401
    broadcast_count,
    formatted_plan,
    plan_ops,
    pushed_filters,
    read_schemas,
    shuffle_count,
    unpartitioned_window_count,
    window_count,
)

from change_data_capture_poc_spark.streaming.ingest import (  # noqa: F401
    stream_envelope_log,
    stream_to_partitioned_json,
)
from change_data_capture_poc_spark.streaming.scd2_stream import (  # noqa: F401
    IncrementalScd2,
    run_incremental_scd2,
)
from change_data_capture_poc_spark.streaming.sessions import (  # noqa: F401
    session_window_agg,
)
from change_data_capture_poc_spark.streaming.dedup import (  # noqa: F401
    dedup_stream,
)
from change_data_capture_poc_spark.streaming.joins import (  # noqa: F401
    interval_join_streams,
)

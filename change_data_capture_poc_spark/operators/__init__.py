from change_data_capture_poc_spark.operators.asof import asof_join  # noqa: F401
from change_data_capture_poc_spark.operators.rank import (  # noqa: F401
    with_global_row_number,
)
from change_data_capture_poc_spark.operators.sessionize import sessionize  # noqa: F401
from change_data_capture_poc_spark.operators.simhash import (  # noqa: F401
    simhash64,
    hamming64,
)
from change_data_capture_poc_spark.operators.multimodal import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_media_batch,
)

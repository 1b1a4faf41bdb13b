from change_data_capture_poc_spark.cdc.envelope import (  # noqa: F401
    envelope_schema,
    PRODUCT_FIELDS,
    USER_FIELDS,
    OP_LABELS,
    decode_envelope,
    parse_envelope_json,
)
from change_data_capture_poc_spark.cdc.generator import CdcGenerator  # noqa: F401
from change_data_capture_poc_spark.cdc.scd2 import (  # noqa: F401
    scd2_recompute,
    scd2_merge_batch,
    SCD2_SENTINEL,
    MERGE_SENTINEL,
)

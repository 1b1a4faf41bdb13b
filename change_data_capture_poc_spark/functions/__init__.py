"""Reusable scalar/array expression library.

Column-expression builders shared by the query surface and usable by
engine consumers directly. Everything here is built-in-function
composition (JVM-side, whole-stage-codegen'd) — no UDFs.
"""

from change_data_capture_poc_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    safe_l2_norm,
    unit_normalize,
)
from change_data_capture_poc_spark.functions.text import (  # noqa: F401
    ngram_shingles,
    tokenize_regex,
    tokenize_ws,
    with_token_column,
)

"""Vector math over ``array<double>`` columns — the similarity-search
primitives (north-star ANN / embedding dedup).

Sequential-order folds: ``F.aggregate`` accumulates left-to-right, so
double-precision results are bit-compatible with DuckDB's
``list_dot_product`` path — required for oracle-exact comparisons
after rounding.

At scale these stay inside whole-stage codegen; for very high
dimensions a vectorized Pandas-UDF matmul over Arrow batches wins —
see ``queries/datapipe.py`` for where each is used.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))

"""As-of (backward) join — an operator Spark lacks natively.

Implemented as a union + keyed window (`last_value ... ignore nulls`)
rather than a range cross-join: both inputs are tagged and unioned,
sorted per key by (event time, side), and each left row picks up the
most recent right-side value at or before its timestamp. One shuffle on
the key, no join fan-out — the formulation that survives 100 TB
(a naive `left.ts >= right.ts` theta join is quadratic per key).

Tie rule: a right row at exactly the left row's timestamp IS visible
(backward as-of with >=), matching DuckDB's ``ASOF JOIN ... ON l.ts >=
r.ts`` semantics used by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (nulls if none).

    ``right_values`` are the right-side columns to carry. Left columns
    are preserved as-is.

    All carried columns come from the SAME matched right row: the right
    side travels as ONE nullable struct and ``last(ignorenulls)`` runs
    over that struct, so a NULL field inside the latest matching right
    row stays NULL in the output. (Per-column fills would tear values
    across different right rows and backfill legitimate NULLs —
    diverging from DuckDB ASOF JOIN row semantics.)
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*right_values).alias("__r"),
    )
    tagged_l = tagged_l.withColumn(
        "__r", F.lit(None).cast(tagged_r.schema["__r"].dataType)
    )
    tagged_r = tagged_r.withColumn(
        "__l", F.lit(None).cast(tagged_l.schema["__l"].dataType)
    )
    # Right rows sort before left rows at equal timestamps so an
    # exactly-simultaneous right value is visible (>= semantics).
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_l.unionByName(tagged_r)
    filled = unioned.select(
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__rv"),
    )
    return filled.where(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rv.{c}").alias(c) for c in right_values],
    )

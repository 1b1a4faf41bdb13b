"""Sessionization: split each key's event stream into sessions wherever
the inter-event gap exceeds a threshold.

Classic two-window formulation (lag → gap marker → running sum), one
shuffle on the key. In Structured Streaming the same semantics come
from ``session_window(ts, gap)``; this batch operator matches it on
static data and has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Adds a ``session_id`` column (1-based per key).

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_seconds``. ``order_tiebreak`` disambiguates equal
    timestamps (use a unique column for determinism).
    """
    order_cols = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    gap = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wsum))

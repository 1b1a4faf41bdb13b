"""Sessionization: split each key's event stream into sessions wherever
the inter-event gap exceeds a threshold.

Classic two-window formulation (lag → gap marker → running sum), one
shuffle on the key. In Structured Streaming the same semantics come
from ``session_window(ts, gap)``; this batch operator matches it on
static data and has an exact SQL oracle. Match is exact INCLUDING the
boundary (verified empirically on Spark 4.1): an event arriving
EXACTLY ``gap`` after its predecessor stays in the SAME session —
session_window merges touching intervals — so the split condition is
strictly ``gap_us > gap_seconds * 1e6``, compared at microsecond
precision (a ``cast('long')`` would truncate sub-second gaps and merge
e.g. a 1800.5 s gap that session_window splits at gap=1800).
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
    key strictly exceeds ``gap_seconds`` (an exactly-``gap`` event
    merges, matching session_window). ``order_tiebreak`` disambiguates
    equal timestamps (use a unique column for determinism).
    """
    order_cols = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    # cast('timestamp') keeps TIMESTAMP_NTZ inputs working under the
    # pinned-UTC session (same hazard rangejoin.py documents).
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wsum))

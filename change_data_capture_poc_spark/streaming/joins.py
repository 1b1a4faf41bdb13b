"""Stream-stream interval join — correlate two live feeds by key
within an event-time window (e.g. CDC order images with their
click/telemetry events).

Structured Streaming's stream-stream equi-join buffers both sides in
state; the INTERVAL condition plus watermarks is what makes that state
bounded: once the watermark passes ``ts + upper``, a buffered row can
never match again and is evicted. Without the time bounds Spark must
keep every row forever (and rejects outer joins outright) — the
interval is not an optimization, it is the contract that lets the join
run indefinitely.

One shuffle per side on the join key; state is key-partitioned like
every stateful operator. Inner joins emit as matches arrive; left-outer
emits NULL-padded rows only when the watermark proves no match can
come.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark_delay: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal keys whose event times satisfy
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    Column names must be disjoint across the two inputs (standard for
    stream-stream joins; alias upstream if needed).
    """
    l_wm = left.withWatermark(left_ts, watermark_delay)
    r_wm = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {lower_seconds} SECONDS")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS")
        )
    )
    return l_wm.join(r_wm, cond, how)

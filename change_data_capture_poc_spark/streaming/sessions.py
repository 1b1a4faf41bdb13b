"""Session-window aggregation — the streaming twin of
``operators.sessionize`` (SURVEY.md §2.8).

``F.session_window(ts, gap)`` merges events whose gaps are at or below
the threshold into one window per key (touching intervals merge —
an exactly-``gap`` follower stays in the session); with a watermark it also bounds
state for late data (T5 — the reference handles lateness by full
recompute; the watermark is the streaming-native equivalent).

The same expression works in batch mode, which is what the oracle
checks: session counts/bounds from ``session_window`` on static data
equal the lag/cumsum formulation in ``operators.sessionize``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_agg(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per (key, session): event count, value sum, session bounds.

    ``watermark`` (streaming only) e.g. ``"1 hour"`` bounds state; in
    batch mode leave None.
    """
    if watermark is not None:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts), gap).alias("w"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )

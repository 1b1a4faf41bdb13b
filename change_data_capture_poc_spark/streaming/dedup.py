"""Streaming deduplication — exactly-once keys across micro-batches.

The training-data twin of the batch dedup family (queries/datapipe.py):
a CDC feed or crawl stream re-delivers records (at-least-once
transport, reference's Kafka path), and downstream consumers need each
key exactly once.

Two state regimes, chosen by whether an event-time watermark is given:

- **Bounded state** (production): ``dropDuplicatesWithinWatermark`` —
  a key's dedup state is evicted once the watermark passes its event
  time + delay, so state size tracks the delay window, not the stream's
  lifetime. Re-deliveries INSIDE the window are dropped; a duplicate
  arriving after eviction would pass (the at-least-once contract at
  100 TB: bounded memory beats perfect global dedup).
- **Unbounded state** (drains/tests): plain ``dropDuplicates`` keeps
  every key forever — exact, but state grows with distinct keys;
  only for finite backlogs.

State lives in the HDFS-backed state store per shuffle partition —
the dedup is a hash shuffle on the key columns, key-parallel like
every other stateful operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Drop re-delivered rows per ``keys`` across micro-batches.

    With ``event_time_col`` + ``watermark_delay`` (e.g. ``"10
    minutes"``), dedup state is bounded by the watermark; otherwise
    exact-unbounded.
    """
    if (event_time_col is None) != (watermark_delay is None):
        raise ValueError(
            "event_time_col and watermark_delay must be given together"
        )
    if event_time_col is not None:
        return stream.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)

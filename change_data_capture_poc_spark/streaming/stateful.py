"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's pattern for per-key state that IS bounded (unlike SCD2
history, which belongs in a table — streaming/scd2_stream.py): here,
a per-key running aggregate (event count, value sum, last-seen
timestamp) maintained across micro-batches with a processing-time
timeout to expire idle keys and keep state finite.

Scale notes: state lives in the state store keyed by the groupBy key —
one shuffle on the key per micro-batch; state size is O(live keys x
one row), independent of stream length; the timeout bounds "live".
Arrow moves each key-group batch to Python, so per-batch Python cost
is vectorized, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, value_sum DOUBLE, last_ts TIMESTAMP"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, vsum, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            vsum += float(pdf["value"].fillna(0.0).sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((n, vsum, last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n": [n], "value_sum": [vsum],
             "last_ts": [last]}
        )

    return _update


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running totals over an event stream.

    ``idle_timeout_ms`` expires idle keys' state (continuous production
    streams want this — it is what bounds state). Default None =
    NoTimeout: with ``Trigger.AvailableNow`` a registered
    processing-time timer makes the query spin "no new data but
    cleaning up state" micro-batches until the timer fires (measured:
    hundreds of empty batches for a 1 h timer), so drain-style runs
    must not set it.
    """
    conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )

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


# ---------------------------------------------------------------------------
# Weighted reservoir (A-Res) — the other bounded-state shape
# ---------------------------------------------------------------------------

RESERVOIR_STATE_SCHEMA = (
    "priorities ARRAY<DOUBLE>, doc_ids ARRAY<LONG>, "
    "n_chars_arr ARRAY<LONG>, n_seen LONG"
)
RESERVOIR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)


def _make_reservoir_update(k: int):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (source,) = key
        if state.exists:
            prios, ids, chars, seen = state.get
            rows = list(zip(prios, ids, chars))
        else:
            rows, seen = [], 0
        for pdf in pdfs:
            seen += len(pdf)
            rows.extend(
                zip(
                    pdf["priority"].tolist(),
                    pdf["doc_id"].tolist(),
                    pdf["n_chars"].tolist(),
                )
            )
            # A-Res: the reservoir IS the top-k priorities seen so
            # far; merging per batch keeps state bounded at k rows.
            rows.sort(key=lambda t: (-t[0], t[1]))
            rows = rows[:k]
        state.update(
            (
                [r[0] for r in rows],
                [int(r[1]) for r in rows],
                [int(r[2]) for r in rows],
                seen,
            )
        )
        yield pd.DataFrame(
            {
                "source": [source] * len(rows),
                "doc_id": [int(r[1]) for r in rows],
                "n_chars": [int(r[2]) for r in rows],
                "priority": [r[0] for r in rows],
                "version": [seen] * len(rows),
            }
        )

    return _update


def weighted_reservoir(docs: DataFrame, k: int) -> DataFrame:
    """Per-source A-Res weighted reservoir over a document stream.

    ``docs`` must carry (source, doc_id, n_chars, priority) with the
    priority already computed map-side (deterministic u^(1/w) key).
    State per source is EXACTLY the current k-row reservoir plus a
    seen-counter — the textbook bounded-state streaming sampler: a
    new row either displaces the reservoir minimum or is dropped,
    so state never grows with the stream. Emissions carry a
    ``version`` (rows seen) so an update-mode drain can keep each
    source's latest reservoir.
    """
    return docs.groupBy("source").applyInPandasWithState(
        _make_reservoir_update(k),
        outputStructType=RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

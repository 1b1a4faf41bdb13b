"""Property-based tests (hypothesis): operators vs naive Python models
on randomized inputs. Few examples, small inputs — each example pays a
Spark job; the value is the adversarial shapes hypothesis finds
(duplicate timestamps, single-row keys, all-same-key, empty sides),
not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from change_data_capture_poc_spark.operators import asof_join, sessionize

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts_seconds, payload) rows; keys/timestamps deliberately collide.
_left_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 50),
        st.integers(0, 10_000),
    ),
    min_size=0,
    max_size=25,
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),
    min_size=0,
    max_size=25,
)


@given(left=_left_rows, right=_right_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_model(spark, left, right):
    # Dedupe the right side per (key, ts) — the operator's documented
    # determinism precondition (value = max per slot, like the query).
    rmap: dict[tuple[int, int], float] = {}
    for k, t in right:
        rmap[(k, t)] = float(max(rmap.get((k, t), float("-inf")), t * 10))
    # Unique left ids for comparison.
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(left)],
        "lid int, k int, t long",
    ).select("lid", "k", F.timestamp_seconds("t").alias("t"))
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rmap.items()] or [(None, None, None)],
        "k int, rt long, v double",
    ).where(F.col("k").isNotNull()).select(
        "k", F.timestamp_seconds("rt").alias("rt"), "v"
    )

    got = {
        r.lid: r.v
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="rt", right_values=["v"]
        ).collect()
    }

    want = {}
    for i, (k, t, _) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@given(rows=_left_rows, gap=st.integers(1, 20))
@settings(**_SETTINGS)
def test_sessionize_matches_model(spark, rows, gap):
    df = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(rows)],
        "eid int, k int, ts_s long",
    ).select("eid", "k", F.timestamp_seconds("ts_s").alias("ts"))
    got = {
        r.eid: r.session_id
        for r in sessionize(
            df, key="k", ts="ts", gap_seconds=gap, order_tiebreak="eid"
        ).collect()
    }

    want = {}
    by_key: dict[int, list[tuple[int, int]]] = {}
    for i, (k, t, _) in enumerate(rows):
        by_key.setdefault(k, []).append((t, i))
    for k, evs in by_key.items():
        evs.sort()
        sid, prev = 0, None
        for t, i in evs:
            if prev is None or t - prev > gap:
                sid += 1
            want[i] = sid
            prev = t
    assert got == want

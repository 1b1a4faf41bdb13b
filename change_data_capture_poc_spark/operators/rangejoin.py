"""Range (point-in-interval) join — the third custom join family next
to as-of and interval stream-stream.

Problem: join points ``t`` to intervals ``[lo, hi]`` with
``lo <= t <= hi`` (plus an equi-key). Spark plans the naive predicate
as BroadcastNestedLoopJoin or a per-key theta join — quadratic per
key, the classic 100 TB killer.

Scale formulation (the standard "bucketed range join", what
Databricks' range-join optimization and KDB's window joins do under
the hood): quantize time into fixed-width buckets; each interval
explodes to every bucket it overlaps, each point maps to its single
bucket, and the join becomes an EQUI-join on (key, bucket) that the
exact predicate then verifies. Shuffle cost is linear in points +
interval-bucket expansions (span/width per interval); no cross
product ever forms. Bucket width tunes the trade-off: wide buckets =
fewer interval copies but more false candidates to filter; width ~
median interval span is a good default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MS_PER_DAY = 86_400_000


def range_join_by_bucket(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_ms: int = _MS_PER_DAY,
) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` on
    ``point_key == interval_key AND lo <= point_ts <= hi``.

    Output: all point columns + all interval columns (names must be
    disjoint). One equi-join shuffle on (key, bucket); exact interval
    predicate applied post-join. Each interval contributes
    ``span/bucket_ms + 1`` rows to the join input — bounded fan-out,
    never quadratic.
    """
    # timestamp_ntz columns reject unix_millis; the session timezone is
    # pinned UTC (session.py), so the cast preserves the instant.
    def _bucket_of(col_name):
        return F.floor(
            F.unix_millis(F.col(col_name).cast("timestamp")) / bucket_ms
        )

    pb = points.withColumn("__pb", _bucket_of(point_ts))
    ib = intervals.withColumn(
        "__ib", F.explode(F.sequence(_bucket_of(lo), _bucket_of(hi)))
    )
    joined = pb.join(
        ib,
        (pb[point_key] == ib[interval_key]) & (pb["__pb"] == ib["__ib"]),
    ).where(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi))
    )
    return joined.drop("__pb", "__ib")

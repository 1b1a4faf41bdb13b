"""As-of join (backward/forward/nearest, optional tolerance) — an
operator Spark lacks natively.

Implemented as a union + keyed window (`last/first ... ignore nulls`)
rather than a range cross-join: both inputs are tagged and unioned,
sorted per key by (event time, side), and each left row picks up the
nearest right-side row at or before (backward) / at or after (forward)
its timestamp. One shuffle on the key, no join fan-out — the
formulation that survives 100 TB (a naive ``left.ts >= right.ts``
theta join is quadratic per key).

Tie rule: a right row at exactly the left row's timestamp IS visible
in both directions (>= / <= semantics), matching DuckDB's ``ASOF
JOIN`` (backward; DuckDB has no forward mode — forward oracles use an
explicit min-over-candidates formulation).
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
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the nearest right row with
    ``right_ts <= left_ts`` (backward) or ``right_ts >= left_ts``
    (forward) for the same ``on`` key (nulls if none).

    ``right_values`` are the right-side columns to carry; left columns
    are preserved as-is. ``tolerance_seconds`` voids a match whose
    timestamp distance exceeds the tolerance (pandas ``merge_asof``
    semantics).

    All carried columns come from the SAME matched right row: the
    right side travels as ONE nullable struct and ``last/first``
    (ignorenulls) runs over that struct, so a NULL field inside the
    matched right row stays NULL in the output. (Per-column fills
    would tear values across different right rows and backfill
    legitimate NULLs.)
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, right_values,
            tolerance_seconds,
        )
    backward = direction == "backward"
    lcols = left.columns
    # Side ordering makes an exactly-simultaneous right row visible:
    # backward scans a preceding frame, so right sorts BEFORE left at
    # equal timestamps; forward scans a following frame, so right
    # sorts AFTER left.
    l_side, r_side = (1, 0) if backward else (0, 1)
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(l_side).alias("__side"),
        F.struct(*lcols).alias("__l"),
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(r_side).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__rt"),
            *[F.col(c) for c in right_values],
        ).alias("__r"),
    )
    tagged_l = tagged_l.withColumn(
        "__r", F.lit(None).cast(tagged_r.schema["__r"].dataType)
    )
    tagged_r = tagged_r.withColumn(
        "__l", F.lit(None).cast(tagged_l.schema["__l"].dataType)
    )
    base = Window.partitionBy("__k").orderBy("__t", "__side")
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = F.last("__r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = F.first("__r", ignorenulls=True).over(w)
    unioned = tagged_l.unionByName(tagged_r)
    filled = unioned.select("__l", "__t", fill.alias("__rv"))
    rv = F.col("__rv")
    if tolerance_seconds is not None:
        # cast('timestamp'): unix_millis rejects TIMESTAMP_NTZ inputs
        # (the µs-generation parquet encoding tables.py handles); under
        # the pinned-UTC session the cast is value-identical — same
        # hazard rangejoin.py documents.
        within = (
            F.abs(
                F.unix_millis(F.col("__t").cast("timestamp"))
                - F.unix_millis(rv.getField("__rt").cast("timestamp"))
            )
            <= tolerance_seconds * 1000
        )
        rv = F.when(within, F.col("__rv"))
    return filled.where(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[rv.getField(c).alias(c) for c in right_values],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tolerance_seconds: int | None,
) -> DataFrame:
    """Nearest-direction as-of: each left row takes the right row with
    the smallest |ts distance| in EITHER direction; an exact tie picks
    the backward (earlier) row, pandas ``merge_asof`` style.

    Both direction fills run over the SAME keyed union — two window
    sorts (their side tie-orders differ: backward must see an
    equal-timestamp right row in its preceding frame, forward in its
    following frame) but only ONE hash exchange on the key, so the
    scale shape matches the single-direction form. Right side must be
    unique per (key, ts) like the other directions (callers dedup)."""
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side_b"),
        F.lit(0).alias("__side_f"),
        F.struct(*lcols).alias("__l"),
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side_b"),
        F.lit(1).alias("__side_f"),
        F.struct(
            F.col(right_ts).alias("__rt"),
            *[F.col(c) for c in right_values],
        ).alias("__r"),
    )
    tagged_l = tagged_l.withColumn(
        "__r", F.lit(None).cast(tagged_r.schema["__r"].dataType)
    )
    tagged_r = tagged_r.withColumn(
        "__l", F.lit(None).cast(tagged_l.schema["__l"].dataType)
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side_f")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = tagged_l.unionByName(tagged_r)
    filled = unioned.select(
        "__l",
        "__t",
        F.last("__r", ignorenulls=True).over(wb).alias("__rb"),
        F.first("__r", ignorenulls=True).over(wf).alias("__rf"),
    )

    def dist(rv: F.Column) -> F.Column:
        # Microsecond resolution: the SQL oracle compares epoch_us, and
        # timestamps carry micros — a millis-grain distance would call
        # two candidates <1 ms apart a tie (picking backward) where the
        # oracle sees a strict winner.
        return F.abs(
            F.unix_micros(F.col("__t").cast("timestamp"))
            - F.unix_micros(rv.getField("__rt").cast("timestamp"))
        )

    rb, rf = F.col("__rb"), F.col("__rf")
    if tolerance_seconds is not None:
        rb = F.when(dist(rb) <= tolerance_seconds * 1_000_000, rb)
        rf = F.when(dist(rf) <= tolerance_seconds * 1_000_000, rf)
    rv = (
        F.when(rb.isNull(), rf)
        .when(rf.isNull(), rb)
        .when(dist(rb) <= dist(rf), rb)  # tie -> backward (earlier)
        .otherwise(rf)
    )
    return filled.where(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[rv.getField(c).alias(c) for c in right_values],
    )

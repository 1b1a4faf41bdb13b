"""Z-order clustered layout — multi-column data clustering for scan
pruning.

``sources/writers.write_sorted_layout`` buys min/max pruning for ONE
dominant predicate column; this operator interleaves the bits of
several normalized key columns into a single Morton (Z-order) value
and range-clusters the write on it, so parquet footer min/max stays
narrow on EVERY clustered column at once. At 100 TB this is the
difference between a selective two-column predicate pruning ~sqrt of
the files versus scanning everything that one sort column can't
prune.

Design notes:
- Normalization uses a broadcast 1-row global min/max aggregate and
  deterministic integer banding — NOT ``repartitionByRange`` sampling
  — so a row's bucket is a pure function of its value (the
  sampling-based range partitioner is nondeterministic across subtree
  re-evaluations; see the build playbook). The final range shuffle on
  the z-value is sampling-based, which is fine for a write: only the
  per-file value locality matters, not which file a row lands in.
- The bit interleave is a closed-form JVM expression (shifts + ORs
  via sum of disjoint bit fields), whole-stage-codegen friendly — no
  UDF in the write path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_COL = "__z"


def _zvalue(norm_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each pre-bucketed long column into
    one Morton code: bit ``i`` of column ``j`` lands at position
    ``i * n + j``."""
    n = len(norm_cols)
    terms = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
        )
        for i in range(bits)
        for j, c in enumerate(norm_cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zvalue(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Attach the Z-order value of ``cols`` as column ``__z``.

    Each column is normalized to a ``2**bits``-bucket integer grid via
    a broadcast global min/max (one 1-row scalar exchange), then the
    grids are bit-interleaved. ``len(cols) * bits`` must stay <= 62 to
    fit a signed long. NULLs band to bucket 0 (they cluster together
    at the curve origin).
    """
    if len(cols) * bits > 62:
        raise ValueError("len(cols) * bits must be <= 62")
    stats = df.agg(
        *[
            s
            for c in cols
            for s in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    )
    # bounded: 1-row min/max stats
    with_stats = df.crossJoin(F.broadcast(stats))
    buckets = []
    hi = (1 << bits) - 1
    for c in cols:
        lo_c, hi_c = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.greatest(hi_c - lo_c, F.lit(1e-12))
        frac = (F.coalesce(F.col(c).cast("double"), lo_c) - lo_c) / span
        buckets.append(
            F.least(
                F.floor(frac * (1 << bits)).cast("long"), F.lit(hi)
            )
        )
    return with_stats.withColumn(_Z_COL, _zvalue(buckets, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: one contiguous z-range per output file, rows z-sorted
    within each file, so row-group min/max stays narrow on every
    clustered column."""
    z = with_zvalue(df, cols, bits)
    (
        z.repartitionByRange(n_files, F.col(_Z_COL))
        .sortWithinPartitions(_Z_COL)
        .drop(_Z_COL)
        .write.mode(mode)
        .parquet(path)
    )

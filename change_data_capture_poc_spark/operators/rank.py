"""Distributed global ROW_NUMBER — the scale-safe replacement for
``row_number() OVER (ORDER BY ...)`` (no PARTITION BY) when the input
is data-sized rather than a bounded summary frame.

The window form forces ``Exchange SinglePartition``: every row moves to
ONE task, which sorts the whole frame alone while the cluster idles —
acceptable for a 4-row quota table, a cliff for a vocabulary that grows
~O(corpus^0.55) (Heaps' law: at 100 TB a whitespace vocabulary is
billions of rows of typos/URLs/ids). The distributed form:

  1. ``repartitionByRange`` on the ordering — partition i holds keys
     strictly before partition i+1's (one corpus shuffle, P-way
     parallel);
  2. per-partition counts (P rows) -> per-partition starting offsets
     via a triangular broadcast self-join (off_i = sum of counts
     j < i; P^2 pairs of tiny rows, no single-partition stage, no
     driver collect);
  3. within-partition ``row_number`` keyed by ``spark_partition_id``
     (hash exchange on pid = P parallel sorters) plus the broadcast
     offset.

Row-identical to the window form whenever ``order_by`` is a total
ordering over the input (add an id/tie-break column, as with
operators/topk.grouped_topk).

Sibling: queries/operators_q.global_ordinal_ids does the same job for
a SINGLE NUMERIC key with a known min/max via deterministic integer
banding (bucket is a pure function of the value — re-evaluations of
the subtree can't disagree). This operator generalizes to arbitrary
multi-column orderings at the cost of a sampling-based range
partitioner; that is safe here because ranks are
partition-boundary-invariant under a total ordering — whichever
boundary the sampler picks, offset + local rank yields the same
global rank for every row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from change_data_capture_poc_spark.functions.caching import persist_once


def with_global_row_number(
    df: DataFrame,
    order_by: Sequence[tuple[str, bool]],
    out_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus ``out_col`` = ROW_NUMBER() OVER (ORDER BY order_by).

    ``order_by`` is [(column, ascending), ...] and must be total over
    the input (ties across a range-partition boundary would otherwise
    make ranks depend on partitioning). Output column is BIGINT (the
    offset sum is a long). Existing ``_pid``/``_off`` columns would
    collide; callers keep user-named columns.
    """
    sort_cols = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by
    ]
    p = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # Persisted: the ranged frame feeds BOTH the per-partition counts
    # and the final rank join, and filter/column pruning makes the two
    # subtrees non-identical — without the cache Spark recomputes df's
    # whole lineage (e.g. a corpus-sized token count) twice, and
    # exchange reuse never fires. The cached frame is df itself (for
    # the rank use cases: a vocabulary — Heaps-bounded, far smaller
    # than the corpus that produced it). Released by the harnesses'
    # between-query clearCache.
    part = df.repartitionByRange(p, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    ).transform(persist_once)
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # off_i = sum of counts of partitions before i. A P-row cumulative
    # sum — done as a triangular broadcast self-join so NO stage in the
    # operator is single-partition (a global window here would be
    # bounded at P rows but would re-trip the very detector this
    # operator exists to keep quiet for data-sized frames).
    a = counts.select(
        F.col("_pid").alias("_apid"), F.col("_c").alias("_ac")
    )
    b = counts.select(
        F.col("_pid").alias("_bpid"), F.col("_c").alias("_bc")
    )
    offsets = (
        # bounded: per-partition count rows (|partitions|)
        a.join(F.broadcast(b), F.col("_bpid") < F.col("_apid"), "left")
        .groupBy(F.col("_apid").alias("_pid"))
        .agg(F.coalesce(F.sum("_bc"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        # bounded: per-partition offset rows (|partitions|)
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (F.col("_off") + F.row_number().over(w)).cast("long"),
        )
        .drop("_pid", "_off")
    )

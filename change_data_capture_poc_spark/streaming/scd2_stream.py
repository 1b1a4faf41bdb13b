"""Incremental streaming SCD2 — ``foreachBatch`` merge that converges
to the batch recompute (SURVEY.md §5 item 4, §2.8 T6).

The reference has two formulations: full recompute over the whole log
(transform_scd2.py, exact for any lateness) and an incremental upsert
(init_duckdb.sh). This module gives the streaming shape of the first —
the one that stays exact:

per micro-batch:
  1. land the batch's decoded events in a columnar compacted log,
     partitioned by (batch_id, bucket) with ``bucket = pmod(hash(id),
     n)`` — batch_id makes a foreachBatch REPLAY overwrite its own
     partitions instead of appending duplicates (exactly-once on
     at-least-once delivery), bucket lets step 2 prune IO;
  2. recompute SCD2 for ONLY the buckets containing touched keys and
     overwrite just those partitions (dynamic partition overwrite).

Why not ``applyInPandasWithState``: per-key SCD2 state is unbounded
(every key lives forever — SURVEY.md §7 "streaming state at scale");
keeping state in the table and re-deriving touched buckets keeps
executor memory flat at 100 TB. With Delta/Iceberg, step 2 becomes a
MERGE with the same join/pruning structure.

Cost model at scale: a micro-batch touching K keys re-sorts only the
buckets holding those keys — O(K/n · total) IO, not O(total). Bucket
count ``n_buckets`` trades write amplification (small n) against file
count (large n); at 100 TB use thousands of buckets + AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from change_data_capture_poc_spark.cdc.envelope import decode_envelope
from change_data_capture_poc_spark.cdc.merge_backend import (
    get_merge_backend,
)
from change_data_capture_poc_spark.cdc.scd2 import scd2_recompute


class IncrementalScd2:
    """State lives in two parquet tables, not in memory.

    Durable writes go through the pluggable merge backend
    (cdc/merge_backend.py): replace-partitions semantics, parquet
    dynamic overwrite by default, Delta's transactional replaceWhere
    when the deployment selects it via $SPARK_GRAFT_MERGE_BACKEND.
    """

    def __init__(
        self,
        spark: SparkSession,
        log_path: str,
        scd2_path: str,
        attr_fields: list[str] | None = None,
        n_buckets: int = 16,
        merge_backend=None,
    ) -> None:
        self.spark = spark
        self.log_path = log_path
        self.scd2_path = scd2_path
        self.attr_fields = attr_fields
        self.n_buckets = n_buckets
        self.backend = merge_backend or get_merge_backend()

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.hash("id"), F.lit(self.n_buckets))
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch offers at-least-once: offsets commit AFTER this
        # function returns, so a crash mid-batch REPLAYS the whole batch
        # on restart. Every write here must therefore be idempotent. A
        # plain append would duplicate the replayed events in the log;
        # partitioning by (batch_id, bucket) and dynamically overwriting
        # makes the replay rewrite its own partitions with identical
        # rows instead (the standard foreachBatch exactly-once recipe —
        # Structured Streaming guide, "foreachBatch" idempotence note).
        events = decode_envelope(batch_df)
        self._bucket(events).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id", "bucket").parquet(self.log_path)

        # Touched buckets come from the just-written batch_id partition:
        # bucket and batch_id are partition columns, so this is a
        # partition-pruned, metadata-only listing — no second full
        # evaluation of the micro-batch pipeline (decode + hash) just to
        # enumerate buckets.
        from pyspark.errors import AnalysisException

        try:
            touched = [
                r.bucket
                for r in self.spark.read.parquet(self.log_path)
                .where(F.col("batch_id") == batch_id)
                .select("bucket")
                .distinct()
                .collect()
            ]
        except AnalysisException:
            # An all-empty first batch leaves no readable partitions —
            # nothing to merge.
            return
        if not touched:
            return
        log = self.spark.read.parquet(self.log_path).where(
            F.col("bucket").isin(touched)
        )
        # Replace only the touched buckets (Spark's replacement for
        # UPDATE-in-place, SURVEY.md D2) via the merge backend seam —
        # replace-partitions, so the replayed batch is a no-op rewrite.
        out = scd2_recompute(
            log.drop("bucket", "batch_id"), self.attr_fields
        )
        self.backend.apply(
            self.spark, self.scd2_path, self._bucket(out), "bucket"
        )

    def result(self) -> DataFrame:
        return self.spark.read.parquet(self.scd2_path).drop("bucket")

    def reconcile(self) -> None:
        """Repair path: recompute EVERY bucket from the landed log.

        A stream stopped between the log append and the SCD2 overwrite
        leaves the table lagging the log by one micro-batch; the log is
        the source of truth (exactly the reference's recompute-from-log
        stance, transform_scd2.py:20), so a full recompute restores the
        invariant. Run after unclean shutdown or on a maintenance
        cadence; cost is one pass over the log, same as the batch
        path."""
        log = self.spark.read.parquet(self.log_path)
        out = scd2_recompute(
            log.drop("bucket", "batch_id"), self.attr_fields
        )
        self.backend.apply(
            self.spark, self.scd2_path, self._bucket(out), "bucket"
        )


def run_incremental_scd2(
    spark: SparkSession,
    stream: DataFrame,
    log_path: str,
    scd2_path: str,
    checkpoint: str,
    attr_fields: list[str] | None = None,
    n_buckets: int = 16,
) -> tuple[StreamingQuery, IncrementalScd2]:
    """Wire an envelope stream into the incremental SCD2 materializer."""
    inc = IncrementalScd2(spark, log_path, scd2_path, attr_fields, n_buckets)
    q = (
        stream.writeStream.foreachBatch(inc.process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q, inc

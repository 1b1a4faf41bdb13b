"""CDC / SCD2 queries — the reference's analytical core, over the
driver's ``events`` table (so every query has a DuckDB oracle twin).

The ``events`` table plays the role of the CDC change log: ``user_id``
is the key (the reference's ``payload.*.id``), ``event_id`` the total
order (the reference's ``source.lsn``), ``ts`` the event time
(``ts_ms``), ``props`` the raw-JSON payload. The transforms below are
shape-identical to ``duckdb/analytics/transform_scd2.py:19-61``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table
from change_data_capture_poc_spark.cdc.scd2 import MERGE_SENTINEL, SCD2_SENTINEL


@register(
    "scd2_user_state",
    oracle=f"""
    SELECT user_id,
           event_id AS log_seq_num,
           event_type AS operation_type,
           value,
           ROW_NUMBER() OVER w AS version_number,
           CAST(epoch_ms(ts) AS BIGINT) AS row_valid_start_ms,
           CAST(epoch_ms(COALESCE(LEAD(ts) OVER w,
                                  TIMESTAMP '{SCD2_SENTINEL}')) AS BIGINT)
               AS row_valid_expiration_ms
    FROM events
    WHERE user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    doc="Flagship: full SCD2 recompute (W1 row_number + W2 lead + P3 "
        "coalesce-to-sentinel), shape of transform_scd2.py:41-60. "
        "Validity bounds emitted as epoch-millis BIGINT: the 9999-01-01 "
        "open-row sentinel (transform_scd2.py:58) overflows pandas "
        "datetime64[ns], so timestamps cross the comparison bridge as "
        "exact integers (semantics unchanged, both engines UTC).",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("log_seq_num")
    return (
        events.where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("log_seq_num"),
            F.col("event_type").alias("operation_type"),
            "value",
            "ts",
        )
        .withColumn("version_number", F.row_number().over(w))
        .withColumn(
            "row_valid_expiration_ms",
            F.unix_millis(
                F.coalesce(
                    F.lead("ts").over(w),
                    F.lit(SCD2_SENTINEL).cast("timestamp"),
                )
            ),
        )
        .withColumn("row_valid_start_ms", F.unix_millis("ts"))
        .drop("ts")
        .select(
            "user_id", "log_seq_num", "operation_type", "value",
            "version_number", "row_valid_start_ms",
            "row_valid_expiration_ms",
        )
    )


@register(
    "cdc_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CASE event_type
               WHEN 'signup' THEN 'CREATE'
               WHEN 'click' THEN 'UPDATE'
               WHEN 'purchase' THEN 'UPDATE'
               WHEN 'error' THEN 'DELETE'
               ELSE 'SNAPSHOT'
           END AS operation_type,
           COALESCE(value, -1.0) AS value_filled
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    doc="P1/P2/P3/P4/P6: JSON path extraction + CAST + CASE + COALESCE "
        "+ IS NOT NULL filter (transform_scd2.py:23-39 shape).",
)
def cdc_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        events.where(k.isNotNull())
        .select(
            "event_id",
            k.cast("int").alias("k"),
            F.when(F.col("event_type") == "signup", "CREATE")
            .when(F.col("event_type").isin("click", "purchase"), "UPDATE")
            .when(F.col("event_type") == "error", "DELETE")
            .otherwise("SNAPSHOT")
            .alias("operation_type"),
            F.coalesce(F.col("value"), F.lit(-1.0)).alias("value_filled"),
        )
    )


@register(
    "cdc_epoch_millis_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
           make_timestamp(CAST(epoch_ms(ts) AS BIGINT) * 1000) AS source_timestamp
    FROM events
    """,
    doc="P5: epoch-millis → timestamp with millisecond fidelity. DuckDB "
        "to_timestamp(ms/1000) is float division (keeps millis); Spark "
        "equivalent is timestamp_millis (SURVEY.md §7 timestamp trap).",
)
def cdc_epoch_millis_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ts_ms = F.unix_millis("ts")
    return events.select(
        "event_id",
        ts_ms.alias("ts_ms"),
        F.timestamp_millis(ts_ms).alias("source_timestamp"),
    )


@register(
    "scd2_current_rows",
    oracle=f"""
    WITH versions AS (
        SELECT user_id, value, ts,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        FROM events
    )
    SELECT user_id,
           value AS current_value,
           ts AS row_valid_start_timestamp
    FROM versions WHERE nxt IS NULL
    """,
    doc="Current-image extraction: the is_current=TRUE slice of the "
        "SCD2 table (init_duckdb.sh:34 semantics via window).",
)
def scd2_current_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        events.withColumn("nxt", F.lead("ts").over(w))
        .where(F.col("nxt").isNull())
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("ts").alias("row_valid_start_timestamp"),
        )
    )


@register(
    "scd2_merge_changed_versions",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               LAG(value) OVER w AS prev_value,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    changed AS (
        SELECT user_id, event_id, ts, value FROM marked
        WHERE rn = 1 OR value IS DISTINCT FROM prev_value
    )
    SELECT user_id, event_id, value,
           CAST(epoch_ms(ts) AS BIGINT) AS valid_from_ms,
           CAST(epoch_ms(
               COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY event_id),
                        TIMESTAMP '{MERGE_SENTINEL}')) AS BIGINT) AS valid_to_ms,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
               AS is_current
    FROM changed
    """,
    doc="The incremental-merge variant's version rule "
        "(init_duckdb.sh:39-68): an incoming image only creates a new "
        "version when attributes actually changed (J2's NOT EXISTS "
        "identical-current-row guard, null-safe), superseded versions "
        "get valid_to = the change time and is_current = FALSE, the "
        "survivor keeps the 9999-12-31 23:59:59 sentinel (the merge "
        "path's sentinel, distinct from the recompute path's "
        "9999-01-01 — SURVEY.md §7). Expressed as change-filter + "
        "window, the set-based equivalent of replaying the batches.",
)
def scd2_merge_changed_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    marked = events.select(
        "user_id", "event_id", "ts", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.row_number().over(w).alias("rn"),
    )
    changed = marked.where(
        (F.col("rn") == 1)
        | ~F.col("value").eqNullSafe(F.col("prev_value"))
    ).select("user_id", "event_id", "ts", "value")
    w2 = Window.partitionBy("user_id").orderBy("event_id")
    nxt = F.lead("ts").over(w2)
    return changed.select(
        "user_id",
        "event_id",
        "value",
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(
            F.coalesce(nxt, F.lit(MERGE_SENTINEL).cast("timestamp"))
        ).alias("valid_to_ms"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "scd2_point_in_time_lookup",
    oracle=f"""
    WITH dim AS (
        SELECT user_id, event_id, value,
               CAST(epoch_ms(ts) AS BIGINT) AS valid_from_ms,
               CAST(epoch_ms(COALESCE(LEAD(ts) OVER w,
                                      TIMESTAMP '{SCD2_SENTINEL}')) AS BIGINT)
                   AS valid_to_ms
        FROM events
        WHERE user_id IS NOT NULL AND event_type <> 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT p.user_id,
           p.event_id AS probe_event_id,
           CAST(epoch_ms(p.ts) AS BIGINT) AS probe_ts_ms,
           d.event_id AS version_event_id,
           ROUND(d.value + 1e-9, 6) AS value_as_of,
           d.valid_from_ms
    FROM events p
    JOIN dim d
      ON p.user_id = d.user_id
     AND CAST(epoch_ms(p.ts) AS BIGINT) >= d.valid_from_ms
     AND CAST(epoch_ms(p.ts) AS BIGINT) < d.valid_to_ms
    WHERE p.user_id IS NOT NULL AND p.event_type = 'purchase'
    """,
    doc="Point-in-time lookup against the SCD2 dimension — THE read "
        "pattern SCD2 exists for (transform_scd2.py builds exactly "
        "this validity interval table): each purchase probe joins to "
        "the one version whose [valid_from, valid_to) interval covers "
        "its timestamp. Equi-join on the key with the interval "
        "predicate as a residual filter — per-key version chains are "
        "short, so this is a plain hash join on user_id at any scale "
        "(never an interval cross-product). Validity bounds travel as "
        "epoch-ms BIGINT (year-9999 open-row sentinel vs the pandas "
        "bridge).",
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ev = events.where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("event_id")
    dim = (
        ev.where(F.col("event_type") != "purchase")
        .select("user_id", "event_id", "value", "ts")
        .withColumn("valid_from_ms", F.unix_millis("ts"))
        .withColumn(
            "valid_to_ms",
            F.unix_millis(
                F.coalesce(
                    F.lead("ts").over(w),
                    F.lit(SCD2_SENTINEL).cast("timestamp"),
                )
            ),
        )
        .drop("ts")
    )
    probes = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("probe_event_id"),
            F.unix_millis("ts").alias("probe_ts_ms"),
        )
    )
    return (
        probes.alias("p")
        .join(
            dim.alias("d"),
            (F.col("p.user_id") == F.col("d.user_id"))
            & (F.col("p.probe_ts_ms") >= F.col("d.valid_from_ms"))
            & (F.col("p.probe_ts_ms") < F.col("d.valid_to_ms")),
        )
        .select(
            F.col("p.user_id").alias("user_id"),
            "probe_event_id",
            "probe_ts_ms",
            F.col("d.event_id").alias("version_event_id"),
            F.round(F.col("d.value") + F.lit(1e-9), 6).alias("value_as_of"),
            "valid_from_ms",
        )
    )


@register(
    "scd2_validity_audit",
    oracle=f"""
    WITH dim AS (
        SELECT user_id, event_id,
               CAST(epoch_ms(ts) AS BIGINT) AS valid_from_ms,
               CAST(epoch_ms(COALESCE(LEAD(ts) OVER w,
                                      TIMESTAMP '{SCD2_SENTINEL}')) AS BIGINT)
                   AS valid_to_ms
        FROM events
        WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    kept AS (SELECT * FROM dim WHERE event_id % 5 <> 0),
    seq AS (
        SELECT user_id, valid_from_ms, valid_to_ms,
               LEAD(valid_from_ms) OVER
                   (PARTITION BY user_id ORDER BY valid_from_ms, valid_to_ms)
                   AS next_from_ms
        FROM kept
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(*) FILTER (next_from_ms IS NOT NULL
                                 AND next_from_ms <> valid_to_ms)
                AS BIGINT) AS n_chain_breaks,
           CAST(COUNT(*) FILTER (valid_to_ms =
                CAST(epoch_ms(TIMESTAMP '{SCD2_SENTINEL}') AS BIGINT))
                AS BIGINT) AS n_open_rows
    FROM seq GROUP BY user_id
    """,
    doc="SCD2 validity-chain audit — the data-quality invariant every "
        "CDC target must hold: per key, consecutive versions ordered "
        "by validity must tile time exactly (next.valid_from == "
        "valid_to), with exactly one open row. Run here against a "
        "deliberately corrupted chain (every 5th version dropped) so "
        "the audit demonstrably DETECTS the breaks it exists to "
        "catch. One window + one aggregate on the same key "
        "partitioning — a single shuffle end-to-end.",
)
def scd2_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    dim = (
        events.where(F.col("user_id").isNotNull())
        .select("user_id", "event_id", "ts")
        .withColumn("valid_from_ms", F.unix_millis("ts"))
        .withColumn(
            "valid_to_ms",
            F.unix_millis(
                F.coalesce(
                    F.lead("ts").over(w),
                    F.lit(SCD2_SENTINEL).cast("timestamp"),
                )
            ),
        )
    )
    kept = dim.where(F.col("event_id") % 5 != 0)
    w2 = Window.partitionBy("user_id").orderBy("valid_from_ms", "valid_to_ms")
    seq = kept.withColumn(
        "next_from_ms", F.lead("valid_from_ms").over(w2)
    )
    sentinel_ms = F.unix_millis(F.lit(SCD2_SENTINEL).cast("timestamp"))
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(
            F.when(
                F.col("next_from_ms").isNotNull()
                & (F.col("next_from_ms") != F.col("valid_to_ms")),
                1,
            ).otherwise(0)
        ).alias("n_chain_breaks"),
        F.sum(
            F.when(F.col("valid_to_ms") == sentinel_ms, 1).otherwise(0)
        ).alias("n_open_rows"),
    )

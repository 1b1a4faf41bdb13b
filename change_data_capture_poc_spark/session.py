"""SparkSession factory (SURVEY.md §7 step 1).

Mirrors the reference's runtime knobs where they have Spark analogues:

- UTC everywhere: the reference's S3 sink partitions by UTC wall-clock
  (``connectors/s3-sink.json:26-27`` sets ``timezone=UTC``) and DuckDB
  timestamps are UTC-naive, so the session timezone is pinned to UTC for
  oracle-exact timestamp semantics.
- AQE on: the reference inherits DuckDB's adaptive execution implicitly;
  Spark's equivalent is adaptive query execution (runtime coalescing +
  skew-join handling) — essential at 100 TB.
- Arrow on: every Python<->JVM batch boundary (pandas UDFs, toPandas)
  goes through Arrow.

S3A credentials (mirroring ``transform_scd2.py:7-16``'s six ``SET s3_*``
pragmas) can be injected via ``s3_options``; unused in local tests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "change_data_capture_poc_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    driver_memory: str | None = None,
    s3_options: dict[str, str] | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    In local mode there is a single JVM; ``driver_memory`` is the only
    memory knob. On a real cluster, master/memory come from spark-submit
    and these arguments are left as None.
    """
    # One read of SPARK_GRAFT_CPUS drives BOTH knobs — a module-level
    # constant read the env at import time and could silently diverge
    # from the master URL when a test/driver set the env afterwards.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = str(shuffle_partitions or cpus)

    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    # Only set master/memory when we are the one creating the session
    # (spark-submit on a cluster provides its own).
    if not SparkSession.getActiveSession():
        b = b.master(master)
        # local[N] puts the entire "cluster" in the driver JVM; Spark's
        # 1g default heap GC-thrashes with 32 task threads. 16g is ~1/8
        # of the target box and bounds per-thread working memory at
        # 512m — override via SPARK_GRAFT_DRIVER_MEM or the argument.
        b = b.config(
            "spark.driver.memory",
            driver_memory
            or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    if s3_options:
        # Analogue of the reference's httpfs setup (transform_scd2.py:7-16):
        # endpoint/access/secret/path-style against MinIO or any S3.
        for k, v in s3_options.items():
            b = b.config(f"spark.hadoop.fs.s3a.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)

    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_bounded_window_warning(spark)
    return spark


def _silence_bounded_window_warning(spark: SparkSession) -> None:
    """Raise WindowExec's log level to ERROR.

    Every unpartitioned window left in the engine is a deliberately
    single-partition ranking over a constant-bounded frame via
    ``functions/windows.global_window`` (band summaries, quota tables,
    Zipf-bounded vocab ranks — see that module's doc; corpus-sized
    rankings use operators/topk.grouped_topk instead). The helper
    partitions by lit(0) to record intent, but Spark 4's
    EliminateWindowPartitions folds the constant away again, so
    WindowExec still logs its move-all-data warning dozens of times per
    run and buries real warnings. The frames are audited (PLANS.md
    `windows`/`1pW` columns; tools/audit_plans.py WARNs per-round on
    every unpartitioned window, so a NEW corpus-sized one is still
    caught even with this logger quiet) — the blanket per-instance
    warning carries no information here. Set
    SPARK_GRAFT_QUIET_WINDOW_WARN=0 to keep the stock warning (e.g.
    while developing a new operator).
    """
    if os.environ.get("SPARK_GRAFT_QUIET_WINDOW_WARN", "1") == "0":
        return
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # pragma: no cover - log4j internals moved
        pass  # cosmetic only; never fail session creation over logging

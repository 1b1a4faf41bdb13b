"""Driver-testdata table catalog (TESTDATA.md).

The TPC-H-ish star schema plus ``events`` (CDC-style JSON props),
``documents`` (text pipeline) and ``embeddings`` (similarity search).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/projections into it.

    ``events.ts`` has shipped in two physical encodings across data
    generations: TIMESTAMP(NANOS) (which Spark's parquet reader
    rejects — read as raw nanos via ``nanosAsLong`` and truncated to
    microseconds, exactly DuckDB's ns→µs behavior) and plain µs
    TIMESTAMP (readable directly). Branch on the observed read schema
    so both generations work and oracle comparisons stay bit-identical.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Scope the legacy flag to this one read: set, resolve the
        # relation (which captures the conf), then restore the prior
        # value so unrelated later parquet reads keep the normal loud
        # TIMESTAMP(NANOS) rejection. Verified on a synthetic nanos
        # file: collect() after the restore still reads nanos-as-long,
        # so the restore cannot break this DataFrame's execution.
        try:
            prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        except Exception:
            prior = None
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set(
                    "spark.sql.legacy.parquet.nanosAsLong", prior
                )
        if dict(df.dtypes).get("ts") == "bigint":  # nanos generation
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:  # µs generation reads as TIMESTAMP_NTZ; session tz is
            # pinned UTC, so the LTZ cast is value-identical and keeps
            # every downstream query seeing one ts type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (reference: CREATE VIEW over
    parquet_scan, duckdb/scd2_example.sql:10-14)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship SCD2 recompute (the reference's core
transform, ``duckdb/analytics/transform_scd2.py:19-61``) over the
sf0.001 testdata. ``queries()`` / ``oracle_sql()`` expose the full
operator surface from SURVEY.md §2 plus the north-star data-pipeline
operators; see ``change_data_capture_poc_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from change_data_capture_poc_spark.registry import oracle_sqls, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return spark_queries()["scd2_user_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return oracle_sqls()

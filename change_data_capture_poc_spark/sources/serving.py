"""BI / serving read path (the reference's Superset edge).

The reference exposes its SCD2 table to Superset through a DuckDB file
(`README.md:335-345`); the Spark-native equivalents, in order of
deployment weight:

1. ``publish_table`` — persist a result as a named table in the
   session catalog (``saveAsTable``). Any SQL client of the same
   metastore (or a later session pointed at the same warehouse dir)
   reads it as ``SELECT * FROM <name>`` — the minimal catalog story,
   testable in this container.
2. ``start_thrift_server`` — expose the session's catalog over
   HiveServer2 wire protocol (JDBC/ODBC — what Superset/Tableau/DBeaver
   actually speak). Env-gated: the JVM class ships only in Hive-enabled
   Spark distributions, so this raises a clear error when absent
   instead of failing deep in py4j.
3. A lakehouse catalog (Delta/Iceberg + external metastore) in real
   deployments — same ``saveAsTable`` call, different catalog impl
   (documented in cdc/scd2.py's backend note).

At 100 TB the publish step is a metadata operation on top of the
already-written parquet — the data does not move; BI queries hit the
same pruned columnar scans the engine itself uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def publish_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """CREATE OR REPLACE TABLE <name> in the session catalog — the
    serving twin of writers.materialize_table (which writes a bare
    path). Readers use plain ``spark.sql(f"SELECT ... FROM {name}")``
    with full pushdown/pruning."""
    w = df.write.mode(mode).format("parquet")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.saveAsTable(name)


def thrift_server_available(spark: SparkSession) -> bool:
    """True when the Hive ThriftServer class is on the classpath.
    (py4j package attribute access never fails for absent classes —
    Class.forName is the reliable probe.)"""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def start_thrift_server(spark: SparkSession, port: int = 10000) -> None:
    """Expose the session catalog over the HiveServer2 protocol so BI
    tools connect via JDBC (``jdbc:hive2://host:10000``) — the Spark
    answer to the reference's Superset-over-DuckDB edge.

    Env-gated on a Hive-enabled Spark build (HiveThriftServer2 on the
    classpath); raises the documented error otherwise rather than
    failing deep in py4j. Not started in tests (it binds a port and
    spawns service threads); the ``publish_table`` + ``spark.sql``
    path is the in-container tested serving surface.
    """
    if not thrift_server_available(spark):
        raise NotImplementedError(
            "HiveThriftServer2 not on the classpath (non-Hive Spark "
            "build); deploy with a Hive-enabled distribution or serve "
            "via publish_table + spark.sql"
        )
    jvm = spark.sparkContext._jvm
    spark.conf.set("hive.server2.thrift.port", str(port))
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )

"""change_data_capture_poc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference CDC pipeline (``shalini-p16/change-data-capture-poc``), rebuilt
Spark-first:

- CDC envelope generation / ingestion  (reference: Debezium + Kafka)
- Partitioned event-log storage        (reference: Kafka Connect S3 sink)
- SCD2 derivation, batch + incremental (reference: duckdb/analytics/*)
- A full relational analytics surface  (reference: delegated to DuckDB)
- Large-scale data-pipeline operators: dedup, similarity search,
  text analysis, multimodal column plumbing (north-star extensions)

Everything is expressed with the public PySpark DataFrame / SQL /
Structured Streaming API so Catalyst + Tungsten pick physical plans that
survive a 1000-executor, 100 TB deployment.
"""

__version__ = "0.1.0"

from change_data_capture_poc_spark.session import get_spark  # noqa: F401

"""Debezium-style CDC envelope: schema + decoding (SURVEY.md §1.2).

The central record type of the reference pipeline. Shape as consumed by
the reference's transform (``duckdb/analytics/transform_scd2.py:23-38``):

    payload.before   full pre-image  (null for op 'c'/'r')
    payload.after    full post-image (null for op 'd')
    payload.op       'c' | 'u' | 'd' | 'r'
    payload.ts_ms    epoch millis (BIGINT)
    payload.source.lsn  strictly-increasing log sequence number

Full before-images exist because the source tables run with
``REPLICA IDENTITY FULL`` (``initdb/01_init_schema.sql:23-24``); deletes
arrive as ordinary envelopes (``tombstones.on.delete=false``,
``connectors/postgres-source.json:18``); decimals arrive as doubles
(``decimal.handling.mode=double``, ``connectors/postgres-source.json:21``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Row images of the two source tables (initdb/01_init_schema.sql:8-20;
# price is DOUBLE on the wire — SURVEY.md §1.3).
PRODUCT_FIELDS = [
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("price", T.DoubleType()),
]
USER_FIELDS = [
    T.StructField("id", T.IntegerType()),
    T.StructField("username", T.StringType()),
    T.StructField("password", T.StringType()),
]

# Op-code → label mapping (transform_scd2.py:29-35). Note: after JSON
# decoding the codes are unquoted scalars ('c', not '"c"') — the
# reference compares against JSON-quoted strings only because DuckDB's
# json_extract returns JSON-typed values (SURVEY.md §7 fidelity traps).
OP_LABELS = {"c": "CREATE", "u": "UPDATE", "d": "DELETE", "r": "SNAPSHOT"}


def envelope_schema(row_fields: list[T.StructField]) -> T.StructType:
    """Explicit envelope StructType — deterministic schemas beat
    inference at 100 TB (SURVEY.md §1.4)."""
    row = T.StructType(row_fields)
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", row),
                        T.StructField("after", row),
                        T.StructField("op", T.StringType()),
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField(
                            "source",
                            T.StructType([T.StructField("lsn", T.LongType())]),
                        ),
                    ]
                ),
            )
        ]
    )


def op_label(op: Column) -> Column:
    """CASE mapping of op codes (transform_scd2.py:29-35)."""
    expr = F.lit("INVALID")
    # Build when-chain in reverse so the generated plan reads c→u→d→r.
    for code, label in reversed(OP_LABELS.items()):
        expr = F.when(op == code, label).otherwise(expr)
    return expr


def decode_envelope(df: DataFrame, key_field: str = "id") -> DataFrame:
    """Envelope structs → the flat cdc_events relation.

    Reproduces the ``cdc_events`` CTE (transform_scd2.py:21-40):
    coalesced key (deletes keep their key via the before-image),
    before/after images, op label, lsn, event-time timestamp; rows
    without an op are dropped. ``F.timestamp_millis`` keeps sub-second
    precision exactly like DuckDB's float-division ``to_timestamp(ms/1000)``.
    """
    p = F.col("payload")
    return (
        df.where(p.getField("op").isNotNull())
        .select(
            F.coalesce(
                p.getField("after").getField(key_field),
                p.getField("before").getField(key_field),
            )
            .cast("int")
            .alias("id"),
            p.getField("before").alias("before_row_value"),
            p.getField("after").alias("after_row_value"),
            op_label(p.getField("op")).alias("operation_type"),
            p.getField("source").getField("lsn").cast("long").alias("log_seq_num"),
            F.timestamp_millis(p.getField("ts_ms").cast("long")).alias(
                "source_timestamp"
            ),
        )
    )


def parse_envelope_json(raw: DataFrame, row_fields: list[T.StructField],
                        column: str = "value") -> DataFrame:
    """Raw NDJSON strings → typed envelope structs.

    Spark analogue of ``read_ndjson_objects`` + ``json_extract``
    (transform_scd2.py:23-38): one ``from_json`` parse with the explicit
    envelope schema, after which every field access is a struct getter
    (single parse, prunable, codegen'd — vs per-field JSON path walks).
    """
    schema = envelope_schema(row_fields)
    return raw.select(F.from_json(F.col(column), schema).alias("e")).select(
        F.col("e.payload").alias("payload")
    )

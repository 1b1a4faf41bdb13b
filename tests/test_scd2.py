"""SCD2 derivation tests (SURVEY.md §5 items 2-4).

Golden fixture edge cases the TPC-H tables can't cover
(reference semantics: duckdb/analytics/transform_scd2.py:19-61):
- delete tombstone keeps its key and yields a NULL-attribute open row (T3)
- out-of-file-order arrival is healed by the lsn window (T2)
- rows with missing payload.op are dropped (transform_scd2.py:39)
- snapshot 'r' rows start the chain (T4)

Plus SCD2 interval invariants (property-style over the seeded
generator) and incremental-merge ↔ recompute convergence.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from change_data_capture_poc_spark.cdc.envelope import (
    PRODUCT_FIELDS,
    decode_envelope,
    envelope_schema,
)
from change_data_capture_poc_spark.cdc.generator import CdcGenerator
from change_data_capture_poc_spark.cdc.scd2 import (
    SCD2_SENTINEL,
    scd2_merge_batch,
    scd2_recompute,
)

SENTINEL = datetime.datetime.fromisoformat(SCD2_SENTINEL)


def _env(lsn, op, before=None, after=None, ts_ms=1_700_000_000_000):
    return {"payload": {"before": before, "after": after, "op": op,
                        "ts_ms": ts_ms, "source": {"lsn": lsn}}}


def _prod(pid, name="n", desc="d", price=1.0):
    return {"id": pid, "name": name, "description": desc, "price": price}


def _scd2(spark, events):
    df = spark.createDataFrame(events, envelope_schema(PRODUCT_FIELDS))
    return scd2_recompute(decode_envelope(df))


def test_insert_update_delete_chain(spark):
    t0 = 1_700_000_000_000
    events = [
        _env(1000, "c", None, _prod(1, "a"), t0),
        _env(2000, "u", _prod(1, "a"), _prod(1, "b"), t0 + 500),
        _env(3000, "d", _prod(1, "b"), None, t0 + 900),
    ]
    rows = sorted(_scd2(spark, events).collect(), key=lambda r: r.version_number)
    assert [r.operation_type for r in rows] == ["CREATE", "UPDATE", "DELETE"]
    # Intervals chain: each expiration == next start; last one open.
    assert rows[0].row_valid_expiration_timestamp == rows[1].row_valid_start_timestamp
    assert rows[1].row_valid_expiration_timestamp == rows[2].row_valid_start_timestamp
    assert rows[2].row_valid_expiration_timestamp == SENTINEL
    # T3: the delete tombstone keeps its key but has NULL attributes.
    assert rows[2].id == 1 and rows[2].name is None and rows[2].price is None
    # Millisecond fidelity (SURVEY.md §7 timestamp trap).
    assert rows[0].row_valid_start_timestamp.microsecond == 0
    assert rows[1].row_valid_start_timestamp.microsecond == 500_000


def test_out_of_order_arrival_healed_by_lsn(spark):
    t0 = 1_700_000_000_000
    ordered = [
        _env(1000, "c", None, _prod(7, "v1"), t0),
        _env(2000, "u", _prod(7, "v1"), _prod(7, "v2"), t0 + 500),
        _env(3000, "u", _prod(7, "v2"), _prod(7, "v3"), t0 + 1000),
    ]
    shuffled = [ordered[2], ordered[0], ordered[1]]
    a = {tuple(r) for r in _scd2(spark, ordered).collect()}
    b = {tuple(r) for r in _scd2(spark, shuffled).collect()}
    assert a == b
    names = [r.name for r in sorted(_scd2(spark, shuffled).collect(),
                                    key=lambda r: r.version_number)]
    assert names == ["v1", "v2", "v3"]


def test_missing_op_rows_filtered(spark):
    events = [
        _env(1000, "c", None, _prod(1)),
        _env(2000, None, None, _prod(2)),  # no op → dropped
    ]
    out = _scd2(spark, events)
    assert out.count() == 1
    assert out.first().id == 1


def test_snapshot_then_stream(spark):
    t0 = 1_700_000_000_000
    events = [
        _env(500, "r", None, _prod(3, "snap"), t0 - 1000),
        _env(1500, "u", _prod(3, "snap"), _prod(3, "live"), t0),
    ]
    rows = sorted(_scd2(spark, events).collect(), key=lambda r: r.version_number)
    assert [r.operation_type for r in rows] == ["SNAPSHOT", "UPDATE"]
    assert rows[0].row_valid_expiration_timestamp == rows[1].row_valid_start_timestamp


def test_generator_scd2_invariants(spark):
    """Per key: contiguous non-overlapping intervals, exactly one open
    row, version_count == event_count (SURVEY.md §5 item 3)."""
    gen = CdcGenerator(seed=7)
    df = gen.products_df(spark, num_records=300, snapshot_rows=20)
    events = decode_envelope(df)
    out = scd2_recompute(events).cache()

    per_key = (
        out.groupBy("id")
        .agg(
            F.count("*").alias("versions"),
            F.sum(
                (F.col("row_valid_expiration_timestamp")
                 == F.lit(SCD2_SENTINEL).cast("timestamp")).cast("int")
            ).alias("open_rows"),
        )
    )
    bad = per_key.where(F.col("open_rows") != 1).count()
    assert bad == 0

    counts = events.groupBy("id").count().withColumnRenamed("count", "events")
    mismatch = (
        per_key.join(counts, "id")
        .where(F.col("versions") != F.col("events"))
        .count()
    )
    assert mismatch == 0

    # Contiguity: expiration[i] == start[i+1] within each key.
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("version_number")
    gaps = (
        out.withColumn("next_start", F.lead("row_valid_start_timestamp").over(w))
        .where(
            F.col("next_start").isNotNull()
            & (F.col("row_valid_expiration_timestamp") != F.col("next_start"))
        )
        .count()
    )
    assert gaps == 0
    out.unpersist()


def test_merge_converges_with_batches(spark):
    """Incremental merge (init_duckdb.sh:39-68 semantics): applying
    image batches yields one current row per live key with the latest
    attributes, and expired rows carry is_current=False."""
    hist_schema = ("product_id int, name string, price double, "
                   "valid_from timestamp, valid_to timestamp, is_current boolean")
    history = spark.createDataFrame([], hist_schema)
    t = datetime.datetime(2024, 1, 1)
    batches = [
        [(1, "a", 1.0, t), (2, "b", 2.0, t)],
        [(1, "a2", 1.5, t + datetime.timedelta(hours=1)),
         (2, "b", 2.0, t + datetime.timedelta(hours=1))],  # 2 unchanged
    ]
    for batch in batches:
        bdf = spark.createDataFrame(
            batch, "id int, name string, price double, source_timestamp timestamp"
        )
        history = scd2_merge_batch(history, bdf)
        history = spark.createDataFrame(history.collect(), history.schema)

    rows = history.collect()
    cur = {r.product_id: r for r in rows if r.is_current}
    assert cur[1].name == "a2" and cur[1].price == 1.5
    assert cur[2].name == "b"
    expired = [r for r in rows if not r.is_current]
    assert len(expired) == 1 and expired[0].product_id == 1
    assert expired[0].valid_to == t + datetime.timedelta(hours=1)


def test_merge_multiple_images_per_key_in_one_batch(spark):
    """A micro-batch carrying two consecutive updates for one key must
    collapse to the latest image (MERGE source-uniqueness contract) —
    never two expired copies or two is_current rows."""
    hist_schema = ("product_id int, name string, price double, "
                   "valid_from timestamp, valid_to timestamp, is_current boolean")
    history = spark.createDataFrame([], hist_schema)
    t = datetime.datetime(2024, 1, 1)
    batches = [
        [(1, "w", 1.0, t)],
        # two images for key 1 in ONE batch: 'x' then 'y'
        [(1, "x", 1.1, t + datetime.timedelta(hours=1)),
         (1, "y", 1.2, t + datetime.timedelta(hours=2))],
    ]
    for batch in batches:
        bdf = spark.createDataFrame(
            batch, "id int, name string, price double, source_timestamp timestamp"
        )
        history = scd2_merge_batch(history, bdf)
        history = spark.createDataFrame(history.collect(), history.schema)

    rows = history.collect()
    cur = [r for r in rows if r.is_current]
    assert len(cur) == 1 and cur[0].name == "y" and cur[0].price == 1.2
    expired = [r for r in rows if not r.is_current]
    assert len(expired) == 1 and expired[0].name == "w"
    # superseded row expired exactly once, at the winning image's ts
    assert expired[0].valid_to == t + datetime.timedelta(hours=2)


def test_merge_null_attributes_converge(spark):
    """IS DISTINCT FROM semantics: a row with a NULL attribute must be
    recognized as identical to itself on the next batch (no re-insert
    accumulating duplicate current rows) and as changed when the NULL
    flips to a value."""
    hist_schema = ("product_id int, name string, price double, "
                   "valid_from timestamp, valid_to timestamp, is_current boolean")
    history = spark.createDataFrame([], hist_schema)
    t = datetime.datetime(2024, 1, 1)
    batches = [
        [(1, None, 1.0, t)],
        [(1, None, 1.0, t + datetime.timedelta(hours=1))],  # identical
        [(1, "named", 1.0, t + datetime.timedelta(hours=2))],  # NULL→value
    ]
    for batch in batches:
        bdf = spark.createDataFrame(
            batch, "id int, name string, price double, source_timestamp timestamp"
        )
        history = scd2_merge_batch(history, bdf)
        history = spark.createDataFrame(history.collect(), history.schema)

    rows = history.collect()
    cur = [r for r in rows if r.is_current]
    assert len(cur) == 1 and cur[0].name == "named"
    expired = [r for r in rows if not r.is_current]
    assert len(expired) == 1 and expired[0].name is None
    assert expired[0].valid_to == t + datetime.timedelta(hours=2)

"""Round-10 query tests: type-widening schema evolution, data card."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def test_widening_generations_have_distinct_physical_types(spark):
    """The two writer generations must land genuinely different
    PHYSICAL parquet types (INT32/FLOAT vs INT64/DOUBLE) — otherwise
    the query isn't exercising Spark's type-widening reader at all —
    and the widened read must upcast the narrow era in the scan."""
    from change_data_capture_poc_spark.queries.pipeline11_q import (
        _WIDEN_SCHEMA,
        _widen_gen_dir,
    )

    sf = "/root/testdata/sf0.001"
    d = _widen_gen_dir(spark, sf)

    def physical(subdir: str) -> dict[str, str]:
        f = sorted(glob.glob(os.path.join(d, subdir, "part-*.parquet")))[0]
        sch = pq.read_schema(f)
        return {n: str(sch.field(n).type) for n in sch.names}

    narrow = physical("gen_narrow")
    wide = physical("gen_wide")
    assert narrow["id"] == "int32" and wide["id"] == "int64"
    assert narrow["v"] == "int32" and wide["v"] == "int64"
    assert narrow["price"] == "float" and wide["price"] == "double"
    assert narrow["lsn"] == "int64" and wide["lsn"] == "int64"

    both = spark.read.schema(_WIDEN_SCHEMA).parquet(
        os.path.join(d, "gen_narrow"), os.path.join(d, "gen_wide")
    )
    assert dict(both.dtypes) == {
        "lsn": "bigint",
        "id": "bigint",
        "v": "bigint",
        "price": "double",
    }
    # Narrow-era floats survive as their exact float32 values.
    row = (
        both.where((F.col("lsn") % 2 == 0) & (F.col("lsn") % 10000 == 50))
        .select("price")
        .first()
    )
    if row is not None:
        import struct

        f32 = struct.unpack("f", struct.pack("f", 50 / 100.0))[0]
        assert row["price"] == f32

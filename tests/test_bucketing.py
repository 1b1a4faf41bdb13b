"""Bucketed-table co-located join: the join that never shuffles.

Writes lineitem and orders bucketed by order key into the same bucket
count, then asserts the join plan contains NO shuffle exchange on
either side — the write-once-join-many pattern for fact-fact joins at
scale (SURVEY.md §4 shuffle/partitioning row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_poc_spark.plans import shuffle_count
from change_data_capture_poc_spark.sources.writers import write_bucketed_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(li, "t_li_bkt", ["l_orderkey"], 8,
                         sort_cols=["l_orderkey"])
    write_bucketed_table(o, "t_o_bkt", ["o_orderkey"], 8,
                         sort_cols=["o_orderkey"])
    try:
        a = spark.table("t_li_bkt")
        b = spark.table("t_o_bkt")
        joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.sum("l_quantity").alias("qty"))
        # The join itself is exchange-free; the only shuffle allowed is
        # the final aggregation (and none if keys align, which they do:
        # groupBy on the bucket key reuses the bucketing).
        assert shuffle_count(joined) == 0
        # And it still computes the right thing.
        plain = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.sum("l_quantity").alias("qty"))
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_o_bkt")

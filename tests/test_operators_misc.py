"""Checks for operators whose cross-engine oracle is intentionally
weaker: approximate sketches (estimates differ by design) and the
Arrow matmul ANN (must agree with the exact built-in formulation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import all_queries


def test_approx_sketches_error_bounds(spark, sf_dir):
    """HLL++ distinct estimate within 5% of exact; approx median within
    the t-digest accuracy band."""
    q = all_queries()["agg_approx_sketches"]
    approx = {r.event_type: r for r in q.fn(spark, sf_dir).collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id", "value"
    )
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.05 * e.users)
        if e.p50 is not None:
            assert abs(a.q50 - e.p50) <= 0.1 * (abs(e.p50) + 1)


def test_pandas_matmul_matches_builtin_ann(spark, sf_dir):
    """The Arrow/numpy path and the codegen'd F.aggregate path must
    return the identical top-k sets."""
    qs = all_queries()
    a = {
        (r.q_id, r.neighbor_id, r.cosine)
        for r in qs["ann_cosine_pandas_matmul"].fn(spark, sf_dir).collect()
    }
    b = {
        (r.q_id, r.neighbor_id, r.cosine)
        for r in qs["ann_cosine_bruteforce"].fn(spark, sf_dir).collect()
    }
    assert a == b

"""grouped_topk (operators/topk.py) — the two-phase partial top-k that
replaces constant-cardinality window rankings in the ANN/holdout paths.

Pin: row-identical to the row_number() window form under a total
ordering, across multiple input partitions, for k under / at / over
group size, for desc-numeric and asc-string sort keys, and with
pass-through payload columns (arrays included).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from change_data_capture_poc_spark.operators.topk import grouped_topk


def _window_topk(df, keys, order_cols, k):
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def test_grouped_topk_equals_window_form(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(5), round(rng.random(), 6))
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "id long, grp int, score double"
    ).repartition(13)

    for k in (1, 7, 500):
        got = sorted(
            map(
                tuple,
                grouped_topk(
                    df, ["grp"], [("score", False), ("id", True)], k
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                _window_topk(
                    df, ["grp"], [F.col("score").desc(), F.col("id")], k
                ).collect(),
            )
        )
        assert got == want, f"k={k}"


def test_grouped_topk_string_ascending_and_payload(spark):
    """The holdout shape: ascending md5-string sort key, payload
    columns (including an array) carried through untouched."""
    rows = [
        (
            i,
            f"src{i % 3}",
            hashlib.md5(str(i).encode()).hexdigest(),
            [float(i), float(i) * 0.5],
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id long, src string, h string, vec array<double>"
    ).repartition(7)
    got = grouped_topk(
        df, ["src"], [("h", True), ("id", True)], 4
    ).collect()
    assert len(got) == 12
    by_src: dict[str, list] = {}
    for r in got:
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        expect = sorted(
            (r for r in rows if r[1] == src), key=lambda r: (r[2], r[0])
        )[:4]
        assert sorted((r.h, r.id) for r in rs) == [
            (e[2], e[0]) for e in expect
        ]
        for r in rs:
            assert r.vec == [float(r.id), float(r.id) * 0.5]


def test_grouped_topk_keeps_null_key_group(spark):
    """NULL group keys rank as their own partition, exactly like the
    window form and the DuckDB oracles — pandas' groupby default
    (dropna=True) would silently drop them."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, None, 3.0), (4, None, 4.0)],
        "id long, grp string, score double",
    ).repartition(3)
    got = sorted(
        map(
            tuple,
            grouped_topk(
                df, ["grp"], [("score", False), ("id", True)], 1
            ).collect(),
        ),
        key=str,
    )
    want = sorted(
        map(
            tuple,
            _window_topk(
                df, ["grp"], [F.col("score").desc(), F.col("id")], 1
            ).collect(),
        ),
        key=str,
    )
    assert got == want
    assert (2, "a", 2.0) in got and (4, None, 4.0) in got


def test_grouped_topk_null_order_values_sort_first(spark):
    """NULL ORDER values must win the cut independent of partitioning:
    phase 2's struct sort_array ranks a null field smallest, so phase
    1's partial cut keeps them too (na_position='first'). Matches the
    window form's ASC NULLS FIRST default."""
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.0), (3, "a", 2.0), (4, "a", 3.0)],
        "id long, grp string, score double",
    ).repartition(4)  # null row isolated from the low scores
    got = sorted(
        tuple(r)
        for r in grouped_topk(
            df, ["grp"], [("score", True), ("id", True)], 2
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _window_topk(
            df, ["grp"], [F.col("score").asc(), F.col("id")], 2
        ).collect()
    )
    assert got == want
    assert got == [(1, "a", None), (2, "a", 1.0)]


def test_grouped_topk_multi_key_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, 0.5)], "id long, s string, g int, v double"
    )
    out = grouped_topk(
        df, ["s", "g"], [("v", False), ("id", True)], 3
    ).collect()
    assert [tuple(r) for r in out] == [(1, "a", 1, 0.5)]
    empty = df.where(F.col("id") < 0)
    assert (
        grouped_topk(
            empty, ["s", "g"], [("v", False), ("id", True)], 3
        ).count()
        == 0
    )


def test_grouped_topk_plan_has_no_window(spark):
    """The point of the rewrite: the physical plan must contain no
    Window exec — the cut is a partial Arrow stage plus one bounded
    aggregation."""
    df = spark.createDataFrame(
        [(i, i % 4, float(i % 17)) for i in range(100)],
        "id long, grp int, score double",
    )
    plan = (
        grouped_topk(df, ["grp"], [("score", False), ("id", True)], 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "MapInPandas" in plan


def test_global_row_number_window_parity(spark):
    """with_global_row_number is row-identical to the single-partition
    window form under a total ordering, including mixed asc/desc and a
    row count that doesn't divide evenly across range partitions."""
    from pyspark.sql import Window

    from change_data_capture_poc_spark.operators.rank import (
        with_global_row_number,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 11, f"t{(i * 13) % 23:02d}") for i in range(257)],
        "id long, n int, tok string",
    )
    got = {
        (r.id, r.rnk)
        for r in with_global_row_number(
            df, [("n", False), ("tok", True), ("id", True)],
            num_partitions=7,
        ).collect()
    }
    w = Window.orderBy(F.col("n").desc(), "tok", "id")
    want = {
        (r.id, r.rnk)
        for r in df.withColumn(
            "rnk", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_global_row_number_no_single_partition_stage(spark):
    """The operator's contract: NO Exchange SinglePartition anywhere —
    ranking parallelism is P range partitions, offsets come from the
    triangular broadcast join."""
    from change_data_capture_poc_spark.operators.rank import (
        with_global_row_number,
    )
    from change_data_capture_poc_spark.plans import (
        unpartitioned_window_count,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).alias("n")
    )
    out = with_global_row_number(
        df, [("n", False), ("id", True)], num_partitions=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert unpartitioned_window_count(out) == 0


def test_variant_topk_hits_equals_two_pass_reference(spark):
    """variant_topk_hits (the r14 fused dual-ranking eval) must be
    row-identical to the two independent top-k passes + hit LEFT JOIN
    it replaced — including queries whose prediction ranking has fewer
    than k candidates, zero candidates, and under-k truth groups."""
    from change_data_capture_poc_spark.operators.topk import (
        variant_topk_hits,
    )

    rng = random.Random(21)
    rows = []
    for q in range(6):
        # q 0-4 get 40 candidates, q 5 only 3 (truth group under k);
        # prediction eligibility is sparse (and empty for q 4).
        n = 40 if q < 5 else 3
        for i in range(n):
            pred_ok = (q != 4) and rng.random() < 0.3
            rows.append((q, 1000 * q + i, round(rng.random(), 6), pred_ok))
    df = spark.createDataFrame(
        rows, "q_id long, neighbor_id long, cos double, pred_ok boolean"
    ).repartition(7)

    k = 5
    order = [("cos", False), ("neighbor_id", True)]
    scored = df.select(
        "q_id",
        "neighbor_id",
        "cos",
        F.explode(
            F.when(
                F.col("pred_ok"), F.array(F.lit(0), F.lit(1))
            ).otherwise(F.array(F.lit(0)))
        ).alias("variant"),
    )
    got = sorted(
        map(tuple, variant_topk_hits(scored, k, order).collect())
    )

    gt = grouped_topk(
        df.select("q_id", "neighbor_id", "cos"), ["q_id"], order, k
    ).select("q_id", "neighbor_id")
    pred = grouped_topk(
        df.where("pred_ok").select("q_id", "neighbor_id", "cos"),
        ["q_id"],
        order,
        k,
    ).select("q_id", "neighbor_id", F.lit(1).alias("hit"))
    want = sorted(
        map(
            tuple,
            gt.join(pred, ["q_id", "neighbor_id"], "left")
            .groupBy("q_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_truth"),
                F.count("hit").cast("long").alias("hits"),
            )
            .collect(),
        )
    )
    assert got == want

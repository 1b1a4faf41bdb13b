"""Plan-shape regression tests — the 100 TB scale contract.

Each assertion pins a physical-plan property that must survive scale:
filters pushed into the parquet scan, read schemas pruned to consumed
columns, dimension joins broadcast (fact table never shuffles for the
join), and shuffle counts equal to what the operator's algebra
requires. A regression here is a 100x slowdown at scale that a
row-count test would never catch.
"""

from __future__ import annotations

import pytest

from change_data_capture_poc_spark.plans import (
    broadcast_count,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
from change_data_capture_poc_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_q5_shape_all_dims_broadcast(spark, sf_dir, queries):
    """6-way star join: every dimension side broadcasts; the only
    shuffle is the final aggregation exchange."""
    df = queries["local_supplier_volume"].fn(spark, sf_dir)
    assert broadcast_count(df) == 5
    assert shuffle_count(df) == 1


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir, queries):
    df = queries["pricing_summary"].fn(spark, sf_dir)
    pf = pushed_filters(df)
    assert any("LessThanOrEqual(l_shipdate" in f for f in pf)
    rs = read_schemas(df)[0]
    assert "l_comment" not in rs  # projection pruned to consumed columns
    assert rs.count(":") == 7  # exactly the 7 consumed columns
    assert shuffle_count(df) == 1  # partial agg map-side, one exchange


def test_scan_filter_project_pushdown(spark, sf_dir, queries):
    df = queries["scan_filter_project"].fn(spark, sf_dir)
    pf = pushed_filters(df)[0]
    assert "LessThan(l_shipdate" in pf
    assert "GreaterThan(l_quantity,30.0)" in pf
    assert shuffle_count(df) == 0  # pure scan-filter-project pipeline


def test_scd2_single_shuffle(spark, sf_dir, queries):
    """The SCD2 window pipeline shuffles exactly once (partitionBy key)
    — per-key version chains never cross executors twice."""
    df = queries["scd2_user_state"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_asof_join_shuffle_budget(spark, sf_dir, queries):
    """As-of join: one shuffle for the right-side (key, ts) dedup and
    one for the union window — never a quadratic theta join (which
    would show as a nested-loop / cartesian in the plan)."""
    from change_data_capture_poc_spark.plans import plan_ops

    df = queries["asof_join_order_events"].fn(spark, sf_dir)
    ops = plan_ops(df)
    assert not any("NestedLoop" in o or "Cartesian" in o for o in ops)
    assert shuffle_count(df) <= 3


def test_dedup_exact_single_shuffle(spark, sf_dir, queries):
    df = queries["dedup_exact_groups"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_ann_bruteforce_broadcasts_queries(spark, sf_dir, queries):
    """The query set broadcasts; the corpus is never shuffled for the
    join; the per-query cut is the two-phase partial top-k (one
    k-bounded agg exchange), NOT a corpus-sized window."""
    df = queries["ann_cosine_bruteforce"].fn(spark, sf_dir)
    assert broadcast_count(df) >= 1
    assert shuffle_count(df) == 1


def test_ann_topk_paths_have_no_corpus_window(spark, sf_dir, queries):
    """The round-5 contract: every corpus-sized constant-key ranking
    runs through operators/topk.grouped_topk (MapInPandas partial heap
    + bounded agg). A Window reappearing over the scored candidate set
    in these queries is the 9.1x-super-linear hot-key shape the window
    skew probe measured — fail loudly."""
    from change_data_capture_poc_spark.plans import formatted_plan

    for name in (
        "ann_cosine_bruteforce",
        "ann_cosine_ivf_partition",
        "ann_cosine_lsh_hyperplane",
        "eval_ann_recall",
        "eval_matryoshka_trunc_recall",
    ):
        plan = formatted_plan(queries[name].fn(spark, sf_dir))
        assert "MapInPandas" in plan, name
        assert "Window" not in plan, name


def test_cdc_net_effect_single_shuffle(spark, sf_dir, queries):
    """Net-effect compaction is one hash shuffle on the CDC key with
    map-side min_by/max_by partials — the batch collapses before the
    downstream MERGE ever sees it."""
    df = queries["cdc_net_effect_compaction"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_snapshot_diff_single_state_shuffle(spark, sf_dir, queries):
    """Both snapshot states fold into ONE conditional-max_by
    aggregation: exchanges = the user_id agg + the single-row T1
    scalar — no full-outer join, no second state aggregation."""
    df = queries["snapshot_diff_changes"].fn(spark, sf_dir)
    assert shuffle_count(df) == 2


def test_table_checksum_single_shuffle(spark, sf_dir, queries):
    df = queries["table_checksum"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_incremental_merge_no_extra_exchange(spark, sf_dir, queries):
    """The merge re-aggregate sits directly on the union of the two
    co-partitioned partial aggregates — exchanges are the 2 partials
    + 2 T1 scalar single-rows (dedup'd by exchange reuse at runtime),
    and crucially none for the merge itself."""
    df = queries["incremental_agg_merge"].fn(spark, sf_dir)
    assert shuffle_count(df) <= 4


def test_fuzzy_join_blocks_on_vocab(spark, sf_dir, queries):
    """The quadratic comparison runs on the aggregated name vocabulary
    and broadcasts: one data-sized shuffle (the vocab agg), and the
    self-join side is a broadcast, not a shuffle."""
    df = queries["fuzzy_join_levenshtein"].fn(spark, sf_dir)
    assert broadcast_count(df) >= 1
    assert shuffle_count(df) <= 2


def test_events_ema_single_shuffle(spark, sf_dir, queries):
    df = queries["events_ema"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_bloom_prefilter_broadcasts_modset(spark, sf_dir, queries):
    """The hash-domain bitmap is a broadcast (never a shuffle), and
    the plan keeps the exact semi-join — prefilter plus verification,
    the two-phase runtime-filter shape."""
    df = queries["join_bloom_prefiltered"].fn(spark, sf_dir)
    assert broadcast_count(df) >= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") == 2  # prefilter + exact verification
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_unpartitioned_window_attribution(spark, sf_dir, queries):
    """The single-partition-window detector attributes an Exchange
    SinglePartition to a Window ONLY when it feeds the window's own
    Sort child. A 1-row global aggregate sitting on a join's build
    side below a doc_id-keyed window is NOT that window's input
    distribution (the round-7 PLANS.md misreport)."""
    from pyspark.sql import Window, functions as F

    from change_data_capture_poc_spark.plans import unpartitioned_window_count

    df = spark.range(1000).withColumn("k", (F.col("id") % 10).cast("int"))

    # Truly global window: required distribution AllTuples -> counts 1.
    w_global = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert unpartitioned_window_count(w_global) == 1

    # Key-partitioned window: hash exchange on k -> counts 0.
    w_keyed = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert unpartitioned_window_count(w_keyed) == 0

    # Key-partitioned window over a join whose BUILD side holds a
    # single-row global aggregate (Exchange SinglePartition in the
    # window's subtree, but not on its distribution path) -> counts 0.
    n = df.agg(F.count("*").alias("n"))
    joined = df.crossJoin(F.broadcast(n))
    w_mixed = joined.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert unpartitioned_window_count(w_mixed) == 0

    # The three round-7 misreported queries: corpus-keyed windows,
    # zero single-partition window inputs.
    for name in ("text_tfidf_top_terms", "text_vocab_coverage_curve", "text_zipf_fit"):
        assert unpartitioned_window_count(queries[name].fn(spark, sf_dir)) == 0, name


def test_unpartitioned_window_counts_reused_exchange(spark):
    """Round-8 advice: a Window fed through exchange REUSE still moves
    all data — 'ReusedExchange [...], Exchange SinglePartition' is a
    leaf whose text embeds the shared exchange, and must count. Two
    identical global windows sharing one exchange -> 2, not 1.
    (Reuse only materializes in the pre-execution plan string with AQE
    off; with AQE on it appears as a runtime ReusedQueryStage.)"""
    from pyspark.sql import Window, functions as F

    from change_data_capture_poc_spark.plans import unpartitioned_window_count

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.range(1000)
        a = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
        u = a.union(a)
        plan = u._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan, "precondition: reuse fired"
        assert unpartitioned_window_count(u) == 2

        # And the exact-name chain match: a Window directly over a
        # SortMergeJoin must NOT walk through it ('Sort' prefix-matching
        # 'SortMergeJoin' was the round-8 hole) — the join owns its
        # exchanges, count 0.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l = spark.range(500).withColumn("k", (F.col("id") % 7).cast("int"))
        r = spark.range(300).withColumn("k", (F.col("id") % 7).cast("int"))
        j = l.join(r, "k")
        w = j.withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy(l["id"]))
        )
        jplan = w._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in jplan, "precondition: SMJ planned"
        assert unpartitioned_window_count(w) == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_envelope_log_between_prunes_partitions(spark, tmp_path):
    """SURVEY §4 action item: the date-bounded log scan must prune at
    the DIRECTORY level on the landed year=/month=/day= JSON layout —
    PartitionFilters non-empty, and the out-of-window day's rows never
    surface (value check) nor its directory get scanned (the partition
    count in the plan's listing)."""
    from change_data_capture_poc_spark.cdc.envelope import PRODUCT_FIELDS
    from change_data_capture_poc_spark.cdc.generator import CdcGenerator
    from change_data_capture_poc_spark.sources.readers import (
        read_envelope_log_between,
    )
    from change_data_capture_poc_spark.plans import formatted_plan
    from change_data_capture_poc_spark.sources.writers import (
        write_partitioned_json,
    )
    import pyspark.sql.functions as F

    # Three distinct days of envelopes: shift ts_ms by 0/1/2 days.
    base = CdcGenerator(seed=11).products_df(spark, num_records=30)
    day_ms = 86_400_000
    spread = base.withColumn(
        "payload",
        F.col("payload").withField(
            "ts_ms",
            F.col("payload.ts_ms") % F.lit(day_ms)  # fold into day 0
            + F.lit(1_700_000_000_000)              # 2023-11-14 base
            + (F.col("payload.after.id") % 3) * F.lit(day_ms),
        ),
    )
    log = str(tmp_path / "landed")
    write_partitioned_json(spread, log)

    df = read_envelope_log_between(
        spark, log, PRODUCT_FIELDS, "2023-11-15", "2023-11-16"
    )
    plan = formatted_plan(df)
    pf = [
        line.split(":", 1)[1].strip()
        for line in plan.splitlines()
        if line.strip().startswith("PartitionFilters")
    ]
    assert pf and pf[0] not in ("[]", ""), plan
    assert "make_date" in pf[0]

    # Value check: exactly the two in-window days' rows.
    got_n = df.count()
    in_window = spread.where((F.col("payload.after.id") % 3).isin(1, 2))
    assert got_n == in_window.count()
    assert got_n > 0
    # Directory-level: the executed scan reads 2 of the 3 day dirs.
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "year=2023/month=11/day=14" not in executed


def test_round8_plan_shapes(spark, sf_dir, queries):
    """Round-8 operators keep their stated scale shapes: no cartesian
    product anywhere (BroadcastNestedLoopJoin against literal
    quota/quantile frames of a few rows is the sanctioned tiny-side
    shape), bounded shuffle budgets, and zero single-partition
    windows."""
    from change_data_capture_poc_spark.plans import (
        formatted_plan,
        plan_ops,
        shuffle_count,
        unpartitioned_window_count,
    )

    for name, max_shuffles in (
        ("agg_histogram_quantile_portable", 6),
        ("multimodal_scene_segmentation", 2),
        ("range_join_interval_overlap", 2),
        ("agg_selfjoin_size_f2_sketch", 4),
        ("asof_join_nearest_events", 3),
    ):
        df = queries[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        ops = plan_ops(df, plan)
        assert not any("CartesianProduct" in o for o in ops), name
        assert shuffle_count(df, plan) <= max_shuffles, (
            name, shuffle_count(df, plan),
        )
        assert unpartitioned_window_count(df) == 0, name


def test_url_canonical_plan_shape(spark, sf_dir, queries):
    """URL dedup: the scan reads ONLY doc_id (synthesis is derived),
    no Python anywhere, and the plan is the two-level pre-aggregated
    count-distinct shape — (canon,raw) agg, canon agg, order-by range
    exchange — with map-side partials before both agg exchanges."""
    df = queries["dedup_url_canonical"].fn(spark, sf_dir)
    rs = read_schemas(df)
    assert len(rs) == 1 and "doc_id" in rs[0] and "text" not in rs[0]
    assert shuffle_count(df) == 3
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_bloom_paragraph_plan_shape(spark, sf_dir, queries):
    """Paragraph Bloom dedup: paragraph TEXT never enters an exchange
    (md5 keys only), the bounded bit-min table broadcasts, and no
    Python crosses the plan."""
    df = queries["dedup_bloom_paragraph"].fn(spark, sf_dir)
    rs = read_schemas(df)
    assert all("doc_id" in s for s in rs)
    # keeper agg (gh), bit-min agg (bit), fp agg (gh), flag join (gh),
    # per-doc rollup — exchange count must not grow past the algebra.
    assert shuffle_count(df) <= 6
    assert broadcast_count(df) >= 1  # bit_min rides a broadcast
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan

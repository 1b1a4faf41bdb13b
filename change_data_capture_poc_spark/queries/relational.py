"""Relational operator surface (SURVEY.md §2.2-§2.7) over the driver's
TPC-H-ish testdata — each query a (DataFrame, DuckDB-oracle) pair.

The reference delegates all relational execution to DuckDB; this module
IS the engine's analytics layer, expressed declaratively so Catalyst
gets predicate pushdown, column pruning, join selection and AQE for
free (SURVEY.md §4). Double-valued aggregates are rounded on both sides
— summation order differs between engines and exact float equality
across partial-aggregation trees is not meaningful.

Scale notes inline: small dimensions are broadcast, fact-fact joins
shuffle on their keys, every filter is expressed before the join it
feeds so pushdown reaches the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table
from change_data_capture_poc_spark.functions.windows import global_window
from change_data_capture_poc_spark.functions.hints import vocab_broadcast


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# Scans / filters / projections (P2, P6-P8, P10, S6)
# --------------------------------------------------------------------

@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS disc_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-06-01' AND l_quantity > 30.0
    """,
    doc="Parquet scan with pushed-down filter + pruned projection; "
        "explain() must show PushedFilters + 4-column ReadSchema.",
)
def scan_filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") < "1997-06-01") & (F.col("l_quantity") > 30.0)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "disc_price"
        ),
    )


@register(
    "select_star_passthrough",
    oracle="SELECT * FROM region",
    doc="P10: SELECT * passthrough (view-body shape, scd2_example.sql:11).",
)
def select_star_passthrough(spark, sf_dir):
    return _t(spark, sf_dir, "region").select("*")


# --------------------------------------------------------------------
# Aggregations (§2.4 + analytics layer)
# --------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: grouped multi-aggregate; map-side partial agg "
        "then one shuffle on the (tiny) group key.",
)
def pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) — two-phase exact distinct aggregation.",
)
def distinct_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (subtotals + grand total).",
)
def rollup_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets.",
)
def cube_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "pivot_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(l_quantity) FILTER (l_linestatus = 'O'), 0), 2) AS qty_O,
           ROUND(COALESCE(SUM(l_quantity) FILTER (l_linestatus = 'F'), 0), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot via conditional aggregation (stays in one agg pass).",
)
def pivot_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.coalesce(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), F.lit(0.0)), 2
        ).alias("qty_O"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), F.lit(0.0)), 2
        ).alias("qty_F"),
    )


# --------------------------------------------------------------------
# Joins (§2.3: J1-J3 + full surface)
# --------------------------------------------------------------------

@register(
    "join_inner_dim",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Inner equi-join fact→dim; dim is broadcast (no fact shuffle).",
)
def join_inner_dim(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        # bounded: nation is a CONSTANT 25-row dim
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS spend
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join with extra join-side predicate (J1 shape: "
        "ON-clause theta conditions) + null-respecting aggregates.",
)
def join_left_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J2: NOT EXISTS → left_anti join (customers with no orders); "
        "Catalyst decorrelates the reference's correlated subquery "
        "(init_duckdb.sh:48-53) to exactly this plan.",
)
def join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    )
    """,
    doc="J3: IN-subquery → left_semi join (init_duckdb.sh:59-68 shape).",
)
def join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_theta",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate
    FROM orders o
    LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND o.o_orderdate <= l.l_shipdate
    WHERE l.l_orderkey IS NULL
    """,
    doc="J1: left join with theta predicate used as anti-join — "
        "'orders with no lineitem shipped on/after the order date' "
        "(duckdb/analytics/scd2.sql:8-12 shape).",
)
def join_anti_theta(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (o.o_orderdate <= li.l_shipdate)
    return o.join(li, cond, "left_anti").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
      ON c.c_custkey = o.o_custkey
    """,
    doc="Full outer join with unmatched rows on both sides.",
)
def join_full_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0)
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Cross join (dims only — never cross-join facts at scale).",
)
def join_cross(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join. Dims broadcast; the only "
        "shuffles are fact-fact on orderkey — at 100 TB the lineitem/"
        "orders join dominates and AQE handles skew.",
)
def local_supplier_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        # corpus-derived: supplier is a SCALING dim (SF x 10k rows) —
        # gated so an oversized deployment degrades to a shuffle join
        # (spark.graft.vocab.broadcast=false) instead of hard-failing.
        li.join(vocab_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        # bounded: nation/region are CONSTANT dims (25/5 rows)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------
# Windows (§2.5) beyond the SCD2 ones
# --------------------------------------------------------------------

@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend
    FROM orders
    """,
    doc="Running total per key — explicit ROWS frame.",
)
def window_running_sum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_rank_topn_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
    doc="Top-N per group via RANK — the scalable alternative to a "
        "global sort when N*groups << rows.",
)
def window_rank_topn_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
        ).where(F.col("rnk") <= 3)
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id, value,
           ROUND(value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY event_id), 6) AS delta
    FROM events
    """,
    doc="LAG-based per-key delta (change detection, P8 shape).",
)
def window_lag_delta(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


# --------------------------------------------------------------------
# Sorts / limits (§2.6)
# --------------------------------------------------------------------

@register(
    "order_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="O1/O2: global top-K — Spark plans TakeOrderedAndProject "
        "(per-partition heap + driver merge), no full sort.",
)
def order_limit_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# Set operations (§2.7)
# --------------------------------------------------------------------

@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="UNION (distinct) of two key sets.",
)
def set_union_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT (customers with both open and finished orders).",
)
def set_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="EXCEPT — set-difference formulation of the anti-join. "
        "DataFrame.subtract IS SQL's EXCEPT-DISTINCT; the previous "
        "exceptAll().distinct() was bag-difference-then-dedup, which "
        "KEEPS a key occurring more often on the left than the right "
        "where EXCEPT drops it (latent on unique c_custkey, wrong in "
        "general).",
)
def set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.select(F.col("c_custkey").alias("custkey")).subtract(
        o.select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "set_union_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) GROUP BY custkey
    """,
    doc="UNION ALL (bag union, duplicates preserved) — aggregated so "
        "the multiplicity itself is oracle-checked.",
)
def set_union_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.unionAll(b).groupBy("custkey").agg(F.count("*").alias("n"))


@register(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_returnflag, metric, ROUND(SUM(value), 4) AS total
    FROM (SELECT l_returnflag, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem)
         UNPIVOT (value FOR metric IN
                  (l_quantity, l_extendedprice, l_discount, l_tax))
    GROUP BY l_returnflag, metric
    """,
    doc="UNPIVOT (wide -> long melt): four measure columns become "
        "(metric, value) rows, aggregated per return flag - the "
        "inverse of pivot_agg and the standard shape for feeding "
        "generic metric pipelines. Unpivot is a zero-shuffle "
        "projection (row expansion); the only exchange is the "
        "final aggregation.",
)
def unpivot_lineitem_metrics(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
    return melted.groupBy("l_returnflag", "metric").agg(
        F.round(F.sum("value"), 4).alias("total")
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="RIGHT OUTER join (completes the join-type matrix with "
        "inner/left/full/cross/semi/anti): every customer survives, "
        "orderless ones count zero. Catalyst plans it as the mirrored "
        "left join with the dim broadcast.",
)
def join_right_outer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "right_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(q AS INT) AS q,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice) + 1e-9, 6) AS lo_price,
           ROUND(MAX(o_totalprice) + 1e-9, 6) AS hi_price
    FROM (
        SELECT o_orderpriority, o_totalprice,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS q
        FROM orders
    )
    GROUP BY o_orderpriority, q
    """,
    doc="NTILE(4) quartile bucketing per priority class, reduced to "
        "per-bucket count/min/max. One hash-partition window exchange "
        "on o_orderpriority (5 groups) then a partial-agg groupBy; the "
        "o_orderkey tiebreak makes bucket boundaries deterministic "
        "across engines. At 100 TB the priority partitions are large "
        "but ntile is a single sort per partition — same shape as any "
        "ranking window, and AQE splits skewed partitions.",
)
def window_ntile_quartiles(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).cast("int").alias("q"),
        )
        .groupBy("o_orderpriority", "q")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice") + F.lit(1e-9), 6).alias("lo_price"),
            F.round(F.max("o_totalprice") + F.lit(1e-9), 6).alias("hi_price"),
        )
    )


@register(
    "agg_exact_median",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(quantile_cont(l_quantity, 0.5) + 1e-9, 6) AS med_qty,
           ROUND(quantile_cont(l_extendedprice, 0.25) + 1e-9, 6) AS q25_price,
           ROUND(quantile_cont(l_extendedprice, 0.75) + 1e-9, 6) AS q75_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="EXACT grouped median / quartiles (vs the sketch-based "
        "agg_approx_sketches): Spark percentile() == DuckDB "
        "quantile_cont() — both linear-interpolation exact. Exact "
        "percentiles need the full value multiset per group, so this "
        "is the expensive truth path you run on samples or small "
        "groups; the 100 TB default is the t-digest sketch in "
        "agg_approx_sketches. Rounding epsilon bridges half-up vs "
        "half-even ties on the interpolated midpoints.",
)
def agg_exact_median(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(l_quantity, 0.5)") + F.lit(1e-9), 6).alias(
            "med_qty"
        ),
        F.round(
            F.expr("percentile(l_extendedprice, 0.25)") + F.lit(1e-9), 6
        ).alias("q25_price"),
        F.round(
            F.expr("percentile(l_extendedprice, 0.75)") + F.lit(1e-9), 6
        ).alias("q75_price"),
    )


@register(
    "agg_listagg_top",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS c
        FROM documents GROUP BY source, lang
    ),
    top AS (
        SELECT source, lang AS top_lang FROM c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY c DESC, lang) = 1
    ),
    l AS (
        SELECT source,
               string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
               COUNT(*) AS n_docs
        FROM documents GROUP BY source
    )
    SELECT l.source, langs, top_lang, n_docs
    FROM l JOIN top USING (source)
    """,
    doc="LISTAGG / STRING_AGG shape plus a per-group mode: sorted "
        "distinct languages as one delimited string per source, and "
        "the most frequent language. Spark's mode() breaks frequency "
        "ties nondeterministically, so the mode is computed as a "
        "count + ROW_NUMBER ranking with a lexicographic tiebreak — "
        "deterministic in both engines. collect_set stays bounded by "
        "group cardinality (5 langs), not data; both aggregations "
        "partial-combine map-side before the one shuffle each.",
)
def agg_listagg_top(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    top = (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    l = d.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias(
            "langs"
        ),
        F.count("*").alias("n_docs"),
    )
    return l.join(top, "source").select(
        "source", "langs", "top_lang", "n_docs"
    )


@register(
    "agg_regression_trend",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch_us(ts) / 86400000000.0)
                 + 1e-9, 4) AS slope_per_day,
           ROUND(regr_intercept(value, epoch_us(ts) / 86400000000.0)
                 / 10000 + 1e-9, 2) AS intercept_scaled,
           ROUND(regr_r2(value, epoch_us(ts) / 86400000000.0)
                 + 1e-9, 6) AS r2
    FROM events
    GROUP BY event_type
    """,
    doc="Per-class least-squares trend (REGR_SLOPE / REGR_INTERCEPT / "
        "REGR_R2) of the value series against time — the drift "
        "detector behind data-freshness monitoring. Single "
        "partial-aggregable pass (the regr_* family reduces to "
        "sum/sum-of-product accumulators, so map-side combine holds "
        "at 100 TB). x is scaled to DAYS so the slope lands in a "
        "numerically robust range for the 4-decimal bridge rounding; "
        "the intercept (extrapolated to epoch day 0, ~55 years out) "
        "is scaled down 1e4 and rounded to 2 decimals because both "
        "engines' float accumulation orders diverge in its low "
        "digits.",
)
def agg_regression_trend(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / F.lit(86400000000.0)
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.regr_slope(F.col("value"), x) + F.lit(1e-9), 4).alias(
            "slope_per_day"
        ),
        F.round(
            F.regr_intercept(F.col("value"), x) / 10000 + F.lit(1e-9), 2
        ).alias("intercept_scaled"),
        F.round(F.regr_r2(F.col("value"), x) + F.lit(1e-9), 6).alias("r2"),
    )


@register(
    "window_time_range_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
           ROUND(SUM(value) OVER w + 1e-9, 6) AS sum_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing-24-hour RANGE window frame (vs the ROWS frames in "
        "window_sliding_frame): the frame is bounded by event-TIME "
        "distance, not row count, so bursty and sparse users get the "
        "same temporal semantics — the rate-limiter / rolling-usage "
        "aggregation. Ordered by integer epoch-µs in both engines so "
        "frame boundaries are exact; ties (equal timestamps) are "
        "RANGE-peers and enter the frame together, which keeps the "
        "result deterministic without a tiebreak. One window "
        "exchange on user_id.",
)
def window_time_range_sum(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_24h"),
        F.round(F.sum("value").over(w) + F.lit(1e-9), 6).alias("sum_24h"),
    )


@register(
    "events_weekly_growth",
    oracle="""
    WITH wk AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, date_trunc('week', ts)
    )
    SELECT event_type, week, n,
           ROUND((n - LAG(n) OVER w) * 100.0 / LAG(n) OVER w + 1e-9, 6)
               AS pct_change
    FROM wk
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
    doc="Week-over-week growth reporting: weekly counts per event "
        "class with LAG percent change — the window-over-aggregate "
        "composition every metrics dashboard runs. The corpus "
        "crosses ONE shuffle (the weekly partial agg); the LAG "
        "window then operates on the classes-x-weeks series, which "
        "is dashboard-sized no matter how big the fact table is. "
        "First week's change is NULL by construction (no prior "
        "period), preserved as NULL in both engines. Both engines "
        "truncate weeks to Monday starts.",
)
def events_weekly_growth(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    wk = e.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return wk.select(
        "event_type",
        "week",
        "n",
        F.round((F.col("n") - prev) * 100.0 / prev + F.lit(1e-9), 6).alias(
            "pct_change"
        ),
    )


@register(
    "join_bloom_prefiltered",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 4)
               AS revenue
    FROM lineitem l
    SEMI JOIN (SELECT o_orderkey FROM orders
               WHERE o_orderpriority = '1-URGENT') hp
      ON l.l_orderkey = hp.o_orderkey
    GROUP BY l.l_returnflag
    """,
    doc="Runtime-filter join, the explicit two-phase form of "
        "Catalyst's injected bloom filter: the build side's keys are "
        "projected onto a fixed 2^16 hash domain (key mod 65536 — a "
        "single-hash Bloom filter whose bitmap is stored exactly as a "
        "broadcast distinct set, at most 64 Ki rows REGARDLESS of "
        "build-side cardinality), the fact table is prefiltered by a "
        "broadcast semi-join on that domain, and the exact semi-join "
        "then removes the hash collisions — so the result equals the "
        "plain semi-join (the oracle) bit-for-bit. At 100 TB the "
        "build side may hold billions of keys (too big to broadcast "
        "exactly), but its hash-domain bitmap stays tiny and cuts "
        "most of the fact rows before the only real shuffle.",
)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    hp = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    domain = 1 << 16
    modset = hp.select((F.col("o_orderkey") % domain).alias("kmod")).distinct()
    pre = lineitem.join(
        # bounded: distinct orderkey mod 2^16 — capped at 65536 rows
        F.broadcast(modset),
        (F.col("l_orderkey") % domain) == F.col("kmod"),
        "left_semi",
    )
    return (
        pre.join(hp, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + F.lit(1e-9),
                4,
            ).alias("revenue"),
        )
    )


@register(
    "partition_boundary_recommendation",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(quantile_cont(o_custkey, 1/16.0) + 1e-9, 6) AS b1,
           ROUND(quantile_cont(o_custkey, 2/16.0) + 1e-9, 6) AS b2,
           ROUND(quantile_cont(o_custkey, 3/16.0) + 1e-9, 6) AS b3,
           ROUND(quantile_cont(o_custkey, 4/16.0) + 1e-9, 6) AS b4,
           ROUND(quantile_cont(o_custkey, 5/16.0) + 1e-9, 6) AS b5,
           ROUND(quantile_cont(o_custkey, 6/16.0) + 1e-9, 6) AS b6,
           ROUND(quantile_cont(o_custkey, 7/16.0) + 1e-9, 6) AS b7,
           ROUND(quantile_cont(o_custkey, 8/16.0) + 1e-9, 6) AS b8,
           ROUND(quantile_cont(o_custkey, 9/16.0) + 1e-9, 6) AS b9,
           ROUND(quantile_cont(o_custkey, 10/16.0) + 1e-9, 6) AS b10,
           ROUND(quantile_cont(o_custkey, 11/16.0) + 1e-9, 6) AS b11,
           ROUND(quantile_cont(o_custkey, 12/16.0) + 1e-9, 6) AS b12,
           ROUND(quantile_cont(o_custkey, 13/16.0) + 1e-9, 6) AS b13,
           ROUND(quantile_cont(o_custkey, 14/16.0) + 1e-9, 6) AS b14,
           ROUND(quantile_cont(o_custkey, 15/16.0) + 1e-9, 6) AS b15
    FROM orders
    """,
    doc="Equi-depth range-partition boundary recommendation: the 15 "
        "interior 16-quantiles of the partition key — exactly what a "
        "planner feeds repartitionByRange/bucketing so every range "
        "split carries ~n/16 rows regardless of key skew. Exact "
        "percentile (Spark percentile == DuckDB quantile_cont, both "
        "linear-interpolation) on the oracle gate; the 100 TB "
        "production path swaps in approx_percentile with the same "
        "output shape. One aggregation, 16 scalar output columns.",
)
def partition_boundary_recommendation(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.expr("percentile(o_custkey, 1/16.0)") + F.lit(1e-9), 6).alias("b1"),
        F.round(F.expr("percentile(o_custkey, 2/16.0)") + F.lit(1e-9), 6).alias("b2"),
        F.round(F.expr("percentile(o_custkey, 3/16.0)") + F.lit(1e-9), 6).alias("b3"),
        F.round(F.expr("percentile(o_custkey, 4/16.0)") + F.lit(1e-9), 6).alias("b4"),
        F.round(F.expr("percentile(o_custkey, 5/16.0)") + F.lit(1e-9), 6).alias("b5"),
        F.round(F.expr("percentile(o_custkey, 6/16.0)") + F.lit(1e-9), 6).alias("b6"),
        F.round(F.expr("percentile(o_custkey, 7/16.0)") + F.lit(1e-9), 6).alias("b7"),
        F.round(F.expr("percentile(o_custkey, 8/16.0)") + F.lit(1e-9), 6).alias("b8"),
        F.round(F.expr("percentile(o_custkey, 9/16.0)") + F.lit(1e-9), 6).alias("b9"),
        F.round(F.expr("percentile(o_custkey, 10/16.0)") + F.lit(1e-9), 6).alias("b10"),
        F.round(F.expr("percentile(o_custkey, 11/16.0)") + F.lit(1e-9), 6).alias("b11"),
        F.round(F.expr("percentile(o_custkey, 12/16.0)") + F.lit(1e-9), 6).alias("b12"),
        F.round(F.expr("percentile(o_custkey, 13/16.0)") + F.lit(1e-9), 6).alias("b13"),
        F.round(F.expr("percentile(o_custkey, 14/16.0)") + F.lit(1e-9), 6).alias("b14"),
        F.round(F.expr("percentile(o_custkey, 15/16.0)") + F.lit(1e-9), 6).alias("b15"),
    )


@register(
    "events_rolling_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE user_id IS NOT NULL
    ),
    contrib AS (
        SELECT DISTINCT user_id, d + CAST(r.i AS INTEGER) AS window_end
        FROM ud, (SELECT unnest(range(0, 7)) AS i) r
    )
    SELECT window_end,
           CAST(COUNT(*) AS BIGINT) AS wau
    FROM contrib
    GROUP BY window_end
    ORDER BY window_end
    """,
    doc="Rolling 7-day active users (the WAU/MAU dashboard family): "
        "sliding COUNT(DISTINCT) is not a window frame either engine "
        "supports, so each (user, day) activity pair is exploded to "
        "the 7 window-ends it contributes to and deduplicated — the "
        "scalable reformulation of a sliding distinct. Shuffle "
        "budget: distinct pairs, distinct contributions, final "
        "count — each keyed and map-side-partial; the 7x explode is "
        "bounded by the window length, never the corpus.",
)
def events_rolling_wau(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    ud = (
        events.where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    days = spark.range(0, 7).select(F.col("id").cast("int").alias("i"))
    contrib = (
        # bounded: 7-row literal day range
        ud.crossJoin(F.broadcast(days))
        .select("user_id", F.date_add("d", F.col("i")).alias("window_end"))
        .distinct()
    )
    return (
        contrib.groupBy("window_end")
        .agg(F.count(F.lit(1)).alias("wau"))
        .orderBy("window_end")
    )


@register(
    "orders_open_backlog_curve",
    oracle="""
    WITH span AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d0,
               CAST(MAX(l.l_shipdate) AS DATE) AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT d0 AS day, 1 AS delta FROM span
        UNION ALL
        SELECT d1 + INTERVAL 1 DAY, -1 FROM span
    ),
    byday AS (SELECT day, SUM(delta) AS d FROM deltas GROUP BY day)
    SELECT CAST(day AS DATE) AS day,
           CAST(SUM(d) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS open_orders
    FROM byday
    """,
    doc="Concurrent-interval counting: how many orders are OPEN "
        "(placed, not yet fully shipped) on each day — the classic "
        "backlog/occupancy curve (staffing, capacity, WIP limits). "
        "The naive per-day interval join is quadratic; this plan "
        "emits +1/-1 boundary deltas per order, aggregates per day, "
        "and prefix-sums over the DAY axis — which is bounded by the "
        "calendar (~2.5k rows for TPC-H's 7 years), not by data "
        "volume, so the running-sum window never sees the fact "
        "table. One join + two agg shuffles at corpus scale.",
)
def orders_open_backlog_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    span = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").cast("date").alias("d1"))
    )
    deltas = span.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).alias("delta"),
    ).unionByName(
        span.select(
            F.date_add(F.col("d1"), 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    byday = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    w = global_window("day").rowsBetween(Window.unboundedPreceding, 0)
    return byday.select(
        F.col("day").cast("date").alias("day"),
        F.sum("d").over(w).cast("long").alias("open_orders"),
    )

"""Spark SQL surface — queries authored as SQL strings over registered
views (the reference's BI read path: Superset issuing ad-hoc SQL against
the SCD2 table, README.md:335-345; views per scd2_example.sql:10-14).

Same engine, same Catalyst plans as the DataFrame API — these exist to
prove the SQL entry point end-to-end and to cover classic warehouse
query shapes (TPC-H Q3/Q10/Q18 analogues restricted to the driver
schema's columns). The oracle SQL is near-identical by construction;
divergences are only dialect-level (casts, date functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from change_data_capture_poc_spark.functions.hints import (
    vocab_broadcast_enabled,
)
from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "sql_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q3 shape (shipping priority): segment filter pushed to "
        "the customer scan, both joins broadcast (dims after filter), "
        "single agg shuffle, global top-20 via TakeOrdered.",
)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 20
        """
    )


@register(
    "sql_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item revenue by customer/nation): "
        "fact filtered on returnflag at the scan, dims broadcast.",
)
def sql_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """
    )


@register(
    "sql_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_totalprice, big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 25
    """,
    doc="TPC-H Q18 shape (large-quantity orders): pre-aggregated "
        "HAVING subquery joined back to orders/customer — the agg "
        "shuffle happens on the already-reduced key set.",
)
def sql_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        WITH big AS (
            SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        )
        SELECT c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.total_qty
        FROM big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 25
        """
    )


@register(
    "sql_avg_acctbal_subquery",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_above,
           ROUND(AVG(c_acctbal), 4) AS avg_bal_above
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_nationkey
    """,
    doc="Scalar subquery (TPC-H Q22 flavor): uncorrelated scalar "
        "average computed once and reused as a filter bound.",
)
def sql_avg_acctbal_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_above,
               ROUND(AVG(c_acctbal), 4) AS avg_bal_above
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        GROUP BY c_nationkey
        """
    )


@register(
    "sql_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates to a "
        "left-semi join (RewritePredicateSubquery), the same plan the "
        "reference's NOT EXISTS merge relies on (init_duckdb.sh:48-53).",
)
def sql_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "sql_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape: join + conditional-CASE aggregation (the "
        "pivot-free pivot).",
)
def sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "sql_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0 END) /
                 SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: broadcast dim join + conditional ratio "
        "aggregate with LIKE prefix predicate.",
)
def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END) /
                     SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
        """
    )


@register(
    "sql_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive ranges across both "
        "join sides — exercises OR-predicate handling after the join "
        "(common-factor extraction can't fully push it down).",
)
def sql_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
        """
    )


@register(
    "sql_nation_volume_pairs",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (cross-nation shipping volume): the nation dim "
        "joins TWICE under different roles (supplier's vs customer's "
        "nation) with an inequality between the two join results — "
        "self-join aliasing through a 6-relation plan.",
)
def sql_nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        """
    )


@register(
    "sql_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated on the "
        "same relation — Catalyst must decorrelate one to a left-semi "
        "and one to a left-anti join against lineitem.",
)
def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        """
    )


_Q17_SQL = """
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "sql_small_qty_revenue",
    oracle=_Q17_SQL,
    doc="TPC-H Q17 shape (small-quantity-order revenue): correlated "
        "scalar AVG subquery on the join key. The oracle keeps the "
        "textbook correlated form; the engine plan applies the "
        "classic Q17 rewrite — the correlated average only ever "
        "matters for the ONE brand's partkeys, so lineitem is first "
        "reduced by a broadcast semi-join against the brand-filtered "
        "part slice (a ~1/|brands| cut), and the per-partkey AVG "
        "aggregates that reduced stream instead of the whole fact. "
        "Semantically identical (the final join restricted the avg's "
        "consumers to those partkeys anyway); at 100 TB the agg "
        "shuffle shrinks by the brand selectivity, and the round-10 "
        "probe's 18x shuffle-byte flip (full-lineitem agg falling out "
        "of broadcast) disappears because the full fact never enters "
        "an exchange.",
)
def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "part")
    # bp is part-DERIVED (grows with scale factor, ~1/|brands| of
    # part); the hint is gated on the same flag as the vocab
    # broadcasts so an oversized deployment degrades to a shuffle
    # join via config, not a query edit (functions/hints.py).
    hint = "/*+ BROADCAST(bp) */" if vocab_broadcast_enabled(spark) else ""
    return spark.sql(f"""
        WITH bp AS (
            SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
        ),
        li AS (
            SELECT {hint}
                   l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            JOIN bp ON bp.p_partkey = l.l_partkey
        ),
        avgq AS (
            SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
            FROM li GROUP BY l_partkey
        )
        SELECT ROUND(SUM(li.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM li
        JOIN avgq ON avgq.l_partkey = li.l_partkey
        WHERE li.l_quantity < avgq.half_avg
    """)


_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total_revenue, 4) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
"""


@register(
    "sql_top_supplier_revenue",
    oracle=_Q15_SQL,
    doc="TPC-H Q15 shape (top supplier by period revenue): CTE "
        "aggregate reused twice — once joined to supplier, once reduced "
        "to its scalar MAX. The date filter pushes to the lineitem "
        "scan; the supplier join side is tiny and broadcasts.",
)
def sql_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


_Q11_SQL = """
    SELECT n.n_name, ROUND(SUM(c.c_acctbal), 4) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING SUM(c.c_acctbal) > (SELECT SUM(c_acctbal) * 0.04 FROM customer)
    ORDER BY total_bal DESC, n_name
"""


@register(
    "sql_nation_balance_share",
    oracle=_Q11_SQL,
    doc="TPC-H Q11 shape (important stock): HAVING against an "
        "uncorrelated scalar subquery over the same fact — the global "
        "sum is computed once, broadcast as a literal into the "
        "post-aggregation filter.",
)
def sql_nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "nation")
    return spark.sql(_Q11_SQL)


_Q2_SQL = """
    SELECT p.p_type, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT MIN(p2.p_retailprice)
        FROM part p2
        WHERE p2.p_type = p.p_type)
    ORDER BY p.p_type, p.p_partkey
"""


@register(
    "sql_min_cost_part_per_type",
    oracle=_Q2_SQL,
    doc="TPC-H Q2 shape (minimum-cost supplier, restricted to the "
        "part table): correlated MIN subquery on the grouping "
        "attribute, decorrelated by Catalyst into a per-type MIN "
        "aggregate joined back on (type, price).",
)
def sql_min_cost_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "part")
    return spark.sql(_Q2_SQL)


_Q22_SQL = """
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 600000)
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
"""


@register(
    "sql_dormant_rich_customers",
    oracle=_Q22_SQL,
    doc="TPC-H Q22 shape (global sales opportunity): scalar AVG "
        "subquery filter + NOT EXISTS anti-join against a filtered "
        "fact, then segment rollup. The anti-join shuffles on custkey; "
        "the scalar average broadcasts.",
)
def sql_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


_Q20_SQL = """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > (
                SELECT AVG(q)
                FROM (SELECT SUM(l_quantity) AS q
                      FROM lineitem GROUP BY l_suppkey) t))
      AND s.s_nationkey IN (
            SELECT n.n_nationkey
            FROM nation n
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('EUROPE', 'ASIA'))
    ORDER BY s.s_suppkey
"""


@register(
    "sql_heavy_suppliers_nested_in",
    oracle=_Q20_SQL,
    doc="TPC-H Q20 shape (potential part promotion): two IN "
        "semijoins, one of whose subqueries nests a scalar subquery "
        "inside its HAVING (above-average shipped volume). Both IN "
        "lists are small (supplier-grain) and broadcast as semi-join "
        "build sides.",
)
def sql_heavy_suppliers_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "supplier", "lineitem", "nation", "region")
    return spark.sql(_Q20_SQL)


_Q6_SQL = """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 24
"""


@register(
    "sql_forecast_revenue",
    oracle=_Q6_SQL,
    doc="TPC-H Q6 shape (forecast revenue change): the canonical "
        "scan-heavy filter + single aggregate. All three predicates "
        "push to the parquet reader; zero joins, one partial+final "
        "agg — the query whose cost IS the scan at 100 TB.",
)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


_Q9_SQL = """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year
"""


@register(
    "sql_nation_profit",
    oracle=_Q9_SQL,
    doc="TPC-H Q9 shape (product-type profit, restricted to the "
        "driver's tables): fact joined through two broadcast dims, "
        "grouped by (nation, year). The year extraction happens "
        "post-join on the fact column; one agg shuffle.",
)
def sql_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q9_SQL)


_Q13_SQL = """
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register(
    "sql_order_count_distribution",
    oracle=_Q13_SQL,
    doc="TPC-H Q13 shape (customer distribution): LEFT join with a "
        "join-condition filter (not a WHERE — zero-order customers "
        "must survive), then a second aggregation OVER the first's "
        "result (distribution of counts). Two agg shuffles by "
        "construction.",
)
def sql_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL)


_Q8_SQL = """
    WITH volumes AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
               n.n_name AS supp_nation,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS volume
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY o_year, supp_nation
    )
    SELECT o_year, supp_nation,
           ROUND(volume / SUM(volume) OVER (PARTITION BY o_year), 6)
               AS market_share
    FROM volumes
    ORDER BY o_year, supp_nation
"""


@register(
    "sql_market_share",
    oracle=_Q8_SQL,
    doc="TPC-H Q8 shape (national market share): per-(year, nation) "
        "volume divided by the year's total via a window OVER the "
        "aggregate — share-of-supergroup, one agg shuffle + one "
        "window exchange on year.",
)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    return spark.sql(_Q8_SQL)


@register(
    "sql_partsupp_counts",
    oracle="""
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size >= 25
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape over the reduced schema (lineitem stands in "
        "for partsupp): grouped DISTINCT supplier counts with a "
        "NOT IN anti-subquery and dim predicates. Exercises "
        "Catalyst's null-aware anti-join planning for NOT IN (the "
        "subquery side is a broadcast null-aware anti join — NOT IN "
        "over a nullable column is the classic correctness trap) "
        "plus distinct-aggregate expansion. Part dim broadcasts; "
        "the distinct count shuffles once on the group keys.",
)
def sql_partsupp_counts(spark, sf_dir):
    _view(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_size >= 25
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type
        """
    )

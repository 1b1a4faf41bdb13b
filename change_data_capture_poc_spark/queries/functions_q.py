"""Scalar-function and windowing breadth (SURVEY.md §2.9 + engine
surface beyond the reference's minimal set).

The reference itself calls only json_extract/CAST/COALESCE/CASE/
to_timestamp (§2.9); a usable analytics engine needs the full scalar
surface, so every family gets an oracle-checked query here: strings,
dates, math, window frames, distribution windows, grouping sets, and
time-bucketed rollups. All built-ins — whole-stage-codegen'd, no UDFs.

Rounding-tie rule: columns produced by DIVISION BY SMALL INTEGERS
(avg, percent_rank, cume_dist) systematically land on exact .xxxxx5
halves, where Spark rounds half-up but DuckDB rounds half-even —
so those ROUNDs add 1e-9 on BOTH sides, pushing the half-way points
off the boundary identically in each engine (surfaced by the sf0.1
sweep; sums of many-decimal doubles don't have this failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_mktsegment) AS lo,
           substr(c_name, 1, 8) AS pre,
           length(c_name) AS len,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           replace(c_name, '#', '-') AS repl,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           reverse(c_mktsegment) AS rev,
           strpos(c_name, '#') AS hash_pos,
           split_part(c_name, '#', 1) AS first_part,
           regexp_replace(c_name, '[0-9]+', 'N') AS digits_masked,
           starts_with(c_name, 'Customer') AS is_cust,
           contains(c_mktsegment, 'BUILD') AS has_build
    FROM customer
    """,
    doc="String function surface: case, substring, length, trim, "
        "concat, replace, pad, reverse, find, split, regex replace, "
        "prefix/contains predicates.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.length("c_name").alias("len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "trimmed"
        ),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("first_part"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("digits_masked"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_cust"),
        F.contains(F.col("c_mktsegment"), F.lit("BUILD")).alias("has_build"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due,
           date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE)) AS days_since_95,
           dayofweek(o_orderdate) AS dow,
           quarter(o_orderdate) AS q,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    doc="Date/time function surface: extraction, truncation, interval "
        "arithmetic, day difference, day-of-week, quarter, last_day, "
        "formatting. DuckDB dayofweek is 0-based Sunday; Spark dayofweek "
        "is 1-based Sunday — bridged with -1.",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("due"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast(
            "long"
        ).alias("days_since_95"),
        (F.dayofweek(d) - 1).alias("dow"),
        F.quarter(d).alias("q"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS adev,
           round(l_extendedprice, 1) AS rp,
           CAST(floor(l_quantity) AS DOUBLE) AS fq,
           CAST(ceil(l_quantity / 7) AS DOUBLE) AS cq,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(ln(l_extendedprice + 1), 6) AS lg,
           round(log10(l_extendedprice + 1), 6) AS l10,
           round(pow(1 + l_discount, 3), 6) AS p3,
           CAST(l_orderkey % 97 AS BIGINT) AS m97,
           sign(l_discount - 0.05) AS sg,
           greatest(l_tax, l_discount) AS g,
           least(l_tax, l_discount) AS le
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
    doc="Math function surface: abs, round, floor/ceil, sqrt, ln, "
        "log10, pow, mod, sign, greatest/least.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("adev"),
        F.round("l_extendedprice", 1).alias("rp"),
        F.floor("l_quantity").cast("double").alias("fq"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("cq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("lg"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("l10"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("p3"),
        (F.col("l_orderkey") % 97).alias("m97"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        F.greatest("l_tax", "l_discount").alias("g"),
        F.least("l_tax", "l_discount").alias("le"),
    )


@register(
    "window_sliding_frame",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 + 1e-9, 6) AS mov_avg,
           MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
               AS mov_max,
           COUNT(value) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
               AS mov_n
    FROM events
    """,
    doc="Sliding ROWS frame: 4-event moving average/max/count per key — "
        "explicit frame specs beyond the reference's default frames.",
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w) + 1e-9, 6).alias("mov_avg"),
        F.max("value").over(w).alias("mov_max"),
        F.count("value").over(w).alias("mov_n"),
    )


@register(
    "map_funcs",
    oracle="""
    WITH m AS (
        SELECT c_custkey,
               MAP(['seg', 'nat'],
                   [c_mktsegment, CAST(c_nationkey AS VARCHAR)]) AS mp
        FROM customer
    )
    SELECT c_custkey,
           CAST(cardinality(mp) AS BIGINT) AS n_keys,
           map_extract(mp, 'seg')[1] AS seg,
           map_extract(mp, 'nat')[1] AS nat_str,
           array_to_string(list_sort(map_keys(mp)), ',') AS keys_str,
           array_to_string(list_sort(map_values(mp)), ',') AS vals_str
    FROM m
    """,
    doc="Map-type scalar surface: construction (create_map), "
        "cardinality, key lookup (element_at), map_keys/map_values — "
        "the complex-type family the CDC payloads' key/value property "
        "bags map onto (Debezium source blocks are exactly this "
        "shape). Keys/values emit as SORTED joined strings so the "
        "cross-engine comparison is order-insensitive where map "
        "iteration order is unspecified.",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    mp = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"),
        F.lit("nat"), F.col("c_nationkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        F.size(mp).cast("long").alias("n_keys"),
        F.element_at(mp, F.lit("seg")).alias("seg"),
        F.element_at(mp, F.lit("nat")).alias("nat_str"),
        F.array_join(F.array_sort(F.map_keys(mp)), ",").alias("keys_str"),
        F.array_join(F.array_sort(F.map_values(mp)), ",").alias("vals_str"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w + 1e-9, 6) AS pr,
           ROUND(cume_dist() OVER w + 1e-9, 6) AS cd,
           first_value(c_custkey) OVER w AS richest,
           nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS second
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Distribution window functions: ntile, percent_rank, cume_dist, "
        "first_value, nth_value (full-frame).",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pr"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cd"),
        F.first("c_custkey").over(w).alias("richest"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second"),
    )


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    doc="GROUPING SETS — the general form behind rollup/cube, via "
        "Spark SQL on a temp view.",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "gs_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS users,
           ROUND(SUM(value), 4) AS value_sum,
           ROUND(AVG(value) + 1e-9, 6) AS value_avg
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hypertable-style time-bucket rollup: hourly counts, distinct "
        "users, sums per event type — the continuous-aggregate shape "
        "(streaming twin: tumbling window over the same expression).",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.round(F.avg("value") + 1e-9, 6).alias("value_avg"),
        )
    )


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT CAST(to_timestamp(epoch_us(ts) // 600000000 * 600)
               AS TIMESTAMP) AS win_start,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS value_sum
    FROM events
    GROUP BY 1
    """,
    doc="Tumbling 10-minute window via F.window — the streaming "
        "windowed-aggregation operator run in batch mode (readStream + "
        "the same expression gives the live version; watermark bounds "
        "state for late data).",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "n",
            "value_sum",
        )
    )


@register(
    "agg_stats_funcs",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd,
           ROUND(var_samp(l_extendedprice), 2) AS var,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr,
           ROUND(skewness(l_extendedprice), 6) AS skew,
           CAST(median(l_quantity) AS DOUBLE) AS med,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregate surface: stddev, variance, covariance, "
        "correlation, skewness, median, continuous percentile. Spark "
        "skewness is the population g1; DuckDB applies the sample "
        "bias correction sqrt(n(n-1))/(n-2) — bridged exactly.",
)
def agg_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count("l_extendedprice")
    skew_sample = F.skewness("l_extendedprice") * F.sqrt(
        n * (n - 1)
    ) / (n - 2)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr"),
        F.round(skew_sample, 6).alias("skew"),
        F.median("l_quantity").cast("double").alias("med"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w) AS n,
           w[1] AS first_tok,
           w[-1] AS last_tok,
           array_to_string(w[1:3], '-') AS head3,
           len(list_distinct(w)) AS n_distinct,
           list_contains(w, 'the') AS has_the,
           list_sort(list_distinct(w))[1] AS min_tok,
           len(list_filter(w, x -> length(x) > 5)) AS n_long,
           list_count(w) - len(list_distinct(w)) AS n_dupes
    FROM t
    """,
    doc="Array function surface over token arrays: size, head/tail "
        "element access, slice+join, distinct, membership, sorted-min, "
        "lambda filter, duplicate count.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("w"))
    w = F.col("w")
    return t.select(
        "doc_id",
        F.size(w).alias("n"),
        F.element_at(w, 1).alias("first_tok"),
        F.element_at(w, -1).alias("last_tok"),
        F.concat_ws("-", F.slice(w, 1, 3)).alias("head3"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.array_contains(w, "the").alias("has_the"),
        F.element_at(F.array_sort(F.array_distinct(w)), 1).alias("min_tok"),
        F.size(F.filter(w, lambda x: F.length(x) > 5)).alias("n_long"),
        (F.size(w) - F.size(F.array_distinct(w))).alias("n_dupes"),
    )


@register(
    "conditional_null_funcs",
    oracle="""
    SELECT event_id,
           COALESCE(value, 0.0) AS v_filled,
           NULLIF(event_type, 'error') AS type_or_null,
           CASE WHEN value IS NULL THEN 'missing'
                WHEN value >= 50 THEN 'high' ELSE 'low' END AS bucket,
           value IS NULL AS is_missing,
           IFNULL(value, -1.0) AS v_ifnull,
           GREATEST(COALESCE(value, 0.0), 10.0) AS v_floor10
    FROM events
    """,
    doc="Null-handling conditionals: coalesce, nullif, searched CASE, "
        "IS NULL predicate, ifnull, greatest-with-null-fill.",
)
def conditional_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.coalesce(v, F.lit(0.0)).alias("v_filled"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.when(v.isNull(), "missing")
        .when(v >= 50, "high")
        .otherwise("low")
        .alias("bucket"),
        v.isNull().alias("is_missing"),
        F.ifnull(v, F.lit(-1.0)).alias("v_ifnull"),
        F.greatest(F.coalesce(v, F.lit(0.0)), F.lit(10.0)).alias("v_floor10"),
    )


@register(
    "explode_tokens",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
               WHERE doc_id < 50)
    SELECT doc_id,
           CAST(u.pos - 1 AS INT) AS pos,
           u.tok
    FROM t, (SELECT CAST(NULL AS BIGINT) AS _d) dummy_,
         LATERAL (SELECT unnest(w) AS tok,
                         generate_subscripts(w, 1) AS pos) u
    """,
    doc="Row-expanding posexplode (LATERAL/UNNEST): one row per token "
        "with its position — the relational form of tokenization that "
        "feeds inverted-index builds.",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    t = d.select("doc_id", F.split("text", " ").alias("w"))
    return t.select(
        "doc_id", F.posexplode("w").alias("pos", "tok")
    )


@register(
    "explode_tokens_with_position",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, w[u.i] AS tok
    FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) u
    """,
    doc="posexplode (ordinal-preserving flatten): each token with its "
        "0-based position — the shape sequence models need (token, "
        "position) and the UDTF surface the reference lacks. Zero "
        "shuffles; DuckDB replays it as a lateral unnest over the "
        "index range.",
)
def explode_tokens_with_position(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )

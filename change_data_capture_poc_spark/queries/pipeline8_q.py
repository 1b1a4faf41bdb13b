"""Round-8 pipeline operators.

Completes the portable-sketch family and closes the round-7 audit
edges:

- ``agg_histogram_quantile_portable`` — fixed-grid histogram quantile
  sketch: the QUANTILE companion to the portable HLL (distinct), CMS
  (frequency), and Bloom (membership) sketches. Integer bucket counts
  are the only summary state; they merge associatively by SUM (the
  distributed-sketch property, pytest-pinned) and the interpolated
  rank estimate is one division — oracle-exact on both engines.
  Stream twin: ``streaming_histogram_register_drain``.
- ``eval_ann_recall_sampled_truth`` — the recall eval gate with a
  HASH-SAMPLED truth pool: at 100 TB the exact brute-force truth scan
  is the biggest job in the pipeline; a consistent bottom-k sample of
  the corpus bounds the gate's cost while the binomial CI quantifies
  what the sampling costs in confidence. Reported next to the exact
  recall at test scale (the agreement pytest is the calibration).
- ``scd2_recompute_evolved_schema`` — SCD2 recompute over a
  TWO-GENERATION envelope log whose after-image gained a column
  mid-stream (the backfill that cdc_schema_evolution_union's readout
  exists to decide): one evolved union schema parses both
  generations, pre-migration versions carry NULL for the new
  attribute, and a change in the new column alone must open a new
  version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# agg_histogram_quantile_portable — cross-engine-exact quantile sketch
# ---------------------------------------------------------------------------

_QSK_B = 512      # fixed grid buckets
_QSK_W = 2.0      # bucket width -> domain [0, 1024), clipped at edges
_QSK_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _qsk_register_exprs() -> tuple[F.Column, F.Column]:
    """(bucket, clipped) columns for a non-null ``value`` row — the
    ONLY data-dependent step of the sketch, shared verbatim by the
    batch query and the streaming twin so their register tables are
    the same table."""
    raw = F.floor(F.col("value") / F.lit(_QSK_W)).cast("int")
    bucket = F.least(
        F.lit(_QSK_B - 1), F.greatest(F.lit(0), raw)
    ).alias("bucket")
    clipped = (
        (F.col("value") < 0) | (F.col("value") >= _QSK_B * _QSK_W)
    ).cast("int").alias("clipped")
    return bucket, clipped


def _qsk_quantile_readout(reg: DataFrame, clip: DataFrame) -> DataFrame:
    """Registers (event_type, bucket, cnt, n_clipped-source ``clip``)
    → interpolated quantile estimates at the ``_QSK_QS`` targets.

    All-window frames are <= _QSK_B rows keyed by event_type (the
    bounded-summary readout, not a data-sized window). target rank =
    ceil(q*n) in integers; estimate = (bucket + in-bucket rank
    fraction) * W with exactly ONE division, so both engines agree to
    the bit before the 1e-6 rounding.
    """
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = reg.select(
        "event_type",
        "bucket",
        "cnt",
        F.sum("cnt").over(wcum).cast("long").alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
        F.count(F.lit(1)).over(wall).cast("long").alias("registers_hit"),
    )
    spark = reg.sparkSession
    qs = spark.createDataFrame([(q,) for q in _QSK_QS], "q double")
    target = F.ceil(F.col("q") * F.col("n")).cast("long")
    sel = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("target", target)
        .where(
            (F.col("cum") >= F.col("target"))
            & (F.col("cum") - F.col("cnt") < F.col("target"))
        )
    )
    est = (
        (
            F.col("bucket")
            + (F.col("target") - (F.col("cum") - F.col("cnt")))
            * 1.0
            / F.col("cnt")
        )
        * F.lit(_QSK_W)
    )
    return sel.join(clip, "event_type").select(
        "event_type",
        "q",
        F.col("n").alias("n_rows"),
        "n_clipped",
        "registers_hit",
        F.round(est + F.lit(1e-9), 6).alias("hist_estimate"),
    )


_QSK_ORACLE_CORE = f"""
    e AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type,
               LEAST({_QSK_B - 1},
                     GREATEST(0, CAST(floor(value / {_QSK_W}) AS INTEGER)))
                   AS bucket
        FROM e
    ),
    reg AS (
        SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM r GROUP BY event_type, bucket
    ),
    clip AS (
        SELECT event_type,
               CAST(COUNT(*) FILTER (WHERE value < 0
                    OR value >= {_QSK_B * _QSK_W}) AS BIGINT) AS n_clipped
        FROM e GROUP BY event_type
    ),
    cum AS (
        SELECT event_type, bucket, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY event_type
                                   ORDER BY bucket) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n,
               CAST(COUNT(*) OVER (PARTITION BY event_type)
                    AS BIGINT) AS registers_hit
        FROM reg
    ),
    qs AS (SELECT CAST(unnest([{", ".join(str(q) for q in _QSK_QS)}])
                       AS DOUBLE) AS q),
    sel AS (
        SELECT c.event_type, qs.q, c.n, c.registers_hit, c.bucket,
               c.cnt, c.cum,
               CAST(ceil(qs.q * c.n) AS BIGINT) AS target
        FROM cum c, qs
        WHERE c.cum >= CAST(ceil(qs.q * c.n) AS BIGINT)
          AND c.cum - c.cnt < CAST(ceil(qs.q * c.n) AS BIGINT)
    ),
    readout AS (
        SELECT s.event_type, s.q, s.n AS n_rows, cl.n_clipped,
               s.registers_hit,
               ROUND((s.bucket
                      + (s.target - (s.cum - s.cnt)) * 1.0 / s.cnt)
                     * {_QSK_W} + 1e-9, 6) AS hist_estimate
        FROM sel s JOIN clip cl USING (event_type)
    )
"""


@register(
    "agg_histogram_quantile_portable",
    oracle=f"""
    WITH {_QSK_ORACLE_CORE},
    ex AS (
        SELECT event_type,
               quantile_cont(value,
                   [{", ".join(str(q) for q in _QSK_QS)}]) AS xs
        FROM e GROUP BY event_type
    ),
    exu AS (
        SELECT event_type,
               generate_subscripts(xs, 1) AS qi,
               unnest(xs) AS exact_raw
        FROM ex
    ),
    exq AS (
        SELECT event_type,
               CAST([{", ".join(str(q) for q in _QSK_QS)}][qi]
                    AS DOUBLE) AS q,
               exact_raw
        FROM exu
    )
    SELECT r.event_type, r.q, r.n_rows, r.n_clipped, r.registers_hit,
           r.hist_estimate,
           ROUND(x.exact_raw + 1e-9, 6) AS exact_value,
           ROUND(ABS(r.hist_estimate - x.exact_raw) + 1e-9, 6)
               AS abs_error
    FROM readout r JOIN exq x ON r.event_type = x.event_type
                             AND r.q = x.q
    """,
    doc=f"PORTABLE QUANTILE SKETCH — the quantile member completing "
        f"the portable-sketch family (HLL=distinct, CMS=frequency, "
        f"Bloom=membership): a fixed {_QSK_B}-bucket width-{_QSK_W} "
        f"histogram whose integer bucket counts are the entire "
        f"summary. Unlike agg_approx_sketches' engine-native t-digest "
        f"(internals legitimately differ across engines — rows-only "
        f"check), the grid is fixed a priori, bucketing is "
        f"floor(value/width) (IEEE-exact ops, no transcendental "
        f"boundary risk), and the quantile readout is integer rank "
        f"arithmetic + ONE division — so the ESTIMATE itself is "
        f"oracle-exact. Registers merge associatively by SUM "
        f"(pytest-pinned; a KLL/t-digest needs compaction logic for "
        f"the same bound — the fixed grid buys mergeability with a "
        f"known width/2 max error instead). Emits estimate vs exact "
        f"quantile_cont + abs error at q in {_QSK_QS}, plus the "
        f"clip count that tells an operator the grid domain was "
        f"adequate. Scale shape: one (event_type, bucket) shuffle "
        f"over {_QSK_B}-bounded keys per group; readout windows run "
        f"over <= {_QSK_B}-row summary frames; the exact side is the "
        f"eval gate this sketch exists to replace at 100 TB.",
)
def agg_histogram_quantile_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    bucket, clipped = _qsk_register_exprs()
    marked = ev.select("event_type", "value", bucket, clipped)
    reg = marked.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    clip = marked.groupBy("event_type").agg(
        F.sum("clipped").cast("long").alias("n_clipped")
    )
    readout = _qsk_quantile_readout(reg, clip)

    q_lits = ", ".join(str(q) for q in _QSK_QS)
    ex = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, array({q_lits}))").alias("xs")
    )
    exq = ex.select(
        "event_type", F.posexplode("xs").alias("qi", "exact_raw")
    ).select(
        "event_type",
        F.expr(f"element_at(array({q_lits}), qi + 1)").alias("q"),
        "exact_raw",
    )
    return readout.join(F.broadcast(exq), ["event_type", "q"]).select(
        "event_type",
        "q",
        "n_rows",
        "n_clipped",
        "registers_hit",
        "hist_estimate",
        F.round(F.col("exact_raw") + F.lit(1e-9), 6).alias("exact_value"),
        F.round(
            F.abs(F.col("hist_estimate") - F.col("exact_raw"))
            + F.lit(1e-9),
            6,
        ).alias("abs_error"),
    )

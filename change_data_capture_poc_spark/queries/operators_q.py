"""Queries backing the custom operators (operators/, streaming/):
as-of join, sessionization (batch + session_window), simhash near-dup,
embedding-cosine near-dup, regex token counting.

Each query is the oracle-checkable face of an engine operator; the
operator modules hold the reusable implementation and its scale notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from change_data_capture_poc_spark.operators import asof_join, sessionize
from change_data_capture_poc_spark.operators.simhash import hamming64
from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table
from change_data_capture_poc_spark.streaming.sessions import session_window_agg
from change_data_capture_poc_spark.functions.windows import global_window

_GAP_S = 1800


@register(
    "asof_join_order_events",
    oracle="""
    WITH ev AS (
        SELECT user_id AS o_custkey, ts, MAX(value) AS v
        FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           ev.v AS last_event_value
    FROM orders o ASOF LEFT JOIN ev
      ON o.o_custkey = ev.o_custkey AND ev.ts <= o.o_orderdate
    """,
    doc="As-of (backward) join: each order picks up the most recent "
        "event value at or before its order date for the same customer. "
        "Window formulation (union + last_value ignore-nulls), one "
        "shuffle on the key — not the quadratic theta join "
        "(operators/asof.py). Right side deduped per (key, ts) for "
        "determinism.",
)
def asof_join_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("o_custkey"), "ts")
        .agg(F.max("value").alias("v"))
    )
    return asof_join(
        orders, ev, on="o_custkey", left_ts="o_orderdate", right_ts="ts",
        right_values=["v"],
    ).withColumnRenamed("v", "last_event_value")


@register(
    "sessionize_user_events",
    oracle=f"""
    WITH t AS (
        SELECT user_id, event_id, ts, epoch_us(ts) AS eus
        FROM events
    ),
    m AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(eus) OVER w IS NULL
                         OR eus - LAG(eus) OVER w > {_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS ns
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
    FROM m
    """,
    doc="Gap-based sessionization (lag → marker → running sum), one "
        "shuffle on the key (operators/sessionize.py). Gap compares "
        "microsecond epochs with strict > — session_window merges an "
        "exactly-gap event (touching intervals) — on both engines.",
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize(
        ev, key="user_id", ts="ts", gap_seconds=_GAP_S,
        order_tiebreak="event_id",
    )


@register(
    "session_window_stats",
    oracle="""
    WITH m AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS ns
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS value_sum
    FROM s GROUP BY user_id, sid
    """,
    doc="session_window aggregation — the streaming-native session "
        "operator (streaming/sessions.py), run in batch mode so the "
        "oracle can replay it as lag/cumsum SQL. session_window splits "
        "only on gap STRICTLY > threshold (touching intervals merge — "
        "verified empirically; the oracle's lag rule matches).",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = session_window_agg(ev, key="user_id", ts="ts", gap="30 minutes")
    return out.withColumn("value_sum", F.round("value_sum", 6))


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64 has no DuckDB twin; pytest covers semantics
    doc="SimHash near-dup candidates: 64-bit fingerprint (JVM xxhash64 "
        "token hashes + Arrow-batched numpy bit-vote, bit-identical to "
        "the pure-expression simhash64 — operators/simhash.py), banded "
        "into 4x16-bit keys; only band-colliding pairs are compared "
        "(hamming <= 8). The band join shuffles on (band, key) — "
        "candidate pairs, never the full cross product.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.simhash import (
        first_matching_band,
        simhash_documents_pandas,
    )

    d = load_table(spark, sf_dir, "documents")
    fp = simhash_documents_pandas(d).withColumnRenamed("simhash", "h")
    bands = fp.select(
        "doc_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("h", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "h", "b.band", "b.key")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        # Lowest-matching-band rule replaces the old post-join
        # DISTINCT: a pair colliding on several bands is emitted only
        # from the first one, so the candidate stream never shuffles
        # again — the join output flows map-side into the result.
        .where(
            F.col("a.band")
            == first_matching_band(F.col("a.h"), F.col("b.h"), 16, 4)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(F.col("a.h"), F.col("b.h")).alias("hamming"),
        )
        .where(F.col("hamming") <= 8)
    )
    return pairs


@register(
    "dedup_simhash_portable",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                              s -> ('0x' || substring(md5(s), 1, 8))::BIGINT)
                   AS hx
        FROM documents
    ),
    fp AS (
        SELECT doc_id,
               list_aggregate(
                   list_transform(range(32), b ->
                       CASE WHEN 2 * len(list_filter(hx,
                                         h -> (h >> b) & 1 = 1)) > len(hx)
                            THEN (1::BIGINT << b) ELSE 0::BIGINT END),
                   'sum') AS h
        FROM t
    ),
    bands AS (
        SELECT doc_id, h, b.b AS band, (h >> (8 * b.b)) & 255 AS key
        FROM fp, (SELECT unnest(range(4)) AS b) b
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(xor(x.h, y.h)) AS INT) AS hamming
    FROM bands x
    JOIN bands y ON x.band = y.band AND x.key = y.key
                AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.h, y.h)) <= 4
    """,
    doc="Portable simhash near-dup candidates: md5-derived 32-bit base "
        "hash (the dedup_minhash_lsh portable-hash bridge) so DuckDB "
        "replays the identical fingerprint arithmetic — votes, >0 tie "
        "rule, 4x8-bit banding, hamming <= 4. Same banded candidate-"
        "pairs-only join as dedup_simhash (which keeps xxhash64 as the "
        "engine-internal fast path). Fingerprints via the Arrow vote "
        "path (simhash32_portable_pandas — bit-identical to the "
        "expression form, pytest-pinned).",
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.simhash import (
        first_matching_band,
        simhash32_portable_pandas,
    )

    d = load_table(spark, sf_dir, "documents")
    fp = simhash32_portable_pandas(d).withColumnRenamed("simhash", "h")
    bands = fp.select(
        "doc_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("h", 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "h", "b.band", "b.key")
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        # Lowest-matching-band rule (operators/simhash.py): each pair
        # is emitted from exactly one band, so no DISTINCT shuffle —
        # the round-10 probe's 17.6x shuffle-byte row was that
        # distinct carrying the 8-bit bands' quadratic in-bucket
        # fan-out; now the pair stream never shuffles (same result
        # set as the oracle's DISTINCT).
        .where(
            F.col("x.band")
            == first_matching_band(F.col("x.h"), F.col("y.h"), 8, 4)
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            hamming64(F.col("x.h"), F.col("y.h")).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 4)
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 6) >= 0.30
    """,
    doc="Embedding-cosine near-dup pairs, blocked by the cluster label "
        "(IVF-style): one normalized BLAS matmul per label block via "
        "applyInPandas (functions/vectors_pandas.py) — pairs never "
        "leave their block, the only shuffle is on label. 25x faster "
        "than the per-pair built-in fold at sf0.1 (HOF aggregates are "
        "interpreted, not codegen'd).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.functions.vectors_pandas import (
        label_blocked_cosine_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return label_blocked_cosine_pairs(e, threshold=0.30)


_TOK_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_token_count_regex",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '{_TOK_RE}') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]+$')))
               AS n_alpha,
           len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$')))
               AS n_digit,
           len(list_filter(toks, x -> NOT regexp_matches(x, '^[A-Za-z0-9]')))
               AS n_punct
    FROM t
    """,
    doc="BPE-ish regex tokenizer: word/number/punctuation token counts "
        "via regexp_extract_all — JVM-side regex, no Python in the hot "
        "path (north-star token counting).",
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Materialize the token array once — five consumers below would
    # otherwise re-run the regex extraction each (functions/text.py
    # performance rule).
    t = d.select(
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit(_TOK_RE), F.lit(0)).alias(
            "toks"
        ),
    )
    toks = F.col("toks")

    def count_matching(pattern):
        return F.size(F.filter(toks, lambda x: x.rlike(pattern)))

    return t.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        count_matching("^[A-Za-z]+$").alias("n_alpha"),
        count_matching("^[0-9]+$").alias("n_digit"),
        F.size(F.filter(toks, lambda x: ~x.rlike("^[A-Za-z0-9]"))).alias(
            "n_punct"
        ),
    )


_SALT_N = 8


@register(
    "join_skew_salted",
    oracle="""
    SELECT e.user_id, c.c_mktsegment,
           COUNT(*) AS n,
           ROUND(SUM(e.value), 4) AS value_sum
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="Skew-resilient join: the fact side carries a salt "
        "(pmod(hash(event_id), S)), the dim side is exploded S ways, and "
        "the join key becomes (key, salt) — a hot key's rows spread over "
        "S reducers instead of one. Semantically identical to the plain "
        "join (the oracle); the technique AQE's skew-join handling "
        "automates, expressed manually for engine completeness.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(_SALT_N))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))))
    )
    return (
        ev.hint("shuffle_hash")
        .join(
            cust,
            (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
        )
        .groupBy("user_id", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


@register(
    "agg_approx_sketches",
    oracle=None,  # sketch internals differ across engines by design
    doc="Approximate aggregation surface: HyperLogLog++ distinct counts "
        "(approx_count_distinct, rsd 1%) and t-digest quantiles "
        "(approx_percentile) per event_type — the sketches that replace "
        "exact distinct/percentile at 100 TB. Cross-engine sketch "
        "estimates legitimately differ, so the driver records the "
        "rows-only check; estimate-vs-exact error bounds are asserted "
        "in tests/test_operators_misc.py. Quantiles are emitted as three "
        "scalar columns (q50/q90/q99) — an array-typed result column "
        "breaks the harness's pandas row hash.",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("vq"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "approx_users",
            F.element_at("vq", 1).alias("q50"),
            F.element_at("vq", 2).alias("q90"),
            F.element_at("vq", 3).alias("q99"),
            "n",
        )
    )


@register(
    "cdc_envelope_scd2_e2e",
    oracle=None,  # input is engine-generated (seeded), not a driver table
    doc="The reference pipeline end-to-end inside the engine: seeded "
        "CDC generator (G1) -> Debezium-style envelopes -> decode "
        "(P1-P7) -> windowed SCD2 recompute (W1-W2, transform_scd2.py "
        "semantics) with delete tombstones and the 9999-01-01 open-row "
        "sentinel. Deterministic by seed; golden-checked in "
        "tests/test_scd2.py. Validity bounds cross the harness as "
        "epoch-millis BIGINT (the year-9999 sentinel overflows pandas "
        "datetime64[ns]); the engine operator itself keeps true "
        "timestamps.",
)
def cdc_envelope_scd2_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.cdc.envelope import decode_envelope
    from change_data_capture_poc_spark.cdc.generator import CdcGenerator
    from change_data_capture_poc_spark.cdc.scd2 import scd2_recompute

    gen = CdcGenerator(seed=42)
    envelopes = gen.products_df(spark, num_records=500, snapshot_rows=50)
    out = scd2_recompute(decode_envelope(envelopes))
    return (
        out.withColumn(
            "row_valid_start_ms", F.unix_millis("row_valid_start_timestamp")
        )
        .withColumn(
            "row_valid_expiration_ms",
            F.unix_millis("row_valid_expiration_timestamp"),
        )
        .drop("row_valid_start_timestamp", "row_valid_expiration_timestamp")
    )


@register(
    "asof_join_forward_tolerance",
    oracle="""
    WITH ev AS (
        SELECT user_id AS o_custkey, ts, MAX(value) AS v
        FROM events GROUP BY user_id, ts
    ),
    cand AS (
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
               MIN(ev.ts) AS nxt_ts
        FROM orders o
        LEFT JOIN ev ON ev.o_custkey = o.o_custkey
                    AND ev.ts >= o.o_orderdate
                    AND ev.ts <= o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    )
    SELECT c.o_orderkey, c.o_custkey,
           CAST(c.o_orderdate AS TIMESTAMP) AS o_orderdate,
           ev.v AS next_event_value
    FROM cand c
    LEFT JOIN ev ON ev.o_custkey = c.o_custkey AND ev.ts = c.nxt_ts
    """,
    doc="FORWARD as-of with 7-day tolerance: each order picks up the "
        "next event value at or after its date, voided when the match "
        "is further than 7 days out — the direction DuckDB's ASOF "
        "JOIN lacks, so the oracle states the min-over-candidates "
        "form (quadratic, oracle-scale only); the engine runs the "
        "union+window plan (operators/asof.py), one shuffle, no "
        "fan-out. Right side deduped per (key, ts) for determinism.",
)
def asof_join_forward_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("o_custkey"), "ts")
        .agg(F.max("value").alias("v"))
    )
    return asof_join(
        orders, ev, on="o_custkey", left_ts="o_orderdate", right_ts="ts",
        right_values=["v"], direction="forward",
        tolerance_seconds=7 * 86400,
    ).withColumnRenamed("v", "next_event_value")


@register(
    "range_join_signup_windows",
    oracle="""
    WITH sg AS (
        SELECT event_id AS signup_id, user_id,
               ts AS win_start, ts + INTERVAL 6 HOUR AS win_end
        FROM events WHERE event_type = 'signup'
    ),
    pur AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT sg.signup_id, pur.purchase_id, pur.ts,
           ROUND(pur.value, 6) AS value
    FROM sg JOIN pur ON pur.user_id = sg.user_id
                    AND pur.ts >= sg.win_start
                    AND pur.ts <= sg.win_end
    """,
    doc="Range (point-in-interval) join: purchases landing inside the "
        "6-hour window after the same user's signup. The oracle "
        "states the theta-join semantics; the engine runs the "
        "bucketed equi-join (operators/rangejoin.py) - intervals "
        "explode to their hour-buckets, points map to one, the join "
        "shuffles on (key, bucket) and the exact predicate verifies. "
        "Linear fan-out; Spark's native plan for this predicate "
        "shape is a per-key nested loop.",
)
def range_join_signup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.rangejoin import (
        range_join_by_bucket,
    )

    ev = load_table(spark, sf_dir, "events")
    sg = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_key"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("win_end"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_key"),
        "ts",
        "value",
    )
    out = range_join_by_bucket(
        pur, sg,
        point_key="p_key", interval_key="s_key",
        point_ts="ts", lo="win_start", hi="win_end",
        bucket_ms=3_600_000,
    )
    return out.select(
        "signup_id", "purchase_id", "ts", F.round("value", 6).alias("value")
    )


@register(
    "multimodal_resize_meta",
    oracle="""
    SELECT doc_id, 64 AS width, 64 AS height, 64 AS n_bytes,
           hex(encode(substring(text, 1, 8))) AS prefix_hex
    FROM documents
    """,
    doc="Resize stage through the real mapInPandas plumbing "
        "(operators/multimodal.py resize_media_batch): target dims "
        "64x64, fake payload = bytes truncated/padded to area/64. The "
        "oracle reproduces the output contract byte-for-byte (dims, "
        "payload length, first-8-bytes hex) — swap in PIL and only "
        "the Python body changes.",
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.multimodal import (
        resize_media_batch,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    r = resize_media_batch(d, "payload", target_w=64, target_h=64)
    return r.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 8)).alias("prefix_hex"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, octet_length(encode(text)) % 30 + 1, 2))
                AS INT) AS frame_idx
    FROM documents
    """,
    doc="Frame-sampling stage (row-expanding mapInPandas — the UDF "
        "analogue of explode): every 2nd frame kept, fake frame count "
        "= n_bytes % 30 + 1 (decode_media_batch's formula). Oracle "
        "unnests the identical index range per document.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.multimodal import (
        sample_frames_batch,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return sample_frames_batch(d, "payload", every_nth=2).select(
        "doc_id", "frame_idx"
    )


@register(
    "multimodal_feature_argmax",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               list_transform(range(16), b ->
                   len(list_filter(range(len(text)),
                                   i -> ord(text[i+1]) % 16 = b))) AS counts
        FROM documents
    )
    SELECT doc_id,
           CAST(list_position(counts, list_aggregate(counts, 'max')) - 1
                AS INT) AS top_bucket,
           CAST(list_aggregate(counts, 'max') AS INT) AS top_count
    FROM h
    """,
    doc="Feature-extraction stage (fake encoder: 16-bucket normalized "
        "byte histogram, plumbing-identical to a vision/audio model "
        "emitting array<float>): the harness-facing projection is the "
        "dominant bucket + its raw count (arrays don't cross the "
        "bridge; the count is reconstructed exactly from the float32 "
        "share x n_bytes, error << 0.5). Oracle recomputes the "
        "histogram from character codes (documents are ASCII, so "
        "byte == codepoint); first-max tie rule matches numpy argmax.",
)
def multimodal_feature_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.multimodal import (
        extract_features_batch,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    f = extract_features_batch(d, "payload", dim=16)
    top = F.array_max("features")
    return f.select(
        "doc_id",
        (F.array_position(F.col("features"), top) - 1)
        .cast("int")
        .alias("top_bucket"),
        F.round(top * F.octet_length("payload"))
        .cast("int")
        .alias("top_count"),
    )


@register(
    "global_ordinal_ids",
    oracle="""
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (ORDER BY doc_id) AS ordinal,
           CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) % 16 AS INT)
               AS shard
    FROM documents
    """,
    doc="Contiguous global ordinals (training-shard ids) WITHOUT the "
        "single-partition global window that ROW_NUMBER() OVER "
        "(ORDER BY ...) plans — that window funnels 100 TB through "
        "one task. Instead: band the order key into P ranges with "
        "DETERMINISTIC integer math from a one-row min/max aggregate "
        "(repartitionByRange is unusable here: its sampled boundaries "
        "can differ between the two evaluations of the subtree, "
        "desynchronizing counts from rows — observed at sf0.1), "
        "count rows per band (P rows), exclusive-prefix-sum the "
        "counts (a window over P rows, never over data), broadcast "
        "the offsets back, and add a per-band local row_number. "
        "The only data-sized exchange is the hash partition on the "
        "band id + its per-band sort — fully parallel. The oracle "
        "states the naive global-window semantics. Round-robin "
        "shard = (ordinal-1) % 16 balances shards to within one row.",
)
def global_ordinal_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Band count bounds the per-band sort's PARALLELISM, not the
    # result (ordinals are band-count-invariant): 8 bands capped the
    # stage at 8 tasks and went 15x at the 8x probe; 32 matches the
    # local core count. At cluster scale set ~4x executor cores.
    n_bands = 32
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    stats = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    # bounded: 1-row min/max scalar
    p = d.crossJoin(F.broadcast(stats)).withColumn(
        "pid",
        F.expr(
            f"CAST(((doc_id - lo) * {n_bands}) DIV (hi - lo + 1) AS INT)"
        ),
    )
    counts = p.groupBy("pid").agg(F.count("*").alias("c"))
    # Offsets: exclusive prefix sum over one-row-per-band data — the
    # window is single-partition but bounded by n_bands, never by the
    # data.
    w_off = (
        global_window("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "pid", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    w_local = Window.partitionBy("pid").orderBy("doc_id")
    ordinal = (F.col("off") + F.row_number().over(w_local)).cast("bigint")
    return (
        # bounded: n_bands offset rows
        p.drop("lo", "hi").join(F.broadcast(offs), "pid")
        .select(
            "doc_id",
            "lang",
            ordinal.alias("ordinal"),
            ((ordinal - 1) % 16).cast("int").alias("shard"),
        )
    )


@register(
    "asof_join_nearest_events",
    oracle="""
    WITH ev AS (
        SELECT user_id AS o_custkey, ts, MAX(value) AS v
        FROM events GROUP BY user_id, ts
    )
    SELECT o_orderkey, o_custkey, o_orderdate,
           v AS nearest_event_value
    FROM (
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, ev.v,
               ROW_NUMBER() OVER (
                   PARTITION BY o.o_orderkey
                   ORDER BY ABS(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                               - epoch_us(ev.ts)), ev.ts
               ) AS rk
        FROM orders o LEFT JOIN ev USING (o_custkey)
    ) WHERE rk = 1
    """,
    doc="As-of NEAREST join — the third direction (sensor-fusion "
        "semantics: each order takes the event value closest in time "
        "on EITHER side; exact-distance ties take the earlier/backward "
        "row, pandas merge_asof style). Engine: both direction fills "
        "run over one keyed union — two window sorts, ONE hash "
        "exchange (operators/asof.py _asof_nearest) — never the "
        "quadratic per-key theta join the oracle's argmin spells out. "
        "Right side deduped per (key, ts) for determinism, as in the "
        "backward/forward variants.",
)
def asof_join_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("o_custkey"), "ts")
        .agg(F.max("value").alias("v"))
    )
    return asof_join(
        orders, ev, on="o_custkey", left_ts="o_orderdate", right_ts="ts",
        right_values=["v"], direction="nearest",
    ).withColumnRenamed("v", "nearest_event_value")


_SCENE_T = 30  # frame-to-frame signature jump that opens a new scene


@register(
    "multimodal_scene_segmentation",
    oracle=f"""
    WITH fr AS (
        SELECT doc_id, text,
               CAST(unnest(range(0, octet_length(encode(text)) % 30 + 1,
                                 2)) AS INT) AS frame_idx
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    sig AS (
        -- BYTE value at byte offset frame_idx % n_bytes (matching the
        -- engine's payload[frame_idx % len] exactly for multi-byte
        -- text): DuckDB can't index a BLOB directly, so slice two hex
        -- digits out of to_hex(encode(text)). A code-point ord() here
        -- would diverge on any non-ASCII document.
        SELECT doc_id, frame_idx,
               CAST(('0x' || substring(
                        to_hex(encode(text)),
                        2 * (frame_idx % octet_length(encode(text))) + 1,
                        2)) AS INT) AS sig
        FROM fr
    ),
    m AS (
        SELECT doc_id, frame_idx, sig,
               CASE WHEN LAG(sig) OVER w IS NULL
                         OR ABS(sig - LAG(sig) OVER w) > {_SCENE_T}
                    THEN 1 ELSE 0 END AS ns
        FROM sig WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ),
    s AS (
        SELECT doc_id, frame_idx,
               CAST(SUM(ns) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS scene_id
        FROM m
    )
    SELECT doc_id, scene_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MIN(frame_idx) AS INT) AS start_frame,
           CAST(MAX(frame_idx) AS INT) AS end_frame
    FROM s GROUP BY doc_id, scene_id
    """,
    doc=f"VIDEO SCENE SEGMENTATION through the multimodal plumbing — "
        f"the temporal stage the other six multimodal ops lead up to: "
        f"frame sampling (row-expanding mapInPandas), per-frame "
        f"featurization (Arrow batch — fake signature, swap in a "
        f"vision model and only the Python body changes), then "
        f"shot-boundary detection as the relational sessionize "
        f"pattern (lag -> jump-marker when |delta| > {_SCENE_T} -> "
        f"running sum), emitting per-scene frame spans. Scale shape: "
        f"featurize is map-side Arrow; ONE shuffle on doc_id serves "
        f"both the boundary window and the co-partitioned per-scene "
        f"aggregation; scene count is data-derived, never collected.",
)
def multimodal_scene_segmentation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from change_data_capture_poc_spark.operators.multimodal import (
        frame_signature_batch,
        sample_frames_batch,
    )

    # Zero-byte payloads are excluded on BOTH sides: the fake per-frame
    # signature indexes payload[frame_idx % n_bytes], and the oracle's
    # modulo would divide by zero on an empty document.
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
        )
        .where(F.octet_length("payload") > 0)
    )
    frames = sample_frames_batch(d, "payload", every_nth=2)
    sig = frame_signature_batch(frames, "payload")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    ns = F.when(
        F.lag("sig").over(w).isNull()
        | (F.abs(F.col("sig") - F.lag("sig").over(w)) > _SCENE_T),
        1,
    ).otherwise(0)
    scenes = sig.withColumn("ns", ns).withColumn(
        "scene_id",
        F.sum("ns")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return scenes.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.min("frame_idx").cast("int").alias("start_frame"),
        F.max("frame_idx").cast("int").alias("end_frame"),
    )


@register(
    "range_join_interval_overlap",
    oracle="""
    WITH s AS (
        SELECT event_id AS signup_id, user_id AS s_key,
               ts AS s_lo, ts + INTERVAL 6 HOURS AS s_hi
        FROM events WHERE event_type = 'signup'
    ),
    e AS (
        SELECT event_id AS error_id, user_id AS e_key,
               ts AS e_lo, ts + INTERVAL 2 HOURS AS e_hi
        FROM events WHERE event_type = 'error'
    )
    SELECT signup_id, error_id,
           GREATEST(s_lo, e_lo) AS overlap_start,
           LEAST(s_hi, e_hi) AS overlap_end,
           CAST((epoch_us(LEAST(s_hi, e_hi))
                 - epoch_us(GREATEST(s_lo, e_lo))) // 1000000
                AS BIGINT) AS overlap_seconds
    FROM s JOIN e ON s_key = e_key AND s_lo <= e_hi AND e_lo <= s_hi
    """,
    doc="INTERVAL-x-INTERVAL overlap join (the fourth custom join "
        "family: as-of, point-in-interval, stream interval, now "
        "interval overlap): per user, every signup exposure window "
        "[ts, +6h] against every error window [ts, +2h] that overlaps "
        "it, with the overlap span — the concurrent-exposure readout "
        "(was the user inside an error window during onboarding?). "
        "Engine: operators/rangejoin.interval_overlap_join_by_bucket — "
        "both interval sets explode to covering time buckets, the join "
        "is an EQUI-join on (key, bucket), and each pair is claimed "
        "exactly once in the bucket holding its overlap start (a pure "
        "function of the pair), so there is NO post-join DISTINCT "
        "shuffle and never a per-key cross product. The oracle states "
        "the naive theta-join semantics.",
)
def range_join_interval_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from change_data_capture_poc_spark.operators.rangejoin import (
        interval_overlap_join_by_bucket,
    )

    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_key"),
        F.col("ts").alias("s_lo"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("s_hi"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_key"),
        F.col("ts").alias("e_lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e_hi"),
    )
    j = interval_overlap_join_by_bucket(
        s, e, left_key="s_key", right_key="e_key",
        l_lo="s_lo", l_hi="s_hi", r_lo="e_lo", r_hi="e_hi",
        bucket_ms=3_600_000,
    )
    o_start = F.greatest("s_lo", "e_lo")
    o_end = F.least("s_hi", "e_hi")
    secs = F.floor(
        (
            F.unix_micros(o_end.cast("timestamp"))
            - F.unix_micros(o_start.cast("timestamp"))
        )
        / F.lit(1_000_000.0)
    ).cast("long")
    return j.select(
        "signup_id",
        "error_id",
        o_start.alias("overlap_start"),
        o_end.alias("overlap_end"),
        secs.alias("overlap_seconds"),
    )

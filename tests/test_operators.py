"""Unit tests for the custom operators (asof join, sessionize,
simhash, multimodal plumbing)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from change_data_capture_poc_spark.operators import (
    asof_join,
    attach_media_meta,
    decode_media_batch,
    hamming64,
    sessionize,
    simhash64,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),
            ("A", _ts("2024-01-01 10:05:00"), 2),
            ("A", _ts("2024-01-01 09:00:00"), 3),  # before any quote
            ("B", _ts("2024-01-01 10:00:00"), 4),
        ],
        "sym string, t timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:00"), 10.0),
            ("A", _ts("2024-01-01 10:05:00"), 11.0),  # tie: visible (>=)
            ("B", _ts("2024-01-01 09:00:00"), 20.0),
        ],
        "sym string, qt timestamp, px double",
    )
    out = asof_join(trades, quotes, on="sym", left_ts="t", right_ts="qt",
                    right_values=["px"])
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 10.0, 2: 11.0, 3: None, 4: 20.0}


def test_asof_join_vs_naive_theta(spark):
    """Cross-check the window formulation against the quadratic
    theta-join definition: 50 left x 20 right over 5 keys."""
    left = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("t"),
        F.col("id").alias("lid"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 137).alias("rt"),
        (F.col("id") * 10).cast("double").alias("v"),
    )
    fast = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                     right_values=["v"])
    naive = (
        left.join(right, (left.k == right.k) & (right.rt <= left.t), "left")
        .groupBy("lid")
        .agg(F.max_by("v", "rt").alias("v"))
    )
    f = {r.lid: r.v for r in fast.collect()}
    n = {r.lid: r.v for r in naive.collect()}
    assert f == n


def test_sessionize_gap_split(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),
            (1, _ts("2024-01-01 10:10:00")),     # gap 600 < 1800 → same
            (1, _ts("2024-01-01 10:40:00")),     # gap EXACTLY 1800 → same
                                                 # (session_window merges
                                                 # touching intervals)
            (1, _ts("2024-01-01 11:10:00.500")), # gap 1800.5 → new (sub-
                                                 # second over; a long-
                                                 # cast gap would merge)
            (2, _ts("2024-01-01 10:00:00")),
        ],
        "uid bigint, t timestamp",
    )
    out = sessionize(df, key="uid", ts="t", gap_seconds=1800)
    got = {(r.uid, r.t): r.session_id for r in out.collect()}
    assert got[(1, _ts("2024-01-01 10:00:00"))] == 1
    assert got[(1, _ts("2024-01-01 10:10:00"))] == 1
    assert got[(1, _ts("2024-01-01 10:40:00"))] == 1
    assert got[(1, _ts("2024-01-01 11:10:00.500"))] == 2
    assert got[(2, _ts("2024-01-01 10:00:00"))] == 1


def test_simhash_deterministic_and_near(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup
            (3, "completely different words entirely unrelated text"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup
        ],
        "doc_id bigint, text string",
    )
    out = df.select(
        "doc_id", simhash64(F.split("text", " ")).alias("h")
    )
    h = {r.doc_id: r.h for r in out.collect()}
    assert h[1] == h[4]  # deterministic
    d = df.sparkSession.createDataFrame(
        [(h[1], h[2]), (h[1], h[3])], "a long, b long"
    ).select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    near, far = d[0].d, d[1].d
    assert near < far
    assert near <= 16


def test_multimodal_meta_and_decode(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG-fake-payload")), (2, bytearray(b"xx"))],
        "media_id int, payload binary",
    )
    meta = attach_media_meta(df, "payload", "image")
    m = {r.media_id: r.media_meta for r in meta.collect()}
    assert m[1].n_bytes == 17 and m[1].media_type == "image"
    assert m[1].checksum is not None

    decoded = decode_media_batch(df, "payload")
    assert decoded.schema["width"].dataType.typeName() == "integer"
    rows = {r.media_id: r for r in decoded.collect()}
    # Deterministic fake decode: dims derived from byte length.
    assert rows[1].width == 17 and rows[2].width == 2
    assert rows[2].n_frames == 3

    import pytest

    with pytest.raises(NotImplementedError):
        decode_media_batch(df, "payload", real_decode=True)


def test_multimodal_resize_and_frames_and_features(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(40)))), (2, bytearray(b"abcdef"))],
        "media_id int, payload binary",
    )
    from change_data_capture_poc_spark.operators.multimodal import (
        extract_features_batch,
        resize_media_batch,
        sample_frames_batch,
    )

    resized = resize_media_batch(df, "payload", target_w=64, target_h=64)
    r = {x.media_id: x for x in resized.collect()}
    assert r[1].width == 64 and r[1].height == 64
    assert len(bytes(r[1].payload)) == 64 * 64 // 64
    assert len(bytes(r[2].payload)) == 64 * 64 // 64  # padded

    frames = sample_frames_batch(df, "payload", every_nth=2)
    f1 = [x.frame_idx for x in frames.collect() if x.media_id == 1]
    # 40 bytes -> n_frames = 40 % 30 + 1 = 11 -> kept frames 0,2,...,10
    assert f1 == [0, 2, 4, 6, 8, 10]

    feats = extract_features_batch(df, "payload", dim=8)
    v = {x.media_id: x.features for x in feats.collect()}
    assert len(v[1]) == 8
    assert abs(sum(v[1]) - 1.0) < 1e-5  # normalized histogram
    # Deterministic: same payload -> same features.
    v2 = {x.media_id: x.features for x in
          extract_features_batch(df, "payload", dim=8).collect()}
    assert v == v2


def test_simhash_pandas_matches_expression(spark):
    from change_data_capture_poc_spark.operators.simhash import (
        simhash_documents,
        simhash_documents_pandas,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a b c"),
            (3, "x"),
            (4, "repeated repeated repeated words words"),
        ],
        "doc_id bigint, text string",
    )
    expr = {r.doc_id: r.simhash for r in simhash_documents(df).collect()}
    pand = {r.doc_id: r.simhash for r in simhash_documents_pandas(df).collect()}
    assert expr == pand


def test_asof_join_multiple_value_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        "k int, t timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 5.0, "x"),
         (1, _ts("2024-01-01 09:30:00"), 7.0, "y")],
        "k int, rt timestamp, px double, tag string",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                    right_values=["px", "tag"]).collect()
    assert len(out) == 1
    assert out[0].px == 7.0 and out[0].tag == "y"  # both from latest row


def test_asof_join_null_field_in_latest_right_row(spark):
    """The latest matching right row wins AS A ROW: a NULL field in it
    must stay NULL in the output, not be backfilled from an older right
    row (per-column last(ignorenulls) would tear values across rows)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        "k int, t timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 5.0, "old"),
         (1, _ts("2024-01-01 09:30:00"), None, "new")],
        "k int, rt timestamp, px double, tag string",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                    right_values=["px", "tag"]).collect()
    assert len(out) == 1
    assert out[0].tag == "new"
    assert out[0].px is None  # NOT 5.0 backfilled from the 09:00 row


def test_operators_empty_inputs(spark):
    from change_data_capture_poc_spark.cdc.envelope import (
        PRODUCT_FIELDS,
        decode_envelope,
        envelope_schema,
    )
    from change_data_capture_poc_spark.cdc.scd2 import scd2_recompute

    empty_env = spark.createDataFrame([], envelope_schema(PRODUCT_FIELDS))
    assert scd2_recompute(decode_envelope(empty_env)).count() == 0

    empty_ev = spark.createDataFrame([], "uid bigint, t timestamp")
    assert sessionize(empty_ev, key="uid", ts="t", gap_seconds=60).count() == 0

    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 1)],
                                 "k int, t timestamp, lid int")
    empty_right = spark.createDataFrame([], "k int, rt timestamp, v double")
    out = asof_join(left, empty_right, on="k", left_ts="t", right_ts="rt",
                    right_values=["v"]).collect()
    assert len(out) == 1 and out[0].v is None


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation over a 5-node chain (diameter 4 — forces
    multiple rounds), a triangle, and an isolated pair."""
    from change_data_capture_poc_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21)],                            # pair
        "src bigint, dst bigint",
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    want = {(n, 1) for n in (1, 2, 3, 4, 5)}
    want |= {(n, 10) for n in (10, 11, 12)}
    want |= {(n, 20) for n in (20, 21)}
    assert got == want


def test_connected_components_round_budget(spark):
    """A long chain must still converge within the round budget (min
    labels hop one edge per round)."""
    from change_data_capture_poc_spark.operators.components import (
        connected_components,
    )

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )
    out = connected_components(edges, max_rounds=n + 2).collect()
    assert {r.component for r in out} == {0}
    assert len(out) == n + 1


def test_pagerank_star_graph(spark):
    """On a star (hub connected to k leaves), the hub's rank must
    exceed every leaf's, and all leaves tie by symmetry."""
    from change_data_capture_poc_spark.operators.components import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src bigint, dst bigint"
    )
    r = {row.node: row.rank for row in pagerank(edges, iterations=4).collect()}
    leaves = {r[i] for i in range(1, 6)}
    assert len(leaves) == 1  # symmetric
    assert r[0] > max(leaves)
    # Hand-checked fixed point direction: hub collects 5 * leaf/1 each
    # iteration, leaves collect hub/5.
    assert r[0] > 1.0 > min(leaves)


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1),
         (1, _ts("2024-01-01 12:00:00"), 2)],
        "k int, t timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0),   # tie: visible forward
         (1, _ts("2024-01-01 12:30:00"), 7.0)],
        "k int, rt timestamp, px double",
    )
    fwd = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                    right_values=["px"], direction="forward")
    got = {r.lid: r.px for r in fwd.collect()}
    assert got == {1: 5.0, 2: 7.0}

    tight = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                      right_values=["px"], direction="forward",
                      tolerance_seconds=600)
    got2 = {r.lid: r.px for r in tight.collect()}
    assert got2 == {1: 5.0, 2: None}  # 12:30 is 30 min out, > 10 min

    back_tol = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                         right_values=["px"], direction="backward",
                         tolerance_seconds=3600)
    got3 = {r.lid: r.px for r in back_tol.collect()}
    assert got3 == {1: 5.0, 2: None}  # 10:00 is 2 h back, > 1 h


def test_range_join_matches_theta(spark):
    """Bucketed range join must equal the naive theta join, including
    boundary inclusivity, across bucket widths."""
    from change_data_capture_poc_spark.operators.rangejoin import (
        range_join_by_bucket,
    )

    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 10),
         (1, _ts("2024-01-03 12:00:00"), 11),
         (1, _ts("2024-01-05 00:00:00"), 12),
         (2, _ts("2024-01-02 00:00:00"), 13)],
        "pk int, t timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 12:00:00"), 100),
         (1, _ts("2024-01-04 00:00:00"), _ts("2024-01-06 00:00:00"), 101),
         (2, _ts("2024-01-03 00:00:00"), _ts("2024-01-04 00:00:00"), 102)],
        "ik int, lo timestamp, hi timestamp, iid int",
    )
    naive = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.pk == intervals.ik)
            & (points.t >= intervals.lo)
            & (points.t <= intervals.hi),
        ).collect()
    }
    for bucket_ms in (3_600_000, 86_400_000, 7 * 86_400_000):
        got = {
            (r.pid, r.iid)
            for r in range_join_by_bucket(
                points, intervals, "pk", "ik", "t", "lo", "hi",
                bucket_ms=bucket_ms,
            ).collect()
        }
        assert got == naive
    assert (10, 100) in naive and (11, 100) in naive  # inclusive bounds


def test_ngram_shingles_short_documents_yield_empty(spark):
    """Documents with fewer than n tokens must produce an empty shingle
    array, not an ANSI element_at error from the descending sequence
    F.sequence(0, size-n) generates when size < n."""
    from change_data_capture_poc_spark.functions.text import (
        ngram_shingles,
        with_token_column,
    )

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "a b c"), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.g
        for r in with_token_column(df)
        .select("doc_id", ngram_shingles(F.col("w"), 3).alias("g"))
        .collect()
    }
    assert out[1] == [] and out[2] == []
    assert out[3] == ["a b c"]
    assert out[4] == []  # split("") -> [""], size 1 < 3


def test_asof_join_nearest(spark):
    """Nearest direction: closest right row in EITHER direction wins;
    an exact-distance tie takes the backward (earlier) row; a
    tolerance voids far matches on both sides; an exactly-simultaneous
    right row wins at distance 0."""
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),  # fwd 10:01 closer
            ("A", _ts("2024-01-01 09:57:00"), 2),  # bwd 09:55 closer
            ("A", _ts("2024-01-01 09:58:00"), 3),  # tie 09:55/10:01 -> bwd
            ("A", _ts("2024-01-01 10:01:00"), 4),  # simultaneous
            ("B", _ts("2024-01-01 10:00:00"), 5),  # no quotes at all
        ],
        "sym string, t timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:55:00"), 10.0),
            ("A", _ts("2024-01-01 10:01:00"), 11.0),
        ],
        "sym string, qt timestamp, px double",
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="t", right_ts="qt",
        right_values=["px"], direction="nearest",
    )
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 11.0, 2: 10.0, 3: 10.0, 4: 11.0, 5: None}

    # Tolerance 60s: only the simultaneous match survives.
    tight = asof_join(
        trades, quotes, on="sym", left_ts="t", right_ts="qt",
        right_values=["px"], direction="nearest", tolerance_seconds=60,
    )
    got_t = {r.trade_id: r.px for r in tight.collect()}
    assert got_t == {1: 11.0, 2: None, 3: None, 4: 11.0, 5: None}


def test_asof_join_nearest_single_exchange(spark):
    """The scale contract: nearest runs BOTH direction fills over one
    keyed union — exactly one shuffle exchange, like the
    single-direction forms."""
    from change_data_capture_poc_spark.plans import shuffle_count

    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 1)],
        "sym string, t timestamp, trade_id int",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:55:00"), 10.0)],
        "sym string, qt timestamp, px double",
    )
    out = asof_join(
        left, right, on="sym", left_ts="t", right_ts="qt",
        right_values=["px"], direction="nearest",
    )
    assert shuffle_count(out) == 1


def test_interval_overlap_join_exactly_once(spark):
    """A pair whose overlap spans MANY shared buckets must surface
    exactly once (the claim-at-overlap-start rule), touching intervals
    count as overlapping (closed-interval semantics), and disjoint
    intervals never pair."""
    from change_data_capture_poc_spark.operators.rangejoin import (
        interval_overlap_join_by_bucket,
    )

    left = spark.createDataFrame(
        [
            ("A", 1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 12:00:00")),
            ("A", 2, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),
        ],
        "lk string, lid int, l_lo timestamp, l_hi timestamp",
    )
    right = spark.createDataFrame(
        [
            # Overlaps lid=1 across 10+ shared hourly buckets.
            ("A", 10, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 11:00:00")),
            # Touches lid=1's end exactly (closed intervals -> pair).
            ("A", 11, _ts("2024-01-01 12:00:00"), _ts("2024-01-01 13:00:00")),
            # Disjoint from everything.
            ("A", 12, _ts("2024-01-03 00:00:00"), _ts("2024-01-03 01:00:00")),
        ],
        "rk string, rid int, r_lo timestamp, r_hi timestamp",
    )
    out = interval_overlap_join_by_bucket(
        left, right, left_key="lk", right_key="rk",
        l_lo="l_lo", l_hi="l_hi", r_lo="r_lo", r_hi="r_hi",
        bucket_ms=3_600_000,
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    assert got == [(1, 10), (1, 11)]

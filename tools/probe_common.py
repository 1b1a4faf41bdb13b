"""Shared machinery for the empirical probes (scale_probe,
serve_probe): loader patching, the N-times self-union fixture, and
deterministic shuffle-byte accounting.

Kept out of the package on purpose — this is measurement harness, not
engine; queries must never import it.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from change_data_capture_poc_spark.functions.caching import release_pins
from change_data_capture_poc_spark.sources import tables as tables_mod

DIMS = ("region", "nation", "customer", "supplier", "part")


def consumers():
    """Every loaded module that bound ``load_table`` at import time
    (`from ... import load_table`) — the probe must patch each consumer
    namespace. DISCOVERED, not hand-listed: a hand-maintained tuple
    silently un-scales any new query module that isn't added to it
    (pipeline4_q's first probe ran 1x vs 1x exactly this way)."""
    import sys as _sys

    mods = [tables_mod]
    for name, mod in list(_sys.modules.items()):
        if (
            name.startswith("change_data_capture_poc_spark.")
            and mod is not tables_mod
            and getattr(mod, "load_table", None) is not None
        ):
            mods.append(mod)
    return tuple(mods)


def set_loader(mods, fn) -> None:
    for m in mods:
        m.load_table = fn


def make_scaled_load(real_load, n: int, rotate_text: bool = True):
    """A load_table twin returning every FACT table self-unioned ``n``
    times with shifted keys (dims keep their cardinality — they are
    broadcast sides).

    ``rotate_text=True`` (default): each documents copy gets a per-copy
    letter substitution, so copies share NO tokens — near-dup structure
    is replicated, not multiplied (appending a tag would make all N
    copies mutual near-dups: a pathological corpus that measures the
    data, not the operator). The cost is a fixture artifact the other
    direction: the rotation mints ~n-times distinct word TYPES, so
    vocabulary-keyed exchanges lose dictionary compression and can read
    a few points above linear (round-11's tfidf 10.8x).

    ``rotate_text=False``: copies reuse the SAME text verbatim (ids
    still shifted) — the repetition-shaped fixture. Types stay constant
    while tokens grow n-times, the Heaps-law-friendly end of the
    spectrum; vocabulary-keyed exchanges should now come in at-or-under
    linear. ONLY valid for queries with no pair/self-join semantics
    (identical copies are all mutual near-dups)."""

    def scaled_load(spark_, sf_dir_, name):
        df: DataFrame = real_load(spark_, sf_dir_, name)
        if name in DIMS:
            return df
        out = df
        for i in range(1, n):
            shifted = df
            if name == "documents":
                shifted = df.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
                )
                if rotate_text:
                    alpha = "abcdefghijklmnopqrstuvwxyz"
                    rot = alpha[i:] + alpha[:i]
                    shifted = shifted.withColumn(
                        "text", F.translate("text", alpha, rot)
                    )
            elif name == "embeddings":
                shifted = df.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
                )
            elif name == "events":
                shifted = df.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 10_000_000)
                )
            elif name == "lineitem":
                shifted = df.withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.lit(i * 100_000_000),
                )
            elif name == "orders":
                shifted = df.withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") + F.lit(i * 100_000_000),
                )
            out = out.unionByName(shifted)
        return out

    return scaled_load


def make_materialized_load(inner_load):
    """Wrap a loader so DOCUMENTS is localCheckpoint-ed (eager) once
    and served from its materialized blocks on every later call.

    Round-11 found AQE re-planning an 8-way self-UNION input into
    per-branch joins (exchanges 3 -> 24 for the containment query) —
    a fixture artifact: real 8x data is one source, not eight plan
    branches. Materializing collapses the union to a single LogicalRDD
    before the query sees it. Checkpoint blocks are RDD storage, not
    shuffle, so the byte probe stays clean. Call ``free()`` after the
    query's reps — the blocks cannot be recomputed once dropped."""
    cache: dict[str, DataFrame] = {}

    def mat_load(spark_, sf_dir_, name):
        df = inner_load(spark_, sf_dir_, name)
        if name != "documents":
            return df
        if name not in cache:
            cache[name] = df.localCheckpoint(eager=True)
        return cache[name]

    def free():
        from change_data_capture_poc_spark.functions.caching import (
            free_local_checkpoint,
        )

        for df in cache.values():
            free_local_checkpoint(df)
        cache.clear()

    return mat_load, free


def shuffle_totals(spark) -> int:
    """Cumulative shuffle write bytes from the driver-side
    AppStatusStore (populated regardless of spark.ui.enabled) —
    the memory dimension of the probe: a query can stay
    time-linear while its shuffle bytes blow up super-linearly
    (the spill precursor at 100 TB). Write bytes are the signal
    (read mirrors them in local mode); deltas around a run are
    deterministic, unlike wall time."""
    try:
        bus = spark.sparkContext._jsc.sc().listenerBus()
        bus.waitUntilEmpty()
    except Exception:
        time.sleep(0.5)
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.executorList(False).iterator()
    w = 0
    while it.hasNext():
        w += it.next().totalShuffleWrite()
    return w


def run_query(spark, qs, name: str, sf_dir: str) -> tuple[float, int]:
    """One timed full-evaluation run (noop sink) with the shuffle-byte
    delta around it; engine cache pins released AFTER the clock stops
    (bookkeeping between reps, not query work)."""
    b0 = shuffle_totals(spark)
    t0 = time.time()
    qs[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    elapsed = time.time() - t0
    bytes_w = shuffle_totals(spark) - b0
    release_pins(spark)
    return elapsed, bytes_w


def mb(b: int) -> float:
    return round(b / 1048576, 3)


def bytes_ratio(base_b: int, scaled_b: int):
    """Shared bytes-ratio convention for the probe tables: '-' marks a
    map-only plan (zero shuffle at BOTH scales — the best scale
    shape); 'inf' marks a shuffle that only APPEARS at scale (the
    strongest state-growth signal there is — never mask it)."""
    if base_b > 0:
        return round(scaled_b / base_b, 1)
    if scaled_b > 0:
        return "inf"
    return "-"


def super_linear(base_b: int, scaled_b: int, n: int) -> bool:
    """Shared WARN threshold: shuffle bytes beyond the n*1.1 fixture
    allowance (the self-union's per-copy key/text perturbation costs
    vocabulary-keyed exchanges a few percent of dictionary
    compression), or bytes appearing from a zero base."""
    return (base_b > 0 and scaled_b / base_b > n * 1.1) or (
        base_b == 0 and scaled_b > 0
    )

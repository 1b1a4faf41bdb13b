"""Engine-scoped cache discipline (the round-8 "cache contract" fix).

Queries may cache frames the returned plan references more than once
(branch-shared register tables, ranged vocabularies, per-round trainer
state). Two problems with raw ``DataFrame.persist()`` there:

1. **Warm re-runs warn.** A second call to the same query builds an
   identical logical plan; persisting it again makes the CacheManager
   log "Asked to cache already cached data" on every bench rep and in
   any long-lived session.
2. **Silent accretion.** The caches must outlive the query function
   (the caller materializes the returned plan), so the query cannot
   release them — and a caller that never releases them pins memory
   invisibly; ``spark.catalog.clearCache()`` works but clobbers caches
   the USER created too.

``persist_once`` fixes (1) at the source: it consults the
CacheManager first and only persists plans that are not already
cached. It also records every frame it pins in a session-keyed
registry, so ``release_pins`` fixes (2): it unpersists exactly the
engine's pins — nothing else in the session — and reports how many it
released. All three in-repo harnesses (bench, check_correctness,
scale_probe) call it between queries; a user embedding query
functions in a long-lived session calls it whenever they want the
memory back. ``pinned_count`` lets a harness ASSERT the contract: any
``.persist()`` added outside this module shows up as a cached plan
that ``release_pins`` cannot account for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Pins per JVM session id — keyed weakly-ish by the SparkSession's
# java object hash so two sessions in one process don't release each
# other's pins. Values are the pinned DataFrames (kept alive on
# purpose: unpersist needs the plan).
_PINS: dict[int, list[DataFrame]] = {}


def _session_key(df_or_spark) -> int:
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return id(spark._jsparkSession)


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()`` that is idempotent across identical plans:
    if the CacheManager already holds this (canonicalized) plan —
    a warm re-run of the same query — reuse it silently instead of
    re-persisting and triggering the "already cached" warning."""
    spark = df.sparkSession
    if _cache_manager(spark).lookupCachedData(df._jdf).isDefined():
        return df
    df.persist()
    _PINS.setdefault(_session_key(df), []).append(df)
    return df


def release_pins(spark) -> int:
    """Unpersist every frame ``persist_once`` pinned in this session;
    returns how many were released. Blocking=False: executors drop
    blocks asynchronously, callers never wait."""
    pins = _PINS.pop(_session_key(spark), [])
    for df in pins:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — a dead session's pin
            pass
    return len(pins)


def pinned_count(spark) -> int:
    return len(_PINS.get(_session_key(spark), []))


def free_local_checkpoint(df: DataFrame) -> None:
    """Drop the RDD blocks behind a ``localCheckpoint()``-ed frame.

    ``release_pins`` only covers ``persist_once`` pins; iterative
    trainers (EM rounds, alternating-star) re-checkpoint per round and
    the SUPERSEDED rounds' blocks otherwise sit in executor memory
    until JVM GC gets around to them — repeated bench reps accumulate.
    Only call this on frames nothing will read again: a local
    checkpoint cannot be recomputed once its blocks are gone."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            _silence_checkpoint_unpersist_warning(df.sparkSession)
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort on a dead session
        pass


# Sessions whose JVM already had the MapPartitionsRDD logger raised —
# the Configurator call is idempotent but not free (a py4j round-trip
# per freed frame; EM trainers free three frames per round).
_WARNING_SILENCED: set[int] = set()


def _silence_checkpoint_unpersist_warning(spark) -> None:
    """Raise MapPartitionsRDD's log level to ERROR, once per session.

    Unpersisting a locally-checkpointed RDD makes Spark warn that the
    lineage cannot be recomputed — exactly the property the caller
    relies on (the freed frame is a SUPERSEDED trainer round nothing
    reads again). Each EM round frees three frames, so a bench run
    would log the same no-information warning dozens of times (the
    WindowExec pattern, session._silence_bounded_window_warning).

    Deliberately NOT restored after the unpersist: blocks are dropped
    asynchronously (unpersist(False)), so the warning can fire after
    this call returns — restoring the level immediately would re-expose
    the exact message being silenced. The cost is that other WARNs from
    this one concrete RDD class stay suppressed for the session; in
    practice MapPartitionsRDD logs nothing else at WARN in local mode,
    and the level is scoped to the narrowest logger log4j offers for
    this message (the warning is emitted by the concrete RDD subclass,
    so there is no per-message hook short of a log4j filter plugin)."""
    key = _session_key(spark)
    if key in _WARNING_SILENCED:
        return
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd.MapPartitionsRDD",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
        _WARNING_SILENCED.add(key)
    except Exception:  # noqa: BLE001 — cosmetic only
        pass


def engine_cache_is_clean(spark) -> bool:
    """True iff the session's CacheManager holds nothing — the
    harness assertion that no query pins memory behind the registry's
    back (a raw .persist() outside persist_once fails this after
    release_pins)."""
    return bool(_cache_manager(spark).isEmpty())

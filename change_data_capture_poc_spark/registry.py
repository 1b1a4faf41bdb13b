"""Named-query registry backing ``__spark_entry__.queries()``.

Every operator from SURVEY.md §2 (plus the north-star data-pipeline
operators) registers here as a (spark_fn, oracle_sql) pair. The driver
runs the Spark side and the DuckDB oracle side-by-side at sf=0.01 and
compares row-count + schema + order-insensitive value hash.

``oracle=None`` marks genuinely non-SQL-expressible operators (custom
stateful streaming, iterative algorithms) — the driver then records a
weaker rows-only check.

Cache contract (round 9): a query function MAY cache a frame the
returned plan references more than once (branch-shared register
tables, ranged vocabularies) — those caches must stay alive until the
caller materializes the result, so the query cannot release them
itself. Queries cache ONLY via ``functions.caching.persist_once``,
which (a) skips re-persisting an already-cached identical plan, so
warm re-runs never log "Asked to cache already cached data", and
(b) records the pin in a session-keyed registry. Callers release the
engine's pins — and nothing else in their session — with
``functions.caching.release_pins(spark)`` after materializing
(bench.py, tools/check_correctness.py, and tools/scale_probe.py all
do; check_correctness additionally asserts the CacheManager is empty
afterwards, so a raw ``.persist()`` added outside persist_once fails
the gate instead of accreting silently). Caches that are NOT
referenced by the returned plan (per-round training state) are still
released inside the query before it returns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a named query with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import for side effects: each module registers its queries.
    import change_data_capture_poc_spark.queries  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}

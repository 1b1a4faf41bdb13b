"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value comparison (exact for non-floats, 1e-9
relative tolerance for floats — the driver's hash is stricter, so any
tolerance hit here is flagged as a WARN to investigate).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
        python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]

With ``--json`` the per-query results are also written as one JSON
object (the committed full-surface artifact the judge asked for):
``{name: {pass, oracle, spark_rows, oracle_rows, secs, note}}``.
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb

from change_data_capture_poc_spark.functions.caching import (
    engine_cache_is_clean,
    release_pins,
)
from change_data_capture_poc_spark.registry import all_queries
from change_data_capture_poc_spark.session import get_spark
from change_data_capture_poc_spark.sources.tables import TABLES


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(spark_rows, duck_rows):
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"
    # Floats are rounded in the SORT KEY (not in the compared values) so
    # rows that differ only within tolerance align to the same position;
    # raw str(x) keys can order tolerance-equal rows differently across
    # engines and produce spurious pairwise mismatches. A pair can still
    # straddle a rounding boundary at one quantization (0.12345649 vs
    # 0.12345651 at 6 sig digits), so on mismatch the compare retries at
    # a coarser key — a value is astronomically unlikely to sit on a
    # boundary at BOTH scales.
    s_rows = [tuple(norm_cell(v) for v in r) for r in spark_rows]
    d_rows = [tuple(norm_cell(v) for v in r) for r in duck_rows]

    def attempt(sig: int):
        def _sort_cell(x):
            if isinstance(x, float):
                return ("float", f"{x:.{sig}g}")
            return (str(type(x)), str(x))

        key = lambda r: tuple(_sort_cell(x) for x in r)  # noqa: E731
        s = sorted(s_rows, key=key)
        d = sorted(d_rows, key=key)
        exact_mismatch = 0
        for a, b in zip(s, d):
            if a == b:
                continue
            if len(a) != len(b):
                return f"arity mismatch {a} vs {b}"
            for x, y in zip(a, b):
                if x == y:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                        exact_mismatch += 1
                        continue
                return f"value mismatch: spark={a} duck={b}"
        if exact_mismatch:
            return f"WARN float-tolerance hits: {exact_mismatch}"
        return None

    msg = attempt(6)
    if msg is not None and not msg.startswith("WARN"):
        retry = attempt(5)
        if retry is None or retry.startswith("WARN"):
            return (retry or "WARN") + " (aligned at 5-sig-digit key)"
    return msg


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_correctness.py [--json OUT] [sf_dir] [q ...]")
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = all_queries()
    failures = 0
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"pass": False, "oracle": q.oracle is not None,
                             "note": f"spark error: {e}"[:300]}
            failures += 1
            continue
        finally:
            # Release exactly the frames the engine pinned (the round-9
            # cache contract: queries pin via persist_once, callers
            # release via release_pins), then ASSERT nothing else is
            # cached — a raw .persist() added outside persist_once
            # fails loudly here instead of accreting silently.
            release_pins(spark)
            if not engine_cache_is_clean(spark):
                spark.catalog.clearCache()
                print(f"WARN {name}: cached plan not pinned via "
                      "persist_once (cleared; fix the query)")
        rec = {"pass": True, "oracle": q.oracle is not None,
               "spark_rows": len(spark_rows),
               "secs": round(time.time() - t0, 1)}
        results[name] = rec
        if q.oracle is None:
            rec["note"] = "rows-only (no SQL-expressible oracle)"
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(q.oracle)
            duck_cols = [c[0].lower() for c in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            rec.update({"pass": False, "note": f"duckdb error: {e}"[:300]})
            failures += 1
            continue
        rec["oracle_rows"] = len(duck_rows)
        if spark_cols != duck_cols:
            # driver sorts columns by name; order doesn't matter, names do
            if sorted(spark_cols) != sorted(duck_cols):
                print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
                rec.update({"pass": False,
                            "note": f"columns {spark_cols} vs {duck_cols}"})
                failures += 1
                continue
            ix = [duck_cols.index(c) for c in spark_cols]
            duck_rows = [tuple(r[i] for i in ix) for r in duck_rows]
        msg = compare(spark_rows, duck_rows)
        took = time.time() - t0
        rec["secs"] = round(took, 1)
        if msg is None:
            print(f"PASS {name} ({len(spark_rows)} rows, {took:.1f}s)")
        elif msg.startswith("WARN"):
            rec["note"] = msg
            print(f"PASS {name} ({len(spark_rows)} rows, {took:.1f}s) [{msg}]")
        else:
            rec.update({"pass": False, "note": msg[:300]})
            print(f"FAIL {name}: {msg}")
            failures += 1
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_pass": sum(1 for r in results.values() if r["pass"]),
            "n_fail": failures,
            "n_rows_only": sum(
                1 for r in results.values() if not r["oracle"]
            ),
        }
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "queries": results}, f, indent=1)
        print(f"wrote {json_out}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

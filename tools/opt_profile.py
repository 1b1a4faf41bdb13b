"""Round-13 optimization profiler: per-query wall time, shuffle bytes,
job count and plan-shape summary for a named set of bench queries.

Usage:
    PYTHONPATH=/root/repo python tools/opt_profile.py [N_TOP | names...]

Writes ``plans/$OPT_PROFILE_ROUND/<name>_before.txt`` (round dir
defaults to r14; ``OPT_PROFILE_SUFFIX`` overrides the suffix, e.g.
``after``) with the formatted physical plan, and prints
one summary row per query: best-of-3 seconds, shuffle MB (one rep),
driver-store job count delta, and Exchange / join-strategy / Python-eval
node counts greppable from the captured plan. Measurement only — never
imported by the engine.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from change_data_capture_poc_spark.functions.caching import release_pins
from change_data_capture_poc_spark.registry import all_queries
from change_data_capture_poc_spark.session import get_spark
from tools.probe_common import run_query, mb

PLAN_NODES = (
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "Window",
    "Sort",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
)


def plan_counts(plan: str) -> dict[str, int]:
    counts = {}
    for node in PLAN_NODES:
        # operator-list lines look like "+- Exchange ..." / "* Sort ...";
        # count word-anchored occurrences in the numbered details section
        # header lines like "(4) Exchange" to avoid double counting.
        n = len(re.findall(rf"^\(\d+\) {node}\b", plan, re.M))
        counts[node] = n
    return counts


def job_count(spark) -> int:
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    n = 0
    while it.hasNext():
        it.next()
        n += 1
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("OPT_PROFILE_SUFFIX", "before")
    reps = int(os.environ.get("OPT_PROFILE_REPS", "3"))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("OPT_PROFILE_ROUND", "r14")
    )
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="opt_profile")
    qs = all_queries()

    args = sys.argv[1:]
    if len(args) == 1 and args[0].isdigit():
        # top-N from the committed bench detail
        import json
        import subprocess

        rec = json.loads(
            subprocess.run(
                ["git", "-C", here, "show", "HEAD:BENCH_DETAIL.json"],
                capture_output=True,
                text=True,
            ).stdout
        )
        names = [
            n
            for n, _ in sorted(
                rec["queries"].items(), key=lambda kv: -kv[1]
            )[: int(args[0])]
        ]
    elif args:
        names = args
    else:
        names = list(qs)

    # Warm the JVM + listing once, outside every timed region.
    qs["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_pins(spark)

    print(
        f"{'query':42s} {'best3':>7s} {'shufMB':>9s} {'jobs':>5s} "
        f"{'Exch':>4s} {'BExch':>5s} {'SMJ':>3s} {'SHJ':>3s} {'BHJ':>3s} "
        f"{'Win':>3s} {'Sort':>4s} {'Py':>3s}"
    )
    rows = []
    for name in names:
        if name not in qs:
            print(f"{name:42s} NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"opt_profile: {name}")
        df = qs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        release_pins(spark)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        pc = plan_counts(plan)

        j0 = job_count(spark)
        best = None
        shuf = None
        for _ in range(reps):
            el, by = run_query(spark, qs, name, sf_dir)
            best = el if best is None else min(best, el)
            shuf = by if shuf is None else shuf
        jobs = job_count(spark) - j0
        py = (
            pc["BatchEvalPython"]
            + pc["ArrowEvalPython"]
            + pc["MapInPandas"]
            + pc["PythonMapInArrow"]
        )
        row = {
            "name": name,
            "best": round(best, 3),
            "shuffle_mb": mb(shuf),
            "jobs_3reps": jobs,
            **pc,
        }
        rows.append(row)
        print(
            f"{name:42s} {best:7.3f} {mb(shuf):9.3f} {jobs:5d} "
            f"{pc['Exchange']:4d} {pc['BroadcastExchange']:5d} "
            f"{pc['SortMergeJoin']:3d} {pc['ShuffledHashJoin']:3d} "
            f"{pc['BroadcastHashJoin']:3d} {pc['Window']:3d} "
            f"{pc['Sort']:4d} {py:3d}"
        )
        spark.sparkContext.setJobDescription(None)

    import json as _json

    # Merge-by-name into any existing record: successive targeted runs
    # accumulate one row per query (newest wins) instead of clobbering
    # the earlier batch's rows.
    path = os.path.join(outdir, f"profile_{suffix}.json")
    merged: dict[str, dict] = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = {r["name"]: r for r in _json.load(f)}
        except (OSError, ValueError):
            merged = {}
    merged.update({r["name"]: r for r in rows})
    with open(path, "w") as f:
        _json.dump(list(merged.values()), f, indent=1)
        f.write("\n")
    print(f"wrote {len(rows)} plans to {outdir} (suffix {suffix})")


if __name__ == "__main__":
    main()

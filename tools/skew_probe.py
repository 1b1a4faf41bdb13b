"""Skew probe: a deliberately Zipf-skewed join key at 1x and 8x.

The one scale hazard the 8x table in SCALING.md doesn't cover is a HOT
KEY (skewed CDC keys, cf. cdc_hotspot_keys): a plain shuffle join puts
every row of the hot key on one reducer, so wall-clock tracks the hot
key's growth no matter how many executors exist. The engine's two
answers are (a) AQE skew-join splitting (on by default in the session)
and (b) the manual salt+explode pattern (join_skew_salted). This probe
pins both: it builds a fact whose key distribution is 60% key-0 /
20% key-1 / uniform tail, joins it to a 10k-row dim with broadcast
DISABLED (a broadcast join would dodge the skew instead of handling
it), and times three strategies at 1x and 8x:

- smj_no_aqe:  sort-merge join, AQE skew handling OFF — the hazard.
- smj_aqe:     sort-merge join, AQE skew-join ON — the automatic fix.
- salted:      explicit salt-16 shuffle-hash join — the manual fix.

Appends a section to SCALING.md.

Usage: PYTHONPATH=/root/repo python tools/skew_probe.py [sf_dir] [N]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from change_data_capture_poc_spark.session import get_spark
from change_data_capture_poc_spark.sources.tables import load_table

_SALT_N = 16
_TAIL_KEYS = 10_000


def skewed_fact(spark, sf_dir: str, copies: int) -> DataFrame:
    """lineitem (the largest fact) with a deterministic Zipf-ish key:
    60% of rows on key 0, 20% on key 1, the rest uniform over the tail
    — same distribution at every scale, so N-times data means the hot
    key is N times hotter on ONE reducer under a plain hash shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("event_id"),
        F.col("l_extendedprice").alias("value"),
    )
    out = li
    for i in range(1, copies):
        out = out.unionByName(
            li.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        )
    h = F.pmod(F.hash("event_id"), F.lit(100))
    return out.select(
        "event_id",
        "value",
        F.when(h < 60, F.lit(0))
        .when(h < 80, F.lit(1))
        .otherwise(F.pmod(F.hash("event_id", F.lit(7)), F.lit(_TAIL_KEYS)) + 2)
        .cast("long")
        .alias("k"),
    )


def dim(spark) -> DataFrame:
    return spark.range(0, _TAIL_KEYS + 2).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg_"), F.pmod("id", F.lit(5))).alias("segment"),
    )


def run(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="skew_probe")
    # Broadcast would sidestep the skew entirely — force shuffle joins
    # so the probe measures skew HANDLING, not skew avoidance.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    d = dim(spark)

    def smj(fact: DataFrame) -> DataFrame:
        return fact.hint("merge").join(d, "k").select("k", "value", "segment")

    def salted(fact: DataFrame) -> DataFrame:
        f = fact.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_SALT_N)))
        ds = d.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1)))
        )
        return (
            f.hint("shuffle_hash")
            .join(ds, ["k", "salt"])
            .select("k", "value", "segment")
        )

    # AQE's skew split triggers on partition BYTES (default 256 MB — the
    # 100 TB operating point). The toy fact's hot partition is ~50 MB,
    # so the thresholds are scaled down proportionally for the aqe
    # strategy; at real scale the defaults fire the same split.
    aqe_tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2MB",
    }
    aqe_off = {
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
    }
    strategies = {
        "smj_no_aqe": (smj, aqe_off),
        "smj_aqe": (smj, aqe_tuned),
        "salted": (salted, aqe_off),
    }

    # Warm the JVM/codegen/file-listing outside the timed region.
    run(smj(skewed_fact(spark, sf_dir, 1)))

    rows = []
    for name, (fn, conf) in strategies.items():
        for key, val in conf.items():
            spark.conf.set(key, val)
        base = min(run(fn(skewed_fact(spark, sf_dir, 1))) for _ in range(3))
        big = min(run(fn(skewed_fact(spark, sf_dir, n))) for _ in range(3))
        ratio = round(big / base, 1) if base > 0 else float("nan")
        rows.append((name, round(base, 2), round(big, 2), ratio))
        print(rows[-1])

    # ---- Window path: the same hot key under a per-key ranking ----
    # AQE's skew handling is JOIN-only: a Window's hash-partitioned
    # exchange cannot be split (every row of a partition key must land
    # in one task for the sort to be correct), so the hot key's rows
    # always sort in one task no matter the cluster size. The probe
    # times three shapes for "top-10 rows per key by value":
    #   window_topk   - row_number + rank filter. Spark >= 3.5 inserts
    #                   WindowGroupLimit (partial per-map-partition
    #                   limit before the shuffle), which bounds the
    #                   SHUFFLED volume but still sorts the surviving
    #                   hot-key rows in one reducer task.
    #   window_plain  - row_number WITHOUT a rank filter (running-rank
    #                   output) — nothing to push down; the honest
    #                   hazard shape.
    #   grouped_topk  - operators/topk.grouped_topk, the engine's
    #                   algorithmic fix (partial heap + k-bounded agg).
    from change_data_capture_poc_spark.operators.topk import grouped_topk
    from pyspark.sql.window import Window

    k_top = 10
    w = Window.partitionBy("k").orderBy(
        F.col("value").desc(), F.col("event_id")
    )

    def window_topk(fact: DataFrame) -> DataFrame:
        return (
            fact.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k_top)
            .drop("rn")
        )

    def window_plain(fact: DataFrame) -> DataFrame:
        return fact.withColumn("rn", F.row_number().over(w))

    def agg_topk(fact: DataFrame) -> DataFrame:
        return grouped_topk(
            fact, ["k"], [("value", False), ("event_id", True)], k_top
        )

    for key, val in aqe_off.items():
        spark.conf.set(key, val)
    win_rows = []
    for name, fn in (
        ("window_topk", window_topk),
        ("window_plain", window_plain),
        ("grouped_topk", agg_topk),
    ):
        base = min(run(fn(skewed_fact(spark, sf_dir, 1))) for _ in range(3))
        big = min(run(fn(skewed_fact(spark, sf_dir, n))) for _ in range(3))
        ratio = round(big / base, 1) if base > 0 else float("nan")
        win_rows.append((name, round(base, 2), round(big, 2), ratio))
        print(win_rows[-1])

    win_section = (
        "## Window skew probe (tools/skew_probe.py)\n\n"
        "Same 60%-hot key under a PER-KEY RANKING instead of a "
        "join. AQE cannot help here at all: skew-join splitting "
        "applies only to joins, and a Window's partition must land "
        "whole in one task. `window_topk` (rank filter) gets "
        "Spark's WindowGroupLimit partial pushdown, which caps the "
        "shuffled rows at k per map partition; `window_plain` "
        "(running rank, no filter) is the unmitigated hazard — the "
        "hot key's full row set sorts in one task; `grouped_topk` "
        "is the engine's algorithmic fix "
        "(operators/topk.grouped_topk). Top-10 per key by value, "
        f"1x vs {n}x (base `{sf_dir}`, best-of-3, local[32]).\n\n"
        f"| shape | 1x sec | {n}x sec | ratio |\n|---|---|---|---|\n"
        + "".join(
            "| " + " | ".join(str(x) for x in r) + " |\n" for r in win_rows
        )
    )
    join_section = (
        "## Skew probe (tools/skew_probe.py)\n\n"
        f"Zipf-skewed join key (60% of rows on one key, 20% on a "
        f"second, uniform {_TAIL_KEYS}-key tail) joined to a "
        f"{_TAIL_KEYS + 2}-row dim with broadcast DISABLED, at 1x and "
        f"{n}x fact size (base `{sf_dir}`, best-of-3, local[32]). "
        f"`smj_no_aqe` is the hazard (hot key on one reducer); "
        f"`smj_aqe` (AQE skew-join split, skew thresholds scaled "
        f"to the toy data's ~50 MB hot partition — the 256 MB "
        f"defaults fire the same split at real scale) and `salted` "
        f"(salt-{_SALT_N} + exploded dim, the join_skew_salted "
        f"pattern) are the engine's two answers — both must stay "
        f"sub-linear (ratio < {n}) as the hot key grows {n}x.\n\n"
        f"| strategy | 1x sec | {n}x sec | ratio |\n|---|---|---|---|\n"
        + "".join(
            "| " + " | ".join(str(x) for x in r) + " |\n" for r in rows
        )
    )
    _replace_sections(
        "SCALING.md",
        {
            "## Skew probe (tools/skew_probe.py)": join_section,
            "## Window skew probe (tools/skew_probe.py)": win_section,
        },
    )
    print("wrote skew sections to SCALING.md")


def _replace_sections(path: str, sections: dict[str, str]) -> None:
    """Replace (or append) each '## title' section in-place, so
    re-running the probe refreshes its numbers instead of stacking
    duplicate sections."""
    import re

    try:
        with open(path) as f:
            doc = f.read()
    except OSError:
        # Missing artifact must not discard the finished measurements —
        # start a fresh document and append the sections.
        doc = "# SCALING — empirical scale probe (tools/scale_probe.py)\n"
    for title, content in sections.items():
        pat = re.compile(
            r"\n" + re.escape(title) + r"\n.*?(?=\n## |\Z)", re.S
        )
        if pat.search(doc):
            doc = pat.sub("\n" + content.rstrip("\n") + "\n", doc)
        else:
            doc = doc.rstrip("\n") + "\n\n" + content.rstrip("\n") + "\n"
    with open(path, "w") as f:
        f.write(doc)


if __name__ == "__main__":
    main()

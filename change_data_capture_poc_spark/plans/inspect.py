"""Physical-plan inspection helpers.

The engine's scale guarantees are plan *shapes*, not vibes: filters
reach the parquet scan, projections prune the read schema, small dims
broadcast, and an operator's shuffle count is what its algebra requires
— no more. These helpers turn `.explain("formatted")` into assertable
facts so tests can pin the shapes down (see tests/test_plans.py).

Counts are taken from the initial physical plan (pre-AQE): AQE may
later coalesce or convert exchanges at runtime, but the static plan is
the upper bound the operator author is accountable for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The text of `.explain("formatted")` (without printing it)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def plan_ops(df: DataFrame, plan: str | None = None) -> list[str]:
    """Operator names in plan order, e.g. ['Scan parquet', 'Filter', ...].

    Every helper here takes an optional pre-rendered ``plan`` string:
    each ``formatted_plan`` call is a JVM explainString round-trip, so
    a caller auditing several facets of one query (tools/audit_plans.py
    reads five) should render once and pass the text through.
    """
    ops = []
    for line in (plan if plan is not None else formatted_plan(df)).splitlines():
        m = re.match(r"^\(\d+\)\s+(.+?)(\s*\[codegen id : \d+\])?\s*$", line)
        if m:
            ops.append(m.group(1).strip())
    return ops


def shuffle_count(df: DataFrame, plan: str | None = None) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange excluded —
    broadcasts move a small side, not the data)."""
    return sum(1 for op in plan_ops(df, plan) if op == "Exchange")


def broadcast_count(df: DataFrame, plan: str | None = None) -> int:
    return sum(1 for op in plan_ops(df, plan) if op == "BroadcastExchange")


def window_count(df: DataFrame, plan: str | None = None) -> int:
    """Window execs in the plan. Each one fully sorts every row of its
    partition inside one task — fine over constant-bounded frames
    (quota tables, band summaries), a scale hazard over corpus-sized
    input keyed by a constant-cardinality column (the shape
    operators/topk.grouped_topk replaces)."""
    return sum(
        1
        for op in plan_ops(df, plan)
        if op == "Window" or op.startswith("WindowGroupLimit")
    )


# Unary nodes that sit between a Window and the Exchange satisfying its
# required child distribution. Anything else (join, aggregate, scan, …)
# terminates the distribution path: an Exchange below it belongs to that
# operator, not to the Window. Matched EXACTLY (name or "name " prefix),
# never as a bare substring prefix — "Sort" must not swallow
# SortMergeJoin/SortAggregate, which are non-unary and own their subtree.
_WINDOW_INPUT_CHAIN = (
    "Sort",
    "WindowGroupLimit",
    "ShuffleQueryStage",
    "AQEShuffleRead",
    "CustomShuffleReader",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
)


def _is_chain_node(node: str) -> bool:
    return any(
        node == name or node.startswith(name + " ") or node.startswith(name + "(")
        for name in _WINDOW_INPUT_CHAIN
    )


def unpartitioned_window_count(df: DataFrame) -> int:
    """Window execs whose OWN input distribution is a single-partition
    exchange — the move-all-data shape WindowExec warns about
    (suppressed session-wide because every current instance is a
    deliberate bounded-frame global_window; this counter is the
    replacement detection signal: tools/audit_plans.py surfaces it per
    query per round).

    Attribution walks only the Window's straight-line input chain —
    Window → [WindowGroupLimit] → Sort → Exchange, allowing AQE
    wrappers (ShuffleQueryStage / AQEShuffleRead / ReusedExchange) in
    between — and stops at the first Exchange or at any non-chain
    operator. A full-subtree scan over-attributes: a 1-row aggregate
    sitting on a join's build side *under* a doc_id-keyed window would
    count as that window's SinglePartition exchange even though the
    window itself shuffles on its corpus-cardinality key (the round-7
    PLANS.md misreports for text_tfidf_top_terms / vocab_coverage /
    zipf_fit). Chain nodes are unary, so "first deeper line" is exactly
    "the node's input".
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def depth(line: str) -> int:
        # Length of the tree-drawing prefix ("+- ", ":- ", ":  ", "   ").
        return re.match(r"^[ :+|-]*", line).end()

    def node_text(line: str) -> str:
        # Strip the tree prefix and any "*(N) " whole-stage-codegen tag.
        return re.sub(r"^\*\(\d+\)\s*", "", line[depth(line):])

    count = 0
    for i, line in enumerate(lines):
        d = depth(line)
        if not node_text(line).startswith(("Window", "WindowGroupLimit")):
            continue
        if node_text(line).startswith("WindowGroupLimit"):
            # Counted when we reach the Window it feeds (or, for a
            # map-side partial WindowGroupLimit, when we reach the
            # final one) — skip so a Window+its limit never double-count.
            continue
        for sub in lines[i + 1:]:
            if depth(sub) <= d:
                break  # next sibling / uncle: subtree ended
            node = node_text(sub)
            if node.startswith("Exchange SinglePartition"):
                count += 1
                break
            if node.startswith("Exchange"):
                break  # hash-partitioned input: the scale-safe shape
            if node.startswith(("ReusedExchange", "ReusedQueryStage")):
                # Leaf that embeds the reused exchange's own string — a
                # window fed via exchange reuse still moves all data if
                # the shared exchange is SinglePartition. Count from the
                # embedded text, then stop: a leaf has no input chain.
                if "Exchange SinglePartition" in node:
                    count += 1
                break
            if _is_chain_node(node):
                continue  # unary pass-through on the distribution path
            break  # any other operator owns whatever lies below it
    return count


def pushed_filters(df: DataFrame, plan: str | None = None) -> list[str]:
    """PushedFilters lists for each scan, in plan order."""
    return [
        line.split(":", 1)[1].strip()
        for line in (
            plan if plan is not None else formatted_plan(df)
        ).splitlines()
        if line.strip().startswith("PushedFilters")
    ]


def read_schemas(df: DataFrame, plan: str | None = None) -> list[str]:
    """ReadSchema struct strings for each scan, in plan order."""
    return [
        line.split(":", 1)[1].strip()
        for line in (
            plan if plan is not None else formatted_plan(df)
        ).splitlines()
        if line.strip().startswith("ReadSchema")
    ]

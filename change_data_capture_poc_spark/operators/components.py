"""Connected components via iterative min-label propagation — the
final step of a real dedup pipeline (LSH emits candidate PAIRS; the
training-data decision needs duplicate CLUSTERS, one keeper per
component).

Spark has no native graph operator, so this is the Pregel-style
formulation over DataFrames: every node starts labeled with its own id;
each round, every node takes the minimum of its label and its
neighbors' labels; at fixpoint every node carries its component's
minimum id. Deterministic — no randomness, no tie ambiguity.

Scale design:
- Each round is ONE shuffle (edge-label join + groupBy-min on the
  destination). Rounds needed = graph diameter; near-dup clusters are
  shallow (pairs/triangles, diameter ≤ ~3), so the loop converges in
  2-4 rounds. For adversarially long chains at 100 TB, switch to the
  alternating large-star/small-star formulation (Kiveris et al.,
  "Connected Components in MapReduce and Beyond") — O(log n) rounds;
  the per-round join structure is identical, so this module is the
  right skeleton either way.
- The driver-side loop holds only a per-round CHANGED counter (one
  ``count()`` action per round), never row data — the label table
  stays distributed.
- ``localCheckpoint`` every round truncates the lineage chain;
  without it, iteration k's plan replays all k-1 prior joins and the
  DAG grows quadratically (the classic iterative-algorithm trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from change_data_capture_poc_spark.functions.caching import persist_once


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from the node.

    Undirected: each input pair is traversed in both directions.
    Raises if the loop hits ``max_rounds`` without converging (a
    diameter that deep means the large-star/small-star variant is
    needed, not more rounds).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .transform(persist_once)
    )
    # try/finally: the non-convergence RuntimeError below must not leak
    # the persisted edge table into executor storage for the rest of
    # the application (same discipline merge_backend.py applies).
    try:
        labels = (
            e.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint()
        )

        for _ in range(max_rounds):
            nbr_min = (
                e.join(labels, e["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("component").alias("nbr_component"))
                .withColumnRenamed("a", "node")
            )
            # Carry the OLD label through the checkpoint so the changed
            # count is a filter over already-materialized rows — one join
            # per round, not two (the old shape re-joined new vs old labels
            # just to count diffs, doubling per-round shuffle work).
            stepped = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.col("component").alias("old_component"),
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_component", F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            changed = stepped.where(
                F.col("component") != F.col("old_component")
            ).count()
            labels = stepped.select("node", "component")
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )
    finally:
        e.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after a fixed number of power iterations over the
    undirected graph of ``edges``: r(v) = (1-d) + d * Σ r(u)/deg(u)
    over v's neighbors. Deterministic (fixed iteration count, no
    convergence tolerance), so a SQL oracle can unroll the same
    iterations as chained CTEs.

    Scale shape: per iteration ONE shuffle (contribution groupBy on
    the destination); degrees computed once and joined in (the join
    key equals the groupBy key, so AQE keeps it co-partitioned);
    ``localCheckpoint`` per iteration truncates lineage. Every node in
    a pair graph has degree >= 1 — no dangling-node mass term.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .transform(persist_once)
    )
    deg = e.groupBy("a").agg(F.count("*").alias("deg"))
    # Degrees are loop-invariant: fold them into the edge table ONCE so
    # each iteration is a single rank join + contribution shuffle, not
    # rank-join + degree-join.
    e_deg = e.join(deg, "a").transform(persist_once)
    ranks = deg.select(
        F.col("a").alias("node"), F.lit(1.0).alias("rank")
    ).localCheckpoint()

    for _ in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg["a"] == ranks["node"])
            .select(F.col("b").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = contribs.select(
            "node",
            (F.lit(1.0 - damping) + F.lit(damping) * F.col("csum")).alias(
                "rank"
            ),
        ).localCheckpoint()

    e_deg.unpersist()
    e.unpersist()
    return ranks

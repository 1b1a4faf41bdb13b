"""Window helpers.

``global_window`` is for deliberately single-partition rankings /
prefix sums over CONSTANT-BOUNDED (or strongly sub-linear) frames:
band summary tables (<= 32 rows by construction), per-source quota
tables (|sources| rows), per-input-partition offset tables
(n_partitions rows), day-grain dashboard curves, and Zipf-bounded
vocabulary ranks (~O(corpus^0.5)). Those frames are the OUTPUT of a
corpus-sized aggregation, so one task sorting them is the right plan —
but an empty partition spec makes WindowExec log its move-all-data
warning on every run, which buries real warnings. ``partitionBy(
lit(0))`` executes identically (all rows hash to one partition, same
ordering, same results) while recording in the plan that the single
partition is intentional and keeping stderr clean.

Corpus-sized rankings must NOT use this: constant-key top-k belongs to
``operators/topk.grouped_topk`` and global top-k to ``orderBy().limit``
(TakeOrdered) — see SCALING.md "Window skew probe" for the measured
hazard.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F


def global_window(*order_cols) -> WindowSpec:
    """Single-partition window over a bounded frame (see module doc)."""
    return Window.partitionBy(F.lit(0)).orderBy(*order_cols)


def global_agg_window() -> WindowSpec:
    """Unordered single-partition window: attach GLOBAL aggregates
    (totals, counts, normalizers) to every row of a bounded frame in
    one pass. Without orderBy the frame spans the whole partition, so
    ``F.sum(x).over(global_agg_window())`` equals the scalar total.

    This replaces the ``crossJoin(broadcast(df.agg(...)))`` shape for
    scalar attachment: the broadcast form re-executes the frame's whole
    upstream subtree once per scalar (a separate broadcast-build job
    and an extra plan branch each time — the DoReMi plan carried 16
    copies of its cached count-table scan this way), while the window
    computes the total over rows already materialized in the same
    stage. Same boundedness rule as ``global_window``: the input frame
    must be constant-bounded or strongly sub-linear (|sources| rows,
    band summaries), never the corpus."""
    return Window.partitionBy(F.lit(0))

"""bench.py drift-gate logic pins (pure functions, no Spark jobs)."""

from __future__ import annotations

import importlib.util
import os
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(_here, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
sys.path.insert(0, _here)
_spec.loader.exec_module(bench)


def test_drift_is_median_of_canary_ratios():
    timings = {
        "pricing_summary": 1.5,        # 1.5x
        "scd2_user_state": 3.0,        # 1.5x
        "dedup_minhash_lsh": 1.3,      # 1.3x
        "join_left_outer": 1.2,        # 1.2x
        "window_running_sum": 0.6,     # 1.2x
    }
    base = {
        "pricing_summary": 1.0,
        "scd2_user_state": 2.0,
        "dedup_minhash_lsh": 1.0,
        "join_left_outer": 1.0,
        "window_running_sum": 0.5,
    }
    assert bench._drift(timings, base) == 1.3  # odd count -> middle


def test_drift_single_outlier_cannot_drag_the_median():
    base = {c: 1.0 for c in bench.CANARIES}
    timings = {c: 1.0 for c in bench.CANARIES}
    timings["pricing_summary"] = 50.0  # one canary eats a burst
    assert bench._drift(timings, base) == 1.0


def test_drift_sanity_bounds():
    base = {c: 1.0 for c in bench.CANARIES}
    assert bench._drift({c: 10.0 for c in bench.CANARIES}, base) == 3.0
    assert bench._drift({c: 0.01 for c in bench.CANARIES}, base) == 0.5


def test_drift_none_without_baseline_overlap():
    assert bench._drift({"pricing_summary": 1.0}, {}) is None
    assert bench._drift({}, {"pricing_summary": 1.0}) is None
    # zero/negative baselines are skipped, not divided by
    assert bench._drift(
        {"pricing_summary": 1.0}, {"pricing_summary": 0.0}
    ) is None


def test_canaries_are_headline_members():
    for c in bench.CANARIES:
        assert c in bench.HEADLINE, c

"""Broadcast-boundedness ratchet (round-13, verdict item 3).

An unconditional ``F.broadcast`` on a corpus-DERIVED table is a bet
that the table stays driver-sized; when the bet loses, Spark hard-fails
(8 GB broadcast ceiling / driver OOM) instead of degrading to a
shuffle. Policy:

- bounded-by-construction sides (1-row scalars, literal ranges,
  constant-capped query sets, small enumerated domains) keep the
  unconditional hint but must carry a ``# bounded: <why>`` comment
  within the 4 lines above the call (or on the call line);
- corpus-derived sides route through
  ``functions.hints.vocab_broadcast`` (config-gated: a deployment
  whose table outgrows the driver flips spark.graft.vocab.broadcast
  and the join degrades to a shuffle, no code edit).

This test is the grep-based gate: every NEW ``F.broadcast`` site must
be annotated or gated — per-file unannotated counts may only go DOWN
from the frozen baseline below. datapipe.py is fully audited (count
pinned at zero); the baseline for the remaining files is burned down
as they get audited.
"""

from __future__ import annotations

import collections
import glob
import os
import re

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = os.path.join(_ROOT, "change_data_capture_poc_spark")

# The gate implementation itself legitimately calls F.broadcast.
_EXEMPT = {"functions/hints.py"}

# Frozen unannotated-site counts. The round-13 audit classified ALL
# ~160 sites (bounded comment or vocab_broadcast gate), so the
# baseline is empty: every F.broadcast call site in the package must
# carry its classification from now on.
_BASELINE: dict[str, int] = {}

_CALL = re.compile(r"F\.broadcast\(")
_MARKERS = ("bounded:", "corpus-derived")


def _unannotated_counts() -> dict[str, int]:
    counts: dict[str, int] = collections.Counter()
    for path in glob.glob(os.path.join(_PKG, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, _PKG).replace(os.sep, "/")
        if rel in _EXEMPT:
            continue
        with open(path) as f:
            lines = f.read().splitlines()
        for i, line in enumerate(lines):
            if _CALL.search(line) and "def " not in line:
                window = "\n".join(lines[max(0, i - 4): i + 1])
                if not any(m in window for m in _MARKERS):
                    counts[rel] += 1
    return dict(counts)


def test_datapipe_broadcasts_fully_audited():
    assert _unannotated_counts().get("queries/datapipe.py", 0) == 0


def test_no_new_unannotated_broadcasts():
    counts = _unannotated_counts()
    over = {
        rel: (n, _BASELINE.get(rel, 0))
        for rel, n in counts.items()
        if n > _BASELINE.get(rel, 0)
    }
    assert not over, (
        "new unannotated F.broadcast site(s) — add a '# bounded: <why>' "
        "comment within 4 lines above the call for constant-bounded "
        "sides, or route corpus-derived sides through "
        f"functions.hints.vocab_broadcast: {over} (found, baseline)"
    )


def test_baseline_is_not_stale():
    # When a file is audited below its frozen count, the baseline must
    # be lowered too, or the ratchet silently loosens for that file.
    counts = _unannotated_counts()
    stale = {
        rel: (counts.get(rel, 0), cap)
        for rel, cap in _BASELINE.items()
        if counts.get(rel, 0) < cap
    }
    assert not stale, (
        f"baseline higher than reality — lower these entries: {stale} "
        "(found, baseline)"
    )

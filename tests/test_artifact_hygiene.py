"""Committed sweep artifacts must be COMPLETE (ADVICE r9, low item):
`scripts/run_differential.py` checkpoints mid-sweep with an
``in_progress`` stamp and marks registry drift with ``INCOMPLETE_missing``
— neither may ever reach HEAD, because docs cite these files as
full-registry evidence. This gate scans every committed differential /
bench JSON at the repo root."""

from __future__ import annotations

import glob
import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_incomplete_committed_artifacts():
    offenders = []
    for path in sorted(
        glob.glob(os.path.join(_ROOT, "CORRECTNESS_*.json"))
        + glob.glob(os.path.join(_ROOT, "BENCH_*.json"))
    ):
        with open(path) as f:
            data = json.load(f)
        for bad in ("in_progress", "INCOMPLETE_missing"):
            if bad in data:
                offenders.append(f"{os.path.basename(path)}: {bad}")
    assert not offenders, (
        "incomplete sweep artifacts committed (re-run the sweep to "
        f"completion before committing): {offenders}"
    )

"""tools/bench_sweep.py drift discipline: a sweep whose same-session
reference runs disagree must be flagged contaminated (CLAUDE.md tunnel
noise rule), and a missing/errored reference run can never validate a
sweep."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_sweep import classify_drift  # noqa: E402


def rows(first, last):
    return [{"tag": "ref_first", "value": first, "batch": 48},
            {"tag": "point", "value": 1200.0, "batch": 56},
            {"tag": "ref_last", "value": last, "batch": 48}]


def test_stable_reference_validates():
    drift, contaminated = classify_drift(rows(1000.0, 1010.0))
    assert abs(drift - 1.0) < 1e-9 and not contaminated


def test_drifting_reference_contaminates():
    drift, contaminated = classify_drift(rows(1000.0, 950.0))
    assert abs(drift + 5.0) < 1e-9 and contaminated


def test_errored_reference_contaminates():
    _, contaminated = classify_drift(
        [{"tag": "ref_first", "error": "boom", "batch": 48},
         {"tag": "ref_last", "value": 1000.0, "batch": 48}])
    assert contaminated

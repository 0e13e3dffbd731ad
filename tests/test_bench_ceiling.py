"""bench.py's pct_of_measured_ceiling denominator must match the measured
lane (VERDICT r4 weak #1: the cached headline was quoted against a
per_step-calibrated composite).  select_ceiling() is the guard."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import select_ceiling  # noqa: E402

MULTI = {
    "config": {"arch": "ViT-B/16", "batch": 48, "teacher": "per_step"},
    "ceiling_tflops": 160.0,
    "source": "calib",
    "lanes": {
        "per_step": {"ceiling_tflops": 160.0},
        "cached": {"ceiling_tflops": 171.0},
        "int8": {"ceiling_tflops": 205.0},
    },
}

LEGACY = {
    "config": {"arch": "ViT-B/16", "batch": 48, "teacher": "per_step"},
    "ceiling_tflops": 160.7,
    "source": "calib",
}


def test_lane_selection_multi():
    for lane, want in [("per_step", 160.0), ("cached", 171.0),
                       ("int8", 205.0)]:
        ceil, extra = select_ceiling(MULTI, "ViT-B/16", 48, lane)
        assert ceil == want
        assert f"[lane {lane}]" in extra["ceiling_source"]


def test_arch_batch_mismatch_omits_pct():
    for arch, batch in [("ViT-B/32", 48), ("ViT-B/16", 64)]:
        ceil, extra = select_ceiling(MULTI, arch, batch, "per_step")
        assert ceil is None and "pct omitted" in extra["ceiling_note"]


def test_legacy_file_teacher_must_match():
    ceil, extra = select_ceiling(LEGACY, "ViT-B/16", 48, "per_step")
    assert ceil == 160.7 and "ceiling_source" in extra
    # the exact r4 hole: cached headline vs per_step-calibrated legacy file
    ceil, extra = select_ceiling(LEGACY, "ViT-B/16", 48, "cached")
    assert ceil is None and "no 'cached' lane" in extra["ceiling_note"]


def test_missing_lane_omits_pct():
    cal = {"config": {"arch": "ViT-B/16", "batch": 48,
                      "teacher": "per_step"},
           "ceiling_tflops": 1.0, "lanes": {"per_step":
                                            {"ceiling_tflops": 1.0}}}
    ceil, extra = select_ceiling(cal, "ViT-B/16", 48, "int8")
    assert ceil is None and "no 'int8' lane" in extra["ceiling_note"]


def test_repo_ceiling_json_resolves_for_all_lanes():
    """The committed CEILING.json must carry every lane bench.py can run
    at the default arch/batch — otherwise BENCH_r05 silently drops the
    pct for some lane."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CEILING.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no CEILING.json")
    with open(path) as f:
        cal = json.load(f)
    if "lanes" not in cal:
        import pytest

        pytest.skip("legacy single-lane CEILING.json (pre-r5)")
    for lane in ("per_step", "cached", "int8"):
        ceil, extra = select_ceiling(
            cal, cal["config"]["arch"], cal["config"]["batch"], lane)
        assert ceil is not None, (lane, extra)

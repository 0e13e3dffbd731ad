"""The one-command perf session's chain must itself execute end-to-end.

tools/run_perf_session.sh runs the round-5 healthy-session re-baseline
(drift-disciplined batch sweep -> winner-batch per-lane ceilings -> CoCoOp
roofline -> final full-artifact bench) the moment a tunnel probe comes back
clean (VERDICT r4 next #1).  Tunnel health is erratic (CLAUDE.md round-5
log), so CI proves the CHAIN works: --dry-run drives the same stages on CPU
with the tiny arch, and the degraded-probe gate must abort loudly."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def test_session_dry_run_chain(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PERF_SESSION_OUT"] = str(tmp_path / "sess")
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "tools", "run_perf_session.sh"),
         "--dry-run"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    assert "COMPLETE" in proc.stdout

    out = tmp_path / "sess"
    sweep = json.loads((out / "BENCH_SWEEP.json").read_text())
    assert {r["tag"] for r in sweep["rows"]} >= {"ref_first", "ref_last"}

    # the lane calibration really produced all three lanes at the winner
    ceiling = json.loads((out / "CEILING.json").read_text())
    assert set(ceiling["lanes"]) == {"per_step", "cached", "int8"}
    summary = json.loads((out / "session.json").read_text())
    assert ceiling["config"]["batch"] == summary["winner_batch"]

    cocoop = json.loads((out / "CEILING_COCOOP.json").read_text())
    assert set(cocoop["lanes"]) == {"cocoop"}
    assert cocoop["config"]["step"] == "cocoop"

    assert summary["failed_steps"] is False
    assert summary["final"]["value"] > 0


def _run_retry(tmp_path, stub_lines, deadline="23:59", sleep="0"):
    """Drive tools/perf_session_retry.sh with a stub session command that
    exits with the next code from a queue file (one attempt per line)."""
    queue = tmp_path / "codes.txt"
    queue.write_text("\n".join(stub_lines) + "\n")
    stub = tmp_path / "stub.sh"
    stub.write_text(
        "#!/bin/bash\n"
        f"Q={queue}\n"
        "RC=$(head -1 \"$Q\")\n"
        "tail -n +2 \"$Q\" > \"$Q.t\" && mv \"$Q.t\" \"$Q\"\n"
        "echo \"stub attempt rc=$RC\"\n"
        "exit \"$RC\"\n")
    stub.chmod(0o755)
    env = dict(os.environ)
    env["PERF_RETRY_CMD"] = f"bash {stub}"
    env["PERF_RETRY_DEADLINE"] = deadline
    env["PERF_RETRY_SLEEP"] = sleep
    return subprocess.run(
        ["bash", os.path.join(ROOT, "tools", "perf_session_retry.sh")],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300,
    )


def test_retry_wrapper_passes_through_success(tmp_path):
    proc = _run_retry(tmp_path, ["0"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "attempt 1" in proc.stdout


def test_retry_wrapper_backs_off_on_degraded_then_succeeds(tmp_path):
    proc = _run_retry(tmp_path, ["2", "2", "0"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "attempt 3" in proc.stdout
    assert proc.stdout.count("degraded — sleeping") == 2


def test_retry_wrapper_stops_on_failed_session(tmp_path):
    # rc=1 (session ran, a step failed) must NOT be retried automatically —
    # artifacts are kept for inspection, no more TPU time is burned.
    proc = _run_retry(tmp_path, ["1", "0"])
    assert proc.returncode == 1
    assert "attempt 2" not in proc.stdout


def test_retry_wrapper_respects_deadline(tmp_path):
    proc = _run_retry(tmp_path, ["0"], deadline="00:00")
    assert proc.returncode == 3
    assert "past deadline" in proc.stdout
    assert "attempt 1" not in proc.stdout


def test_session_degraded_probe_exits_2(tmp_path):
    """Real mode behind a slow probe must abort (rc=2) BEFORE any bench
    work — starting a perf session on a degraded tunnel wastes the session
    and risks wedging the device (CLAUDE.md probe discipline)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # probe runs fine on CPU...
    env["PERF_PROBE_MAX_S"] = "0"  # ...but any nonzero duration = degraded
    env["PERF_SESSION_OUT"] = str(tmp_path / "sess")
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "tools", "run_perf_session.sh")],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 2, proc.stdout[-2000:] + proc.stderr[-1000:]
    assert "TUNNEL DEGRADED" in proc.stdout
    verdict = json.loads(
        (tmp_path / "sess" / "session.json").read_text())["verdict"]
    assert verdict == "degraded"

#!/usr/bin/env python
"""Batch sweep for bench.py with the tunnel-drift discipline built in.

Round 4's cached-lane batch sweep died with a degraded tunnel and was never
finished (VERDICT r4 weak #3); worse, cross-session throughput deltas under
~5% are tunnel noise (CLAUDE.md), so a sweep is only meaningful with a
SAME-SESSION re-reference.  This driver encodes that protocol:

  1. run the reference batch (current default, 48) FIRST,
  2. run every candidate batch,
  3. re-run the reference batch LAST — if first/last disagree by >2%,
     the whole sweep is flagged drift-contaminated in the output.

Each point is one `python bench.py` subprocess (BENCH_BATCH=N), so every
row is the real headline pipeline.  Results land in BENCH_SWEEP.json (one
row per run, flags included) and a markdown table on stdout.

Usage: python tools/bench_sweep.py [--batches 40,44,48,52,56,60,64]
       [--ref 48] [--out BENCH_SWEEP.json] [--env K=V ...]
Extra lanes inherit the caller's BENCH_* env (e.g. BENCH_HEADLINE).
e2e is disabled per point (BENCH_E2E=0) — the sweep measures the fused
step lane; re-run bench.py normally at the winner for the full artifact.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(batch, extra_env, timeout):
    env = dict(os.environ)
    env["BENCH_BATCH"] = str(batch)
    env.setdefault("BENCH_E2E", "0")
    for kv in extra_env:
        k, v = kv.split("=", 1)
        env[k] = v
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=timeout,
    )
    wall = time.time() - t0
    line = None
    for ln in reversed(proc.stdout.splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
            break
    if proc.returncode != 0 or line is None:
        return {"batch": batch, "error": (proc.stdout + proc.stderr)[-500:],
                "wall_s": round(wall, 1)}
    row = json.loads(line)
    row["batch"] = batch
    row["wall_s"] = round(wall, 1)
    return row


def classify_drift(rows, threshold_pct=2.0):
    """(drift_pct or None, contaminated) from the ref_first/ref_last rows."""
    first = next((r for r in rows if r.get("tag") == "ref_first"
                  and r.get("value")), None)
    last = next((r for r in rows if r.get("tag") == "ref_last"
                 and r.get("value")), None)
    if not (first and last):
        return None, True
    drift = 100.0 * (last["value"] - first["value"]) / first["value"]
    return drift, abs(drift) > threshold_pct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="40,44,48,52,56,60,64")
    ap.add_argument("--ref", type=int, default=48,
                    help="reference batch, run first AND last for drift")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_SWEEP.json"))
    ap.add_argument("--timeout", type=int, default=2700,
                    help="per-point timeout; never shorten on TPU "
                         "(killing an in-flight program wedges the tunnel)")
    ap.add_argument("--env", nargs="*", default=[],
                    help="extra BENCH_* overrides, K=V")
    args = ap.parse_args()

    batches = [int(b) for b in args.batches.split(",")]
    plan = ([("ref_first", args.ref)]
            + [("point", b) for b in batches if b != args.ref]
            + [("ref_last", args.ref)])

    rows = []
    for tag, b in plan:
        print(f"[{tag}] bs {b} ...", flush=True)
        row = run_point(b, args.env, args.timeout)
        row["tag"] = tag
        rows.append(row)
        val = row.get("value")
        print(f"[{tag}] bs {b}: {val} img/s "
              f"({row.get('wall_s')}s wall)", flush=True)

    drift_pct, contaminated = classify_drift(rows)
    first = next((r for r in rows if r["tag"] == "ref_first"
                  and r.get("value")), None)

    result = {
        "rows": rows,
        "ref_batch": args.ref,
        "ref_drift_pct": round(drift_pct, 2) if drift_pct is not None else None,
        "drift_contaminated": contaminated,
        "note": ("reference first/last runs differ by >2% — treat every "
                 "delta in this sweep as tunnel noise and re-run"
                 if contaminated else
                 "same-session reference stable; deltas are real"),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")

    print("\n| batch | img/s | vs ref-first | wall s | tag |")
    print("|---|---|---|---|---|")
    ref_v = first["value"] if first else None
    for r in rows:
        v = r.get("value")
        rel = (f"{100.0 * (v - ref_v) / ref_v:+.1f}%"
               if v and ref_v else "—")
        print(f"| {r['batch']} | {v or 'ERR'} | {rel} "
              f"| {r.get('wall_s')} | {r['tag']} |")
    if contaminated:
        print("\n!! drift-contaminated sweep — do not adopt a new optimum "
              "from these numbers")


if __name__ == "__main__":
    main()

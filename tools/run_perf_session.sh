#!/bin/bash
# One-command round-5 perf session (VERDICT r4 next #1) with the tunnel
# discipline built in.
#
# The round-4/5 seams are all tooling-ready but need ONE healthy TPU
# session: the cached-lane batch sweep (drift-disciplined), per-lane
# roofline ceilings calibrated at the SWEPT batch (bench.py only quotes
# pct_of_measured_ceiling when arch/batch/teacher all match), the CoCoOp
# roofline, and the final full-artifact bench at the winner.  Tunnel
# health is erratic (see CLAUDE.md round-5 log: tiny-op probes 87-720 s
# on a degraded day vs <10 s healthy), so the session must be launchable
# the moment a probe comes back clean — this script chains everything:
#
#   0. probe gate   fsvlm_tpu.utils.device_probe, run to completion
#                   (never killed); abort if it exceeds PERF_PROBE_MAX_S
#   1. batch sweep  tools/bench_sweep.py (ref batch first AND last;
#                   >2% first/last drift flags the sweep contaminated)
#   2. winner pick  best non-error point if the sweep is clean,
#                   else the reference batch
#   3. lane ceilings tools/calibrate_ceiling.py --lanes per_step,cached,int8
#                   at the winner batch -> CEILING.json
#   4. CoCoOp ceiling --step cocoop (bs 32 x 500) -> CEILING_COCOOP.json
#   5. final bench  full artifact (ladder + e2e) at the winner batch
#
# --dry-run exercises the SAME chain on CPU with the tiny arch (no probe,
# tiny shapes, artifacts under $OUT only) so CI proves the chain executes
# (tests/test_perf_session.py, slow tier).
#
# env: PERF_SESSION_OUT   artifact dir        (default output/perf_session)
#      PERF_PROBE_MAX_S   probe health bound  (default 30, CLAUDE.md rule)
#      PERF_SWEEP_BATCHES sweep points        (default 40,44,48,52,56,60,64)
#      PERF_REF_BATCH     drift reference     (default 48)
#      PERF_SESSION_COCOOP  0 skips step 4    (default 1)
# Discipline inherited from the tools: every bench point gets timeout 2700
# (never shortened — killing an in-flight TPU program wedges the tunnel),
# points run sequentially, and nothing else should contend for CPU.
set -u
cd "$(dirname "$0")/.."
OUT=${PERF_SESSION_OUT:-output/perf_session}
mkdir -p "$OUT"
DRY=0
[ "${1:-}" = "--dry-run" ] && DRY=1
PROBE_MAX=${PERF_PROBE_MAX_S:-30}
BATCHES=${PERF_SWEEP_BATCHES:-40,44,48,52,56,60,64}
REF=${PERF_REF_BATCH:-48}

note() { echo; echo "=== perf session: $* ==="; }

if [ "$DRY" = 1 ]; then
    # CPU chain: tiny arch, tiny step counts, artifacts stay in $OUT
    export JAX_PLATFORMS=cpu
    export BENCH_ARCH=test-tiny BENCH_CLASSES=7 BENCH_STEPS=4 \
           BENCH_SCAN=2 BENCH_LADDER=0
    BATCHES=${PERF_SWEEP_BATCHES:-2,4}
    REF=${PERF_REF_BATCH:-2}
    CEILING_OUT="$OUT/CEILING.json"
    COCOOP_OUT="$OUT/CEILING_COCOOP.json"
    CAL_EXTRA=(--dry)
    COCOOP_ARGS=(--batch 2 --classes 4 --cocoop-chunk 2)
else
    CEILING_OUT=CEILING.json
    COCOOP_OUT=CEILING_COCOOP.json
    CAL_EXTRA=()
    COCOOP_ARGS=(--batch 32 --classes 500)

    note "step 0: tunnel probe (bound ${PROBE_MAX}s, self-terminating at 1170s)"
    PROBE_S=$(python -c "
import time
t0 = time.time()
from fsvlm_tpu.utils import device_probe
ok = device_probe(timeout_s=1170)
print(round(time.time() - t0, 1) if ok else 'hung')
" | tail -1)
    echo "probe: ${PROBE_S}s"
    if [ "$PROBE_S" = "hung" ] || \
       python -c "import sys; sys.exit(0 if float('$PROBE_S') > $PROBE_MAX else 1)"; then
        echo "TUNNEL DEGRADED (probe ${PROBE_S}s > ${PROBE_MAX}s) — no perf" \
             "session; back off (do NOT re-probe for ~1h, see CLAUDE.md)"
        echo "{\"probe_s\": \"$PROBE_S\", \"verdict\": \"degraded\"}" \
             > "$OUT/session.json"
        exit 2
    fi
fi

FAILED=0

note "step 1: drift-disciplined batch sweep (ref $REF, points $BATCHES)"
python tools/bench_sweep.py --batches "$BATCHES" --ref "$REF" \
    --out "$OUT/BENCH_SWEEP.json" || FAILED=1

note "step 2: winner selection"
WINNER=$(python -c "
import json
d = json.load(open('$OUT/BENCH_SWEEP.json'))
rows = [r for r in d['rows'] if r.get('value')]
if d['drift_contaminated'] or not rows:
    print(d['ref_batch'])
else:
    print(max(rows, key=lambda r: r['value'])['batch'])
")
echo "winner batch: $WINNER (drift note: $(python -c "
import json; print(json.load(open('$OUT/BENCH_SWEEP.json'))['note'])"))"

note "step 3: per-lane roofline ceilings at bs $WINNER -> $CEILING_OUT"
python tools/calibrate_ceiling.py --batch "$WINNER" \
    --lanes per_step,cached,int8 --out "$CEILING_OUT" "${CAL_EXTRA[@]}" \
    | tee "$OUT/calibrate_lanes.log" || FAILED=1

if [ "${PERF_SESSION_COCOOP:-1}" = 1 ]; then
    note "step 4: CoCoOp roofline -> $COCOOP_OUT"
    python tools/calibrate_ceiling.py --step cocoop "${COCOOP_ARGS[@]}" \
        --out "$COCOOP_OUT" "${CAL_EXTRA[@]}" \
        | tee "$OUT/calibrate_cocoop.log" || FAILED=1
fi

note "step 5: final full-artifact bench at bs $WINNER"
BENCH_BATCH="$WINNER" BENCH_E2E="${BENCH_E2E:-$([ "$DRY" = 1 ] && echo 0 || echo 1)}" \
    python bench.py | tee "$OUT/bench_final.log" || FAILED=1
grep '^{' "$OUT/bench_final.log" | tail -1 > "$OUT/BENCH_FINAL.json"

python - "$OUT" "$WINNER" "$FAILED" <<'EOF'
import json, sys
out, winner, failed = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
summary = {"winner_batch": winner, "failed_steps": bool(failed)}
try:
    sweep = json.load(open(f"{out}/BENCH_SWEEP.json"))
    summary["ref_drift_pct"] = sweep["ref_drift_pct"]
    summary["drift_contaminated"] = sweep["drift_contaminated"]
except Exception as e:
    summary["sweep_error"] = str(e)
try:
    summary["final"] = json.load(open(f"{out}/BENCH_FINAL.json"))
except Exception as e:
    summary["final_error"] = str(e)
with open(f"{out}/session.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))
EOF

if [ "$FAILED" = 1 ]; then
    note "FAILED — see $OUT (partial artifacts kept)"
    exit 1
fi
note "COMPLETE — artifacts in $OUT"
if [ "$DRY" = 0 ]; then
    echo "next: commit CEILING.json CEILING_COCOOP.json $OUT/BENCH_SWEEP.json"
    echo "      and fold the numbers into PERF.md (sweep table + CoCoOp pct)"
fi

#!/usr/bin/env python
"""Calibrate the MXU ceiling with the step's OWN GEMM shapes (roofline).

Round 3 quoted MFU against a 98.9 TF/s "measured dense ceiling" from a
4096^3 bf16 chain — but the step's own fusions measure faster (the teacher
MLP GEMM ran at ~156 TF/s effective, PERF.md), i.e. the denominator was
understated and the resulting "72% of ceiling" flattered the step
(VERDICT r3 weak #1).  This tool replaces that number with a defensible
one:

1. Enumerate the exact GEMM inventory of the PromptSRC step
   (fsvlm_tpu/utils/flops.py — true FLOPs, dgrad-only backward).
2. Microbench EVERY distinct GEMM shape in that inventory on the current
   backend, as a dependent ping-pong chain: y = x @ W1 ((M,K)x(K,N)) then
   x' = y @ W2 ((M,N)x(N,K)) — the second GEMM is exactly the family's
   dgrad geometry, the data dependence defeats loop-invariant hoisting and
   CSE, and the whole chain runs in ONE dispatch (lax.scan) so the tunnel
   RTT is amortized exactly like the fused train step.
3. Compute the FLOP-weighted roofline: ideal step time = sum_i F_i / R_i
   over families, composite ceiling = F_total / ideal_time.

Writes CEILING.json at the repo root (read by bench.py for
pct_of_measured_ceiling) and prints a per-op-class markdown table for
PERF.md.

Usage:  python tools/calibrate_ceiling.py [--batch 48] [--classes 100]
        [--iters 32] [--out CEILING.json] [--dry]
`--dry` runs tiny iteration counts (CPU smoke / CI).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_family(jax, jnp, m, k, n, batch, iters, dtype, par=None):
    """Achieved TF/s of the (batch x (M,K)@(K,N) -> (M,N)@(N,K)) ping-pong.

    ``par`` independent chains run per scan iteration: a single dependent
    chain exposes each GEMM's full latency back-to-back, which measures
    latency, not throughput — small GEMMs read absurdly low (first
    calibration run: text_proj "1.2 TF/s", 16 us of work behind ~100 us of
    serialization) and even the large MLP family lost ~2x.  A roofline
    denominator needs the per-shape THROUGHPUT the step's fused program
    actually gets (its GEMMs overlap with neighbours); independent chains
    restore that pipelining while keeping every GEMM's exact shape.

    Timing discipline (the second calibration-run bug, caught when the
    composite "ceiling" landed BELOW the step's own achieved GEMM rate):
    a ``device_get`` per timed rep pays the axon tunnel's RTT (~10-30 ms)
    per rep, which swamps small families — text_attn read "0.2 TF/s" and
    its fake 4.5 ms "ideal" pushed ideal_step_ms past the real measured
    step.  The fix: dispatch all reps asynchronously (they queue and run
    back-to-back on-device) behind ONE end-of-window fetch, and grow the
    scan length adaptively until each family's timed window is >=0.5 s of
    device compute, making that single RTT <=~5 % noise.
    """
    import numpy as np

    if par is None:
        par = int(os.environ.get("CEIL_PAR", "8"))
        # cap the working set of huge families (the big shapes pipeline
        # fine with fewer chains and par*X must fit comfortably in HBM)
        while par > 2 and par * batch * m * max(k, n) * 2 > 1 << 30:
            par //= 2
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)

    if batch == 1:
        xs, w1, w2 = [mk(m, k) for _ in range(par)], mk(k, n), mk(n, k)
    else:
        xs = [mk(batch, m, k) for _ in range(par)]
        w1, w2 = mk(batch, k, n), mk(batch, n, k)
    # bound the chain's magnitude growth statically (~1.2x/iter at these
    # randn scales) so the body is PURE GEMMs
    w2 = w2 * jnp.asarray(1e-3, dtype)

    def timed(niters, reps, xs):
        @jax.jit
        def chain(xs, w1, w2):
            def body(xs, _):
                return [(x @ w1) @ w2 for x in xs], ()

            xs, _ = jax.lax.scan(body, xs, (), length=niters)
            return xs

        out = chain(xs, w1, w2)  # compile + warmup
        jax.block_until_ready(out)
        _ = jax.device_get(out[0][..., 0, 0])
        t0 = time.time()
        for _ in range(reps):
            out = chain(out, w1, w2)  # async: reps pipeline on-device
        _ = jax.device_get(out[0][..., 0, 0])  # one RTT for the window
        return time.time() - t0, out

    reps = 3
    niters = iters
    # --dry (tiny iters) disables the adaptive window: CPU smoke only
    # checks plumbing, not rates
    min_window = (0.0 if iters <= 2 else
                  float(os.environ.get("CEIL_MIN_WINDOW_S", "0.5")))
    dt, xs = timed(niters, reps, xs)
    while dt < min_window and niters < 500_000:
        niters = min(max(niters * 2, int(niters * 0.8 * min_window
                                         / max(dt, 1e-3))), 500_000)
        dt, xs = timed(niters, reps, xs)
    flops = 2 * 2 * m * k * n * batch * niters * reps * par
    return flops / dt / 1e12


def measure_family_int8(jax, jnp, m, k, n, batch, iters, par=None):
    """Achieved TOP/s of the W8A8 ping-pong — the int8 lane's ceiling.

    Mirrors ``measure_family`` but with int8 operands and the real int8
    path's per-GEMM epilogue (ops/quant.py:int8_linear static-scale form):
    dot_general int8xint8->int32, dequant (one f32 multiply), requant for
    the next GEMM (scaled round + clip + int8 cast).  The epilogue VPU cost
    is part of the lane's ceiling — the real graph pays it per quantized
    GEMM, so a pure-int8-GEMM number would overstate the ceiling the same
    way the 4096^3 chain overstated bf16's.
    """
    import numpy as np

    if par is None:
        par = int(os.environ.get("CEIL_PAR", "8"))
        while par > 2 and par * batch * m * max(k, n) > 1 << 30:
            par //= 2
    rng = np.random.RandomState(0)

    def mk8(*shape):
        return jnp.asarray(
            rng.randint(-127, 128, shape, dtype=np.int32).astype(np.int8))

    if batch == 1:
        xs = [mk8(m, k) for _ in range(par)]
        w1, w2 = mk8(k, n), mk8(n, k)
    else:
        xs = [mk8(batch, m, k) for _ in range(par)]
        w1, w2 = mk8(batch, k, n), mk8(batch, n, k)
    # arbitrary dequant/requant scales: timing only cares about the op mix
    s1 = jnp.float32(1.0 / (127.0 * max(k, 1) ** 0.5))
    s2 = jnp.float32(1.0 / (127.0 * max(n, 1) ** 0.5))

    def dot8(a, b):
        nd = a.ndim - 1
        if batch == 1:
            dn = (((nd,), (0,)), ((), ()))
        else:
            dn = (((nd,), (1,)), ((0,), (0,)))
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)

    def requant(y32, s):
        yf = y32.astype(jnp.float32) * s * 127.0
        return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)

    def timed(niters, reps, xs):
        @jax.jit
        def chain(xs, w1, w2):
            def body(xs, _):
                return [requant(dot8(requant(dot8(x, w1), s1), w2), s2)
                        for x in xs], ()

            xs, _ = jax.lax.scan(body, xs, (), length=niters)
            return xs

        out = chain(xs, w1, w2)
        jax.block_until_ready(out)
        _ = jax.device_get(out[0][..., 0, 0])
        t0 = time.time()
        for _ in range(reps):
            out = chain(out, w1, w2)
        _ = jax.device_get(out[0][..., 0, 0])
        return time.time() - t0, out

    reps = 3
    niters = iters
    min_window = (0.0 if iters <= 2 else
                  float(os.environ.get("CEIL_MIN_WINDOW_S", "0.5")))
    dt, xs = timed(niters, reps, xs)
    while dt < min_window and niters < 500_000:
        niters = min(max(niters * 2, int(niters * 0.8 * min_window
                                         / max(dt, 1e-3))), 500_000)
        dt, xs = timed(niters, reps, xs)
    flops = 2 * 2 * m * k * n * batch * niters * reps * par
    return flops / dt / 1e12


# the int8 teacher config quantizes exactly the tower attn+mlp GEMM weights
# (ops/quant.py:quantize_blocks families=("attn","mlp")); patch embed, the
# embed projection, and the act-x-act attention bmms stay float
_INT8_TEACHER_GEMMS = frozenset(
    {"teacher_qkv", "teacher_outproj", "teacher_mlp1", "teacher_mlp2"})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--lanes", default="per_step,cached,int8",
                    help="comma list of teacher lanes to calibrate")
    ap.add_argument("--teacher", default=None,
                    choices=["per_step", "cached", "int8"],
                    help="(legacy) calibrate a single lane")
    ap.add_argument("--step", default="promptsrc",
                    choices=["promptsrc", "cocoop"],
                    help="which train step's GEMM inventory to calibrate; "
                         "cocoop = the class-chunked CoCoOp step "
                         "(VERDICT r4 next #4) — use with --batch/--classes"
                         "/--cocoop-chunk and an explicit --out")
    ap.add_argument("--cocoop-chunk", type=int, default=128,
                    help="TRAINER.COCOOP.CLASS_CHUNK for --step cocoop")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CEILING.json"))
    ap.add_argument("--dry", action="store_true",
                    help="tiny iters (CPU smoke); does not write CEILING.json"
                         " unless --out is explicitly given")
    args = ap.parse_args()

    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import ARCHS
    from fsvlm_tpu.utils import flops as F

    cfg = ARCHS[os.environ.get("BENCH_ARCH", "ViT-B/16")]
    # the bench's EOT-truncated text length for "a photo of a class {i}."
    # prompts is 10 (build_prompt_context(truncate=True)); keep in sync
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "10"))
    if args.step == "cocoop":
        lanes = ["cocoop"]
    else:
        lanes = ([args.teacher] if args.teacher
                 else [s.strip() for s in args.lanes.split(",") if s.strip()])

    iters = 2 if args.dry else args.iters
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    # families measured once across lanes: the per_step/cached/int8 lanes
    # share most shapes, only the inventory (and the int8 families' dtype)
    # differs — key the measurement cache on (shape, dtype-class)
    measured = {}

    def rate_of(m, k, n, batch, is_int8):
        mkey = (m, k, n, batch, is_int8)
        if mkey not in measured:
            if is_int8:
                measured[mkey] = measure_family_int8(
                    jax, jnp, m, k, n, batch, iters)
            else:
                measured[mkey] = measure_family(
                    jax, jnp, m, k, n, batch, iters, dtype)
        return measured[mkey]

    lanes_out = {}
    for lane in lanes:
        if lane == "cocoop":
            gemms = F.cocoop_step_gemms(cfg, args.batch, args.classes,
                                        text_len, chunk=args.cocoop_chunk)
        else:
            gemms = F.promptsrc_step_gemms(cfg, args.batch, args.classes,
                                           text_len, n_vpt=4, teacher=lane)
        total = F.total_flops(gemms)

        # dedup into measurement families by (m, k, n, batch, int8?);
        # accumulate step FLOPs per family.  The dgrad GEMMs of a linear
        # have the transposed geometry of its forward — the ping-pong chain
        # measures both, so fold (m,k,n) and (m,n,k) into one family keyed
        # by the forward orientation.  In the int8 lane the quantized
        # teacher GEMMs form int8 families measured with the W8A8 chain.
        fams = {}
        for g in gemms:
            is_int8 = lane == "int8" and g.name in _INT8_TEACHER_GEMMS
            key = (g.m, *sorted((g.k, g.n)), g.batch, is_int8)
            fams.setdefault(key, {"flops": 0, "names": set(),
                                  "op_class": g.op_class})
            fams[key]["flops"] += g.flops
            fams[key]["names"].add(g.name.replace("_dgrad", ""))

        print(f"--- lane: {lane} ---", flush=True)
        rows = []
        for (m, k, n, batch, is_int8), info in sorted(
                fams.items(), key=lambda kv: -kv[1]["flops"]):
            tfs = rate_of(m, k, n, batch, is_int8)
            share = info["flops"] / total
            ideal_ms = info["flops"] / (tfs * 1e12) * 1e3
            rows.append({
                "shape": f"{batch}x({m},{k})x({k},{n})" if batch > 1
                         else f"({m},{k})x({k},{n})",
                "op_class": info["op_class"],
                "dtype": "int8" if is_int8 else
                         ("bf16" if dtype == jnp.bfloat16 else "f32"),
                "names": sorted(info["names"]),
                "step_gflops": round(info["flops"] / 1e9, 1),
                "flop_share_pct": round(100 * share, 1),
                "measured_tflops": round(tfs, 1),
                "ideal_ms": round(ideal_ms, 3),
            })
            print(f"  {rows[-1]['shape']:36s} {rows[-1]['op_class']:12s} "
                  f"{rows[-1]['dtype']:4s} "
                  f"{rows[-1]['step_gflops']:9.1f} GF "
                  f"({rows[-1]['flop_share_pct']:4.1f}%)  "
                  f"{tfs:7.1f} TF/s  ideal {ideal_ms:7.3f} ms", flush=True)

        ideal_step_ms = sum(r["ideal_ms"] for r in rows)
        ceiling = total / (ideal_step_ms / 1e3) / 1e12
        print(f"lane {lane}: step GEMM FLOPs {total/1e9:.1f} GF, "
              f"ideal {ideal_step_ms:.2f} ms, "
              f"composite ceiling {ceiling:.1f} TF/s")
        lanes_out[lane] = {
            "ceiling_tflops": round(ceiling, 2),
            "ideal_step_ms": round(ideal_step_ms, 3),
            "step_gemm_gflops": round(total / 1e9, 2),
            "families": rows,
        }

    # sanity anchor: the round-3 dense-chain number for comparison
    sanity = measure_family(jax, jnp, 4096, 4096, 4096, 1, iters, dtype,
                            par=2)
    print(f"sanity 4096^3 ping-pong (2 chains): {sanity:.1f} TF/s")

    first = lanes_out[lanes[0]]
    result = {
        # top-level keys mirror the first lane for backward compatibility
        # with single-lane readers; bench.py prefers the "lanes" dict
        "ceiling_tflops": first["ceiling_tflops"],
        "ideal_step_ms": first["ideal_step_ms"],
        "step_gemm_gflops": first["step_gemm_gflops"],
        "convention": "true FLOPs (2/MAC), dgrad-only backward",
        "sanity_dense_4096_tflops": round(sanity, 1),
        "config": {"arch": os.environ.get("BENCH_ARCH", "ViT-B/16"),
                   "batch": args.batch, "classes": args.classes,
                   "text_len": text_len, "teacher": lanes[0],
                   "step": args.step,
                   **({"cocoop_chunk": args.cocoop_chunk}
                      if args.step == "cocoop" else {}),
                   "iters": iters, "backend": jax.default_backend()},
        "source": "tools/calibrate_ceiling.py (step-shaped GEMM ping-pong)",
        "families": first["families"],
        "lanes": lanes_out,
    }
    if args.dry and args.out == ap.get_default("out"):
        print("(--dry: not writing CEILING.json)")
    else:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")

    # markdown roofline table for PERF.md
    for lane, lo in lanes_out.items():
        print(f"\nlane `{lane}` (composite {lo['ceiling_tflops']} TF/s):")
        print("| shape | op class | dtype | step GF | share | TF/s "
              "| ideal ms |")
        print("|---|---|---|---|---|---|---|")
        for r in lo["families"]:
            print(f"| `{r['shape']}` | {r['op_class']} | {r['dtype']} "
                  f"| {r['step_gflops']} | {r['flop_share_pct']}% "
                  f"| {r['measured_tflops']} | {r['ideal_ms']} |")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attention microbench at CLIP shapes: XLA fused softmax-attention vs the
blockwise Pallas flash kernel vs the legacy whole-sequence Pallas kernel.

Times a jitted fwd+bwd (value_and_grad wrt q, k, v) with per-step host
fetches (the only timing the axon tunnel reports faithfully).  Prints one
JSON line per (mode, shape).

  ATTN_MODES=xla,blockwise,legacy ATTN_STEPS=30 python tools/bench_attention.py

Reference anchor: the reference runs cuDNN nn.MultiheadAttention
(PromptSRC/clip/model.py:171,196); this tool adjudicates which TPU lowering
fsvlm should default to (VERDICT r2 weak item 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("ATTN_STEPS", "30"))
MODES = os.environ.get("ATTN_MODES", "xla,blockwise,packed,legacy").split(",")
# (B, H, L, d): PromptSRC vision tower (bs48, 197 patches + 4 vpt), text
# tower (100 classes, 77 ctx), and a long-context point for the flash path
SHAPES = [
    tuple(int(x) for x in s.split("x"))
    for s in os.environ.get(
        "ATTN_SHAPES", "48x12x201x64,100x8x77x64,8x12x1024x64"
    ).split(",")
]


def main():
    import fsvlm_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS over sitecustomize)
    import jax
    from fsvlm_tpu.utils import device_probe

    if not device_probe():
        print(json.dumps({"note": "device unreachable: TPU tunnel wedged"}))
        return
    import jax.numpy as jnp

    from fsvlm_tpu.ops import flash_attention as fa

    on_cpu = jax.default_backend() == "cpu"
    for B, H, L, d in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        dt = jnp.float32 if on_cpu else jnp.bfloat16
        q, k, v = (jax.random.normal(kk, (B, H, L, d), dt) for kk in ks)
        mask = jnp.triu(jnp.full((L, L), -1e30, jnp.float32), 1)
        for mode in MODES:
            if mode == "xla":
                fn = lambda q, k, v: fa._reference_attention(
                    q, k, v, mask, d ** -0.5)
            elif mode == "blockwise":
                fn = lambda q, k, v: fa.blockwise_attention(
                    q, k, v, mask, fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K,
                    on_cpu)
            elif mode == "packed":
                if d != 64 or H % 2:
                    continue
                fn = lambda q, k, v: fa.packed_attention(
                    q, k, v, mask, fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K,
                    on_cpu)
            elif mode == "legacy":
                fn = lambda q, k, v: fa.fused_attention(q, k, v, mask, on_cpu)
            else:
                raise SystemExit(f"unknown mode {mode}")

            # the axon tunnel adds ~30 ms of RTT per host fetch — amortize
            # it by chaining INNER fwd+bwd iterations inside one dispatch
            # (data-dependent carry so XLA cannot elide any iteration)
            INNER = int(os.environ.get("ATTN_INNER", "20"))

            @jax.jit
            def step(q, k, v):
                def one(carry, _):
                    q_ = carry

                    def loss(q_, k_, v_):
                        return fn(q_, k_, v_).astype(jnp.float32).sum()

                    l, grads = jax.value_and_grad(
                        loss, argnums=(0, 1, 2))(q_, k, v)
                    return q_ + 1e-3 * grads[0].astype(q_.dtype), l

                qf, ls = jax.lax.scan(one, q, None, length=INNER)
                return ls[-1], qf

            try:
                for _ in range(3):
                    l, qf = step(q, k, v)
                float(l)
                t0 = time.time()
                for _ in range(STEPS):
                    l, qf = step(q, k, v)
                    assert float(l) == float(l)  # host fetch each step
                ms = (time.time() - t0) / (STEPS * INNER) * 1e3
                print(json.dumps({
                    "mode": mode, "shape": [B, H, L, d],
                    "fwd_bwd_ms": round(ms, 3),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "mode": mode, "shape": [B, H, L, d],
                    "error": str(e)[:160],
                }), flush=True)


if __name__ == "__main__":
    main()

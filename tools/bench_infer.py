#!/usr/bin/env python
"""Zero-shot CLIP inference (serving) throughput on one chip.

The training benches (bench.py, tools/bench_e2e.py) cover the train path;
this tool measures the SERVING path the reference exercises through
`trainer.test()` / ZeroshotCLIP (reference anchors: PromptSRC/trainers/
zsclip.py:28-54 per-batch `model_inference`, Dassl engine trainer.py test
loop): class text features are computed ONCE, then each request batch is
uint8 pixels -> device normalize -> image tower -> logits -> top-1.

Two numbers per batch size:
  * compute img/s  — device-resident uint8 batches, INNER batches chained
    in one dispatch (data-dependent carry); the on-chip serving ceiling.
    The per-batch work includes the fused normalize and the argmax D2H.
  * note: per-batch H2D streaming is NOT reported — this environment's
    axon relay moves ~24 MB/s, three orders of magnitude below a real TPU
    host NIC, so a streamed number would measure the tunnel, not the
    design (same caveat as PERF.md's host-pipeline section).

  BENCH_ARCH=ViT-B/16 INFER_BATCHES=64,256 python tools/bench_infer.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCH = os.environ.get("BENCH_ARCH", "ViT-B/16")
N_CLASSES = int(os.environ.get("BENCH_CLASSES", "1000"))
BATCHES = [int(b) for b in os.environ.get("INFER_BATCHES", "64,128,256").split(",")]
STEPS = int(os.environ.get("INFER_STEPS", "20"))
INNER = int(os.environ.get("INFER_INNER", "10"))
BF16 = os.environ.get("BENCH_BF16_TOWERS", "1") == "1"
INT8 = os.environ.get("BENCH_INT8", "0") == "1"  # W8A8 image tower (ops/quant.py)
# which GEMM families to quantize: "attn,mlp" (full) or "mlp" (wide GEMMs
# only — halves the dynamic act-quant overhead per layer)
INT8_FAMILIES = tuple(
    os.environ.get("BENCH_INT8_FAMILIES", "attn,mlp").split(","))
# BENCH_INT8_STATIC=1: calibrated static per-tensor activation scales —
# removes the per-row dynamic act-quant reductions (verdict r3 item 5)
INT8_STATIC = os.environ.get("BENCH_INT8_STATIC", "0") == "1"


def main():
    import fsvlm_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS over sitecustomize)
    import jax
    from fsvlm_tpu.utils import device_probe, enable_compile_cache

    if not device_probe():
        print(json.dumps({"note": "device unreachable: TPU tunnel wedged"}))
        return
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from fsvlm_tpu.models.clip import ARCHS, encode_image, encode_text_ids, l2_normalize
    from fsvlm_tpu.models.clip.convert import random_clip_params
    from fsvlm_tpu.models.clip.tokenizer import tokenize
    from fsvlm_tpu.ops.preprocess import normalize_only

    on_cpu = jax.default_backend() == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    clip_cfg = ARCHS[ARCH]
    params = jax.tree.map(jnp.asarray, random_clip_params(clip_cfg, seed=0))
    if BF16 and not on_cpu:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    # class text features: computed once per deployment, as in test()
    ids = tokenize([f"a photo of a class {i}." for i in range(N_CLASSES)])
    txf = l2_normalize(encode_text_ids(params, clip_cfg, ids, compute_dtype=dtype))
    scale = jnp.exp(params["logit_scale"]).astype(jnp.float32)

    if INT8:
        from fsvlm_tpu.ops.quant import (
            calibrate_visual_amax, quantize_clip_params)

        static_amax = None
        if INT8_STATIC:
            rng_c = np.random.RandomState(7)
            res_c = clip_cfg.image_resolution
            cal = [
                normalize_only(jnp.asarray(rng_c.randint(
                    0, 256, (32, res_c, res_c, 3), dtype=np.uint8)),
                    out_size=res_c)
                for _ in range(4)
            ]
            static_amax = {"visual": calibrate_visual_amax(
                params, clip_cfg, cal, compute_dtype=dtype)}
        params = quantize_clip_params(
            params, towers=("visual",), families=INT8_FAMILIES,
            static_amax=static_amax)

    res = clip_cfg.image_resolution

    def classify(images_u8):
        """uint8 (B, res, res, 3) -> top-1 class ids (the serving request)."""
        x = normalize_only(images_u8, out_size=res)
        imf = l2_normalize(
            encode_image(params, clip_cfg, x, compute_dtype=dtype)
        )
        logits = scale * (imf.astype(jnp.float32) @ txf.T.astype(jnp.float32))
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    for B in BATCHES:
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(
            rng.randint(0, 256, (INNER, B, res, res, 3), dtype=np.uint8)
        )

        @jax.jit
        def serve_many(batches, seed):
            # data-dependent carry: batch i is perturbed by the previous
            # prediction so XLA cannot batch/elide the chain
            def one(carry, xb):
                xb = xb.at[0, 0, 0, 0].set((carry[0] % 255).astype(jnp.uint8))
                pred = classify(xb)
                return pred, pred

            _, preds = jax.lax.scan(one, seed, batches)
            return preds

        try:
            seed0 = jnp.zeros((B,), jnp.int32)
            preds = serve_many(imgs, seed0)
            np.asarray(preds)  # warm + compile
            t0 = time.time()
            for _ in range(STEPS):
                preds = serve_many(imgs, seed0)
                np.asarray(preds[-1])  # host fetch each dispatch
            dt = time.time() - t0
            img_s = STEPS * INNER * B / dt
            print(
                json.dumps(
                    {
                        "metric": f"zero-shot {ARCH} serving throughput (one chip)"
                        + (f" [int8:{','.join(INT8_FAMILIES)}"
                           f"{':static' if INT8_STATIC else ''}]"
                           if INT8 else ""),
                        "batch": B,
                        "classes": N_CLASSES,
                        "value": round(img_s, 1),
                        "unit": "images/sec/chip",
                        "ms_per_batch": round(dt / (STEPS * INNER) * 1e3, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"batch": B, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()

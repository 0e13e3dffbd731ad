#!/usr/bin/env python
"""Export the CLIP serving function as a portable StableHLO artifact.

Deployment story the reference lacks (it serves live torch modules,
PromptSRC/trainers/zsclip.py): `jax.export` serializes the jitted
uint8-pixels -> top-1 serving function — towers, normalization, class text
features and logit math baked in — to one self-contained file that any JAX
runtime (same or newer) can load and run WITHOUT this framework, Python
model code, or checkpoint plumbing.  Class text features are folded in as
constants (they are deployment-time constants, computed once); image-tower
weights stay runtime inputs so one artifact serves any fine-tune.

Usage:
  python tools/export_serving.py --arch ViT-B/16 --classes 100 \
      --batch 96 --out /tmp/clip_serving.bin [--int8] [--bf16]

Round trip is tested in tests/test_export_serving.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_serving_fn(arch, n_classes, dtype_name="float32", int8=False,
                     classnames=None, params=None, seed=0,
                     int8_families=("attn", "mlp"), int8_static=False):
    """Returns (serve_fn, params) where serve_fn(params, uint8 images) ->
    (top1 ids, logits).  params are the (optionally quantized) CLIP params.
    """
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import (
        ARCHS, encode_image, encode_text_ids, l2_normalize)
    from fsvlm_tpu.models.clip.convert import random_clip_params
    from fsvlm_tpu.models.clip.tokenizer import tokenize
    from fsvlm_tpu.ops.preprocess import normalize_only

    cfg = ARCHS[arch]
    import jax

    if params is None:
        params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=seed))
    dtype = jnp.dtype(dtype_name)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    names = classnames or [f"class {i}" for i in range(n_classes)]
    ids = tokenize([f"a photo of a {c}." for c in names])
    txf = l2_normalize(encode_text_ids(params, cfg, ids, compute_dtype=dtype))
    scale = jnp.exp(params["logit_scale"]).astype(jnp.float32)

    if int8:
        from fsvlm_tpu.ops.quant import (
            calibrate_visual_amax, quantize_clip_params)

        static_amax = None
        if int8_static:
            # calibration batches: synthetic normalized pixels (the export
            # tool has no dataset; real deployments calibrate via
            # MODEL.QUANT_INT8_STATIC through the engine instead)
            import numpy as _np
            rng_c = _np.random.RandomState(7)
            r = cfg.image_resolution
            cal = [normalize_only(jnp.asarray(rng_c.randint(
                0, 256, (32, r, r, 3), dtype=_np.uint8)), out_size=r)
                for _ in range(4)]
            static_amax = {"visual": calibrate_visual_amax(
                params, cfg, cal, compute_dtype=dtype)}
        params = quantize_clip_params(
            params, towers=("visual",), families=int8_families,
            static_amax=static_amax)

    res = cfg.image_resolution

    def serve(params, images_u8):
        x = normalize_only(images_u8, out_size=res)
        imf = l2_normalize(encode_image(params, cfg, x, compute_dtype=dtype))
        logits = scale * (imf.astype(jnp.float32) @ txf.T.astype(jnp.float32))
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), logits

    return serve, params, res


def export_serving(arch, n_classes, batch, out_path, int8=False,
                   dtype_name="float32", classnames=None, params=None,
                   int8_families=("attn", "mlp"), int8_static=False):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    serve, params, res = build_serving_fn(
        arch, n_classes, dtype_name=dtype_name, int8=int8,
        classnames=classnames, params=params, int8_families=int8_families,
        int8_static=int8_static)

    param_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    img_shape = jax.ShapeDtypeStruct((batch, res, res, 3), jnp.uint8)

    exported = jexport.export(jax.jit(serve))(param_shapes, img_shape)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return params, len(blob)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ViT-B/16")
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--out", required=True)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8-families", default="attn,mlp",
                    help="GEMM families to quantize: attn,mlp | mlp")
    ap.add_argument("--int8-static", action="store_true",
                    help="calibrated static activation scales (no per-row "
                         "dynamic act-quant in the serving graph)")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import fsvlm_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS)

    _, nbytes = export_serving(
        args.arch, args.classes, args.batch, args.out, int8=args.int8,
        dtype_name="bfloat16" if args.bf16 else "float32",
        int8_families=tuple(args.int8_families.split(",")),
        int8_static=args.int8_static)
    print(f"wrote {args.out} ({nbytes / 1e6:.2f} MB, arch={args.arch}, "
          f"classes={args.classes}, batch={args.batch}, int8={args.int8})")


if __name__ == "__main__":
    main()

"""Post-training int8 quantization for the frozen CLIP towers (serving path).

TPU-native capability with no reference counterpart: the v5e MXU executes
int8×int8→int32 matmuls at 2× the bf16 rate (394 vs 197 TOPS peak) and the
int8 weights halve the tower's HBM weight traffic.  The reference serves
fp16/fp32 through torch (PromptSRC/trainers/zsclip.py:28-54); this module
gives the same `trainer.test()` serving semantics a faster execution mode.

Scheme: W8A8 symmetric —
  * weights: per-output-channel scales, computed once at load
    (``quantize_weight``); stacked tower layouts (n_layers, D_in, D_out)
    quantize per (layer, out-channel) so each `lax.scan` step consumes an
    exact per-layer scale slice.
  * activations: dynamic per-token (per-row) scales computed in-graph —
    no calibration set needed, robust to distribution shift.  OR static
    per-tensor scales calibrated once over a few batches
    (``calibrate_visual_amax`` + ``static_amax=`` below): the per-row
    |x| reduction and per-row rescale disappear from the serving graph —
    round-3 measured the dynamic act-quant VPU cost eating the entire
    int8 MXU gain (0.92x bf16 serving), which static scales remove.
  * the matmul runs int8×int8→int32 on the MXU
    (``lax.dot_general(..., preferred_element_type=int32)``), then the
    product of the two scales rescales back to the activation dtype.

What stays un-quantized (accuracy-critical, <15% of serving FLOPs):
attention score/prob einsums (bf16), LayerNorm/softmax/logits (fp32 — the
framework-wide precision floor, ops/layers.py), patch embedding and the
final projections.

FROZEN/SERVING ONLY: the int8 rounding is not differentiable (the int8
cast's gradient is zero/undefined).  Use on paths where no gradient flows
through the quantized weights — ZeroshotCLIP/`trainer.test()` serving
(MODEL.QUANT_INT8) and stop-gradient teachers.  Trainable prompt paths must
keep the fp towers.
"""

import jax
import jax.numpy as jnp

#: leaf names inside a stacked tower block pytree that carry GEMM weights
_TOWER_GEMMS = (("attn", "w_qkv"), ("attn", "w_out"),
                ("mlp", "w_fc"), ("mlp", "w_proj"))


def quantize_weight(w):
    """fp weight (..., D_in, D_out) -> {"q8": int8, "scale": f32 (..., D_out)}.

    Symmetric per-output-channel: scale = amax(|w|, contraction axis)/127.
    Works on both a single (D_in, D_out) matrix and a scan-stacked
    (n_layers, D_in, D_out) tower leaf.
    """
    w32 = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2)  # reduce the contraction axis
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale}


def is_quantized(w):
    return isinstance(w, dict) and "q8" in w


def int8_linear(x, wq, b=None):
    """y = x @ W + b with W int8 per-channel and x quantized per-token.

    x: (..., D_in) float (bf16/f32).  wq: ``quantize_weight`` output whose
    leading dims (if any) were already sliced away by the caller's scan.
    Activation quantization: per-row dynamic symmetric int8 by default; a
    calibrated STATIC per-tensor scale when the record carries ``"xs"``
    (scalar after the scan slice) — no in-graph reduction, just a scaled
    round+clip.
    """
    q, w_scale = wq["q8"], wq["scale"]
    xs = wq.get("xs")
    if xs is not None:
        x_scale = jnp.maximum(xs.astype(jnp.float32), 1e-12)
    else:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def quantize_blocks(blocks, families=("attn", "mlp"), static_amax=None):
    """Quantize the GEMM weights of a stacked tower block pytree.

    Input: the ``blocks`` pytree fed to ``transformer()`` (leaves stacked on
    a leading n_layers axis).  LayerNorm params and biases stay float.
    ``families`` selects which GEMM groups to quantize: ``("attn", "mlp")``
    is full W8A8; ``("mlp",)`` quantizes only the two wide MLP GEMMs (2/3
    of tower FLOPs at the best compute-to-quant-overhead ratio) and keeps
    QKV/out-proj in float — the dynamic activation quantization runs half
    as often per layer.

    ``static_amax``: optional (n_layers, 4) per-layer GEMM-input |x| maxima
    (``calibrate_visual_amax`` output; column order = _TOWER_GEMMS).  When
    given, each quant record carries a stacked (n_layers,) static activation
    scale ``"xs"`` = amax/127 that the layer scan slices to a scalar.
    """
    out = _deepcopy_dicts(blocks)
    for gi, (group, name) in enumerate(_TOWER_GEMMS):
        if group in families and not is_quantized(blocks[group][name]):
            rec = quantize_weight(blocks[group][name])
            if static_amax is not None:
                amax = jnp.asarray(static_amax)[:, gi].astype(jnp.float32)
                rec["xs"] = jnp.maximum(amax, 1e-12) / 127.0
            out[group][name] = rec
    return out


def _deepcopy_dicts(tree):
    if isinstance(tree, dict):
        return {k: _deepcopy_dicts(v) for k, v in tree.items()}
    return tree


def quantize_clip_params(params, towers=("visual",), families=("attn", "mlp"),
                         static_amax=None):
    """Return CLIP params with the given towers' transformer blocks in int8.

    ``towers`` ⊆ {"visual", "text"}.  Only ViT-style ``blocks`` trees are
    quantized (the ModifiedResNet tower is conv-dominated; its attention
    pool is a single layer and not worth the precision risk).
    ``families`` ⊆ {"attn", "mlp"} — see ``quantize_blocks``.
    ``static_amax``: optional {tower: (n_layers, 4)} calibrated activation
    maxima enabling static per-tensor activation scales.
    """
    out = _deepcopy_dicts(params)
    for t in towers:
        sub = out.get(t)
        if sub is not None and isinstance(sub, dict) and "blocks" in sub:
            amax = None if static_amax is None else static_amax.get(t)
            sub["blocks"] = quantize_blocks(
                sub["blocks"], families=families, static_amax=amax)
    return out


def calibrate_visual_amax(params, cfg, batches, compute_dtype=None):
    """Calibrate static activation scales for the ViT image tower.

    Runs the FLOAT tower over the given image batches (any iterable of
    (B, H, W, 3) CLIP-normalized arrays) collecting the per-layer maxima of
    the four GEMM inputs; returns the elementwise max over batches as an
    (n_layers, 4) array for ``quantize_clip_params(static_amax=...)``.

    One jitted pass per distinct batch shape; a handful of batches is
    enough — activations of a frozen tower are distribution-stable, which
    is exactly why a static scale works.
    """
    from ..models.clip import encode_image

    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if jax.default_backend() != "cpu"
                         else jnp.float32)

    # params passed as a jit ARGUMENT (a closure would constant-fold the
    # full tower into the HLO — the remote TPU compiler rejects that)
    @jax.jit
    def one(p, imgs):
        _, amax = encode_image(p, cfg, imgs, compute_dtype=compute_dtype,
                               collect_gemm_amax=True)
        return amax

    total = None
    for imgs in batches:
        amax = one(params, jnp.asarray(imgs))
        total = amax if total is None else jnp.maximum(total, amax)
    if total is None:
        raise ValueError("calibrate_visual_amax: no calibration batches")
    return total

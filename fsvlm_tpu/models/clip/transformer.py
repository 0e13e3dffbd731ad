"""Scan-based residual attention transformer with functional prompt splicing.

One implementation covers every prompt-design in the reference, which instead
subclasses blocks per method (ResidualAttentionBlock / _IVLP / _MaPLe,
PromptSRC/clip/model.py:167-331):

- CoOp / CoCoOp: no per-layer prompts (``deep_prompts=None``).
- IVLP / VPT / PromptSRC: per-layer learnable tokens replace the previous
  layer's prompt tokens at layers 1..depth-1 (model.py:229-256).
- MaPLe: identical splice mechanics, prompts supplied externally
  (projected from the text prompts, model.py:287-331).

Splicing semantics (parity with the reference):
- text: tokens [1 : 1+n_ctx) are replaced (SOT stays at 0).
- vision: the trailing n_ctx tokens are replaced.
Layer 0 never splices — its prompts were injected at the embedding level.

Blocks are stacked along a leading layer axis and driven by ``lax.scan``:
one trace, one compile, no per-layer Python unrolling.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from ...ops.layers import layer_norm, linear, quick_gelu


def _splice_text(x, prompt, n_ctx, flag):
    """Replace x[:, 1:1+n_ctx] with prompt (n_ctx, D) where ``flag``.

    The conditional select is sized (B, n_ctx, D) — NOT the full (B, L, D)
    tensor — and written back with a dynamic_update_slice, which XLA turns
    into an in-place carry update inside the layer scan (vs the previous
    full-tensor where+concat: two whole-activation copies per layer)."""
    p = jnp.broadcast_to(prompt.astype(x.dtype), (x.shape[0], n_ctx, x.shape[-1]))
    cur = jax.lax.dynamic_slice_in_dim(x, 1, n_ctx, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        x, jnp.where(flag, p, cur), 1, axis=1)


def _splice_vision(x, prompt, n_ctx, flag):
    """Replace the trailing n_ctx tokens with prompt (n_ctx, D) where
    ``flag`` (same slice-sized select as _splice_text)."""
    p = jnp.broadcast_to(prompt.astype(x.dtype), (x.shape[0], n_ctx, x.shape[-1]))
    start = x.shape[1] - n_ctx
    cur = jax.lax.dynamic_slice_in_dim(x, start, n_ctx, axis=1)
    return jax.lax.dynamic_update_slice_in_dim(
        x, jnp.where(flag, p, cur), start, axis=1)


def _block(params, x, n_heads, mask, lora_slice, collect_amax=False):
    h = layer_norm(x, params["ln_1"]["scale"], params["ln_1"]["bias"])
    attn = mha(
        h,
        params["attn"]["w_qkv"],
        params["attn"]["b_qkv"],
        params["attn"]["w_out"],
        params["attn"]["b_out"],
        n_heads,
        mask=mask,
        lora_delta=lora_slice,
        return_ctx_amax=collect_amax,
    )
    if collect_amax:
        attn, a_out = attn
        a_qkv = jnp.max(jnp.abs(h.astype(jnp.float32)))
    x = x + attn
    h = layer_norm(x, params["ln_2"]["scale"], params["ln_2"]["bias"])
    if collect_amax:
        a_fc = jnp.max(jnp.abs(h.astype(jnp.float32)))
    h = linear(h, params["mlp"]["w_fc"], params["mlp"]["b_fc"])
    h = quick_gelu(h)
    if collect_amax:
        a_proj = jnp.max(jnp.abs(h.astype(jnp.float32)))
    h = linear(h, params["mlp"]["w_proj"], params["mlp"]["b_proj"])
    if collect_amax:
        # order matches ops.quant._TOWER_GEMMS: qkv, out, fc, proj
        return x + h, jnp.stack([a_qkv, a_out, a_fc, a_proj])
    return x + h


def transformer(
    blocks,
    x,
    *,
    n_heads,
    mask=None,
    deep_prompts=None,
    splice_flags=None,
    splice_kind="text",
    lora=None,
    remat=False,
    collect_activations=False,
    collect_gemm_amax=False,
):
    """Run the stacked transformer.

    Args:
      blocks: pytree of per-layer params stacked on a leading ``n_layers``
        axis: {ln_1, attn{w_qkv,b_qkv,w_out,b_out}, ln_2, mlp{w_fc,b_fc,
        w_proj,b_proj}}.
      x: (B, L, D) activations (token-major batch layout; the reference's
        LND permutes are an artifact of nn.MultiheadAttention and not
        replicated).
      mask: optional (L, L) additive attention mask.
      deep_prompts: optional (n_layers, n_ctx, D): row i is spliced before
        layer i wherever ``splice_flags[i]``. Row 0 is ignored by convention
        (flag must be False).
      splice_flags: (n_layers,) bool.
      splice_kind: "text" | "vision".
      lora: optional dict of stacked low-rank factors
        {proj: (A (n_layers, D, r), B (n_layers, r, D))} plus
        {"scale": float, "mask": (n_layers,) float} gating which layers
        carry LoRA (reference: INDEX_POSITIONS_*, trainers/lora.py:25-58).
      remat: rematerialize each block (jax.checkpoint) to trade FLOPs for
        HBM when differentiating through the towers (LoRA mode).
    """
    n_ctx = 0 if deep_prompts is None else deep_prompts.shape[1]
    splice = _splice_text if splice_kind == "text" else _splice_vision

    dropout_rate = 0.0 if lora is None else float(lora.get("dropout_rate", 0.0))
    has_dropout = lora is not None and lora.get("dropout_keys") is not None and dropout_rate > 0

    def body(carry, layer_inputs):
        params, prompt, flag, lora_slice = layer_inputs
        h = carry
        if n_ctx > 0:
            h = splice(h, prompt, n_ctx, flag)
        if has_dropout:
            lora_slice = dict(lora_slice)
            # per-layer typed PRNG key + static rate -> lora dropout in mha
            lora_slice["dropout"] = (lora_slice.pop("dkey"), dropout_rate)
        if collect_gemm_amax:
            # int8 static-scale calibration: per-layer (4,) amax of the four
            # GEMM inputs (qkv, out-proj, fc, proj — ops.quant order)
            h, amax = _block(params, h, n_heads, mask, lora_slice,
                             collect_amax=True)
            return h, amax
        h = _block(params, h, n_heads, mask, lora_slice)
        # debug/interpretability hook: per-layer outputs (the reference's
        # Transformer.saved_features instrumentation, clip/model.py:340-366,
        # as a pure output instead of module state)
        return h, (h if collect_activations else None)

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    n_layers = blocks["ln_1"]["scale"].shape[0]
    if deep_prompts is None:
        deep_prompts = jnp.zeros((n_layers, 0, x.shape[-1]), dtype=x.dtype)
        splice_flags = jnp.zeros((n_layers,), dtype=bool)

    lora_xs = None
    if lora is not None:
        # per-layer gate: scale pre-multiplied by the 0/1 layer-position mask
        lora_xs = {
            name: (a, b, lora["scale"] * lora["mask"])
            for name, (a, b) in lora["proj"].items()
        }
        if has_dropout:
            lora_xs["dkey"] = lora["dropout_keys"]

    xs = (blocks, deep_prompts, splice_flags, lora_xs)
    # FSVLM_SCAN_UNROLL=k unrolls k layers per scan iteration: XLA can then
    # fuse/pipeline across layer boundaries (perf experiment; default 1 =
    # one compiled body, minimal program size for the remote compiler)
    import os as _os

    unroll = int(_os.environ.get("FSVLM_SCAN_UNROLL", "1"))
    if splice_kind == "text":
        # The text tower unrolls FULLY by default: its layers are tiny
        # ((C·L, 512) GEMMs ~60 us each), so per-iteration scan fusion
        # boundaries dominate — the round-4 roofline measured the rolled
        # text scan at 26% of its GEMM roofline, and full unroll bought
        # +2.9% on the whole PromptSRC step on chip (980.4 vs 953.0 img/s;
        # vision unrolling was measured a LOSS in round 3, so this stays
        # text-only).  FSVLM_TEXT_SCAN_UNROLL=k overrides (1 = rolled).
        t = _os.environ.get("FSVLM_TEXT_SCAN_UNROLL", "full")
        unroll = True if t == "full" else int(t)
    # FSVLM_SCAN_SPLIT_TRANSPOSE=1 lowers the scan's transpose (backward)
    # as two passes (jax _split_transpose), which can schedule the residual
    # re-reads better (perf experiment, numerically identical)
    split_t = _os.environ.get("FSVLM_SCAN_SPLIT_TRANSPOSE") == "1"
    x, layer_outputs = jax.lax.scan(
        body, x, xs, unroll=unroll, _split_transpose=split_t
    )
    if collect_activations or collect_gemm_amax:
        return x, layer_outputs
    return x

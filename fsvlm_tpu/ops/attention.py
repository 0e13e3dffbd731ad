"""Multi-head attention.

Replaces the reference's nn.MultiheadAttention (PromptSRC/clip/model.py:
171,196,264 and the pure-python SDPA at PromptSRC/utils/layers.py:388-413)
with a functional JAX implementation: one fused QKV projection feeding the
MXU, fp32 softmax, additive mask semantics identical to torch.

Sequence lengths in this framework are small and static (77 text tokens,
197+n_vpt vision tokens), so the XLA lowering — two batched matmuls around a
fused softmax — is already near the HBM roofline; a Pallas flash-attention
kernel for long sequences lives in fsvlm_tpu.ops.flash_attention and is
selected automatically above a sequence-length threshold.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp


def mha(x, w_qkv, b_qkv, w_out, b_out, n_heads, mask=None, lora_delta=None,
        return_ctx_amax=False):
    """Batched multi-head self-attention.

    Args:
      x: (B, L, D) activations.
      w_qkv: (D, 3D) fused in-projection (q|k|v along the output axis,
        matching torch's in_proj_weight layout transposed).
      b_qkv: (3D,)
      w_out: (D, D) out-projection.
      b_out: (D,)
      n_heads: number of heads; head_dim = D // n_heads.
      mask: optional (L, L) additive mask (``-inf`` above the diagonal for
        causal text attention, parity with clip/model.py:592-598).
      lora_delta: optional dict with per-projection low-rank updates
        {"q"|"k"|"v"|"o": (A (D,r), B (r,D))} applied as x @ A @ B * scale —
        used by the LoRA trainer without materializing merged weights.
    Returns:
      (B, L, D)
    """
    B, L, D = x.shape
    head_dim = D // n_heads

    from .layers import linear as _linear

    qkv = _linear(x, w_qkv, b_qkv)  # (B, L, 3D); int8 path when quantized
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def lora_input(name):
        """LoRA-branch input, with the reference's per-projection dropout
        (utils/layers.py lora_dropout before lora_A) when a key is given."""
        if lora_delta is None or "dropout" not in lora_delta:
            return x
        key, rate = lora_delta["dropout"]
        if rate <= 0.0:
            return x
        pkey = jax.random.fold_in(key, {"q": 0, "k": 1, "v": 2, "o": 3}[name])
        keep = jax.random.bernoulli(pkey, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)

    if lora_delta is not None:
        for name in ("q", "k", "v"):
            if name in lora_delta:
                a, b_, scale = lora_delta[name]
                xin = lora_input(name)
                # keep the carry dtype: the (traced f32) scale must not
                # promote bf16 activations
                delta = ((xin @ a.astype(x.dtype)) @ b_.astype(x.dtype) * scale).astype(x.dtype)
                if name == "q":
                    q = q + delta
                elif name == "k":
                    k = k + delta
                else:
                    v = v + delta

    # fused Pallas kernel on TPU, XLA einsum path elsewhere; fp32
    # logits+softmax either way for parity with torch's fp32 path
    from .flash_attention import attention_dispatch

    if os.environ.get("FSVLM_ATTN_BLHD") == "1":
        # layout experiment: keep heads minor, no transposes around the
        # attention contractions (same math, different XLA layouts)
        qh = q.reshape(B, L, n_heads, head_dim)
        kh = k.reshape(B, L, n_heads, head_dim)
        vh = v.reshape(B, L, n_heads, head_dim)
        ctx = attention_dispatch(qh, kh, vh, mask, layout="blhd").reshape(B, L, D)
    else:
        def split_heads(t):
            return t.reshape(B, L, n_heads, head_dim).transpose(0, 2, 1, 3)

        out = attention_dispatch(split_heads(q), split_heads(k), split_heads(v), mask)
        ctx = out.transpose(0, 2, 1, 3).reshape(B, L, D)

    out = _linear(ctx, w_out, b_out)
    if lora_delta is not None and "o" in lora_delta:
        # o-LoRA takes the attention context (pre-out-proj) as input, matching
        # the reference's separately wrapped proj Linear
        # (PromptSRC/utils/layers.py:416-608).
        a, b_, scale_o = lora_delta["o"]
        ctx_in = ctx
        if "dropout" in lora_delta:
            key, rate = lora_delta["dropout"]
            if rate > 0.0:
                pkey = jax.random.fold_in(key, 3)
                keep = jax.random.bernoulli(pkey, 1.0 - rate, ctx.shape)
                ctx_in = jnp.where(keep, ctx / (1.0 - rate), 0.0).astype(ctx.dtype)
        out = out + ((ctx_in @ a.astype(ctx.dtype)) @ b_.astype(ctx.dtype) * scale_o).astype(out.dtype)
    if return_ctx_amax:
        # int8 calibration hook: amax of the out-projection's GEMM input
        return out, jnp.max(jnp.abs(ctx.astype(jnp.float32)))
    return out


def causal_mask(length, dtype=jnp.float32):
    """Additive causal mask: -inf strictly above the diagonal
    (parity: CLIP.build_attention_mask, clip/model.py:592-598)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=dtype)
    return jnp.triu(mask, k=1)

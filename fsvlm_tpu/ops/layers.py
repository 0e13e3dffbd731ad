"""Elementwise / normalization primitives with CLIP's precision semantics.

CLIP's LayerNorm computes in fp32 regardless of activation dtype
(reference: PromptSRC/clip/model.py:153-159); QuickGELU is x*sigmoid(1.702x)
(model.py:162-164).  On TPU the surrounding matmuls run in bf16 while these
stay fp32-accurate — XLA fuses the casts into the adjacent ops.
"""

import jax.numpy as jnp


def layer_norm(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis with fp32 statistics.

    Returns in the input dtype (parity: fp16-safe LayerNorm,
    clip/model.py:153-159).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x):
    """x * sigmoid(1.702 x) — OpenAI CLIP's GELU approximation."""
    return x * jnp.reciprocal(1.0 + jnp.exp(-1.702 * x))


def linear(x, w, b=None):
    """y = x @ w + b with weights stored (in_features, out_features)."""
    y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y

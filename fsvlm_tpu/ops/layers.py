"""Elementwise / normalization primitives with CLIP's precision semantics.

CLIP's LayerNorm computes in fp32 regardless of activation dtype
(reference: PromptSRC/clip/model.py:153-159); QuickGELU is x*sigmoid(1.702x)
(model.py:162-164).  On TPU the surrounding matmuls run in bf16 while these
stay fp32-accurate — XLA fuses the casts into the adjacent ops.
"""

import jax
import jax.numpy as jnp


def _layer_norm_fwd_math(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    y = (x32 - mean) * rstd
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), mean, rstd


@jax.custom_vjp
def layer_norm(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis with fp32 statistics.

    Returns in the input dtype (parity: fp16-safe LayerNorm,
    clip/model.py:153-159).

    Memory-lean custom VJP: plain autodiff saves the fp32 upcast of the
    activations as a backward residual — profiled as an
    f32[layers, B, L, D] stack dominating the scan's HBM traffic in bf16
    mode.  Here the backward keeps only the original-dtype x plus the
    (B, L, 1) fp32 statistics and recomputes x̂.
    """
    y, _, _ = _layer_norm_fwd_math(x, scale, bias, eps)
    return y


def _layer_norm_fwd(x, scale, bias, eps):
    y, mean, rstd = _layer_norm_fwd_math(x, scale, bias, eps)
    return y, (x, scale, mean, rstd)


def _layer_norm_bwd(res, g):
    x, scale, mean, rstd = res
    x32 = x.astype(jnp.float32)
    xhat = (x32 - mean) * rstd
    g32 = g.astype(jnp.float32)
    dxhat = g32 * scale.astype(jnp.float32)
    # reduce over all leading dims for the (D,) parameter grads
    red_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(g32 * xhat, axis=red_axes).astype(scale.dtype)
    dbias = jnp.sum(g32, axis=red_axes).astype(scale.dtype)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias, None


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


@jax.custom_vjp
def quick_gelu(x):
    """x * sigmoid(1.702 x) — OpenAI CLIP's GELU approximation.

    Custom VJP saves only x (plain autodiff was profiled saving several
    [layers, B, L, 4D] intermediates in the scan stack); the sigmoid is
    recomputed in the backward.
    """
    return x * jnp.reciprocal(1.0 + jnp.exp(-1.702 * x))


def _quick_gelu_fwd(x):
    return quick_gelu(x), x


def _quick_gelu_bwd(x, g):
    s = jnp.reciprocal(1.0 + jnp.exp(-1.702 * x))
    return (g * (s + 1.702 * x * s * (1.0 - s)),)


quick_gelu.defvjp(_quick_gelu_fwd, _quick_gelu_bwd)


def linear(x, w, b=None):
    """y = x @ w + b with weights stored (in_features, out_features).

    ``w`` may be an int8 quantization record ({"q8", "scale"}, produced by
    ops.quant.quantize_weight) — the serving path stores the frozen tower
    GEMMs that way and dispatches to the W8A8 MXU kernel here.

    FSVLM_LINEAR_2D=1 flattens (B, L, D) @ (D, F) into one (B·L, D) GEMM
    before the dot (layout experiment: the TPU backend was observed
    lowering the rank-3 dot through the batch-in-sublanes convolution
    emitter; an explicit collapse forces the plain large-M GEMM path)."""
    import os

    if isinstance(w, dict):
        from .quant import int8_linear

        return int8_linear(x, w, b)
    if os.environ.get("FSVLM_LINEAR_2D") == "1" and x.ndim > 2:
        shape = x.shape
        y = (x.reshape(-1, shape[-1]) @ w.astype(x.dtype)).reshape(
            *shape[:-1], w.shape[-1])
    else:
        y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y

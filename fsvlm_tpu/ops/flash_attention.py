"""Fused multi-head attention Pallas kernel.

The reference leans on cuDNN's nn.MultiheadAttention (clip/model.py:171,196)
— the TPU-native replacement keeps the whole attention computation for one
(batch, head) pair resident in VMEM: scores, masked fp32 softmax and the
value contraction never round-trip the (L, L) matrix through HBM.

CLIP sequence lengths are short and static (77 text / 197+n_vpt vision), so
one program per (batch*head) with the full L×L tile is the right shape: at
L≤256, d=64 the working set is ≤0.5 MB — far under the ~16 MB VMEM budget —
and both matmuls are MXU-shaped (multiples of 128 after padding).

Differentiation: both directions are Pallas kernels.  The backward kernel
recomputes the (L, L) probabilities in VMEM (flash-attention style — no
residual softmax storage) and emits dq/dk/dv via the softmax-Jacobian
contraction; at CLIP's sequence lengths everything stays in one VMEM tile.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]  # (Lp, dp)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + mask_ref[...]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _reference_attention(q, k, v, mask, scale):
    """mask may be (L, L) shared-additive or any shape broadcastable to
    (B, H, L, L) — e.g. (B, 1, 1, L) per-example key bias."""
    # In bf16 compute mode the (B, H, L, L) score/prob intermediates stay
    # bf16 (halves their HBM traffic; measured +22% step throughput on the
    # PromptSRC ViT-B/16 step).  Scores for CLIP layers are O(±30), well
    # inside bf16 range, and softmax still subtracts the row max.  fp32
    # compute mode (parity tests, PREC fp32) is untouched; FSVLM_ATTN_BF16=0
    # opts out.
    low_prec = (
        q.dtype == jnp.bfloat16 and _os.environ.get("FSVLM_ATTN_BF16") != "0"
    )
    acc_t = q.dtype if low_prec else jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_t) * scale
    if mask is not None:
        s = s + mask.astype(acc_t)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype) if not low_prec \
        else jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, mask, interpret=False):
    """q, k, v: (B, H, L, d); mask: optional (L, L) additive fp32."""
    return _fused_attention_fwd_impl(q, k, v, mask, interpret)


def _fused_attention_fwd_impl(q, k, v, mask, interpret):
    B, H, L, d = q.shape
    scale = d ** -0.5
    Lp = max(_round_up(L, 128), 128)
    dp = max(_round_up(d, 128), 128)

    # additive mask covering causal/user mask + key padding
    full_mask = np.zeros((Lp, Lp), np.float32)
    if L < Lp:
        full_mask[:, L:] = -1e30  # padded keys never attended
    full_mask = jnp.asarray(full_mask)
    if mask is not None:
        full_mask = full_mask.at[:L, :L].add(mask.astype(jnp.float32))

    def pad(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, dp - d))).reshape(
            B * H, Lp, dp
        )

    qp, kp, vp = pad(q), pad(k), pad(v)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, full_mask)

    return out.reshape(B, H, Lp, dp)[:, :, :L, :d]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    # recompute the probabilities (cheaper than storing (L, L) residuals)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + mask_ref[...]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 (Lp, Lp)

    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    # dv = p^T g
    dv_ref[0] = jax.lax.dot_general(
        p, g32, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dp = g v^T ; softmax jacobian: ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(
        g32, v32, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dq = ds k * scale ; dk = ds^T q * scale
    dq_ref[0] = (
        jnp.dot(ds, k.astype(jnp.float32), preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(
            ds, q.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)


def _fwd(q, k, v, mask, interpret):
    return _fused_attention_fwd_impl(q, k, v, mask, interpret), (q, k, v, mask)


def _bwd(interpret, residuals, g):
    q, k, v, mask = residuals
    B, H, L, d = q.shape
    scale = d ** -0.5
    Lp = max(_round_up(L, 128), 128)
    dp_ = max(_round_up(d, 128), 128)

    full_mask = np.zeros((Lp, Lp), np.float32)
    if L < Lp:
        full_mask[:, L:] = -1e30
    full_mask = jnp.asarray(full_mask)
    if mask is not None:
        full_mask = full_mask.at[:L, :L].add(mask.astype(jnp.float32))

    def pad(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, dp_ - d))).reshape(
            B * H, Lp, dp_
        )

    spec = pl.BlockSpec((1, Lp, dp_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((Lp, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Lp, dp_), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lp, dp_), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lp, dp_), v.dtype),
        ),
        interpret=interpret,
    )(pad(q), pad(k), pad(v), pad(g), full_mask)

    def unpad(t):
        return t.reshape(B, H, Lp, dp_)[:, :, :L, :d]

    return unpad(dq), unpad(dk), unpad(dv), None


fused_attention.defvjp(_fwd, _bwd)


import os as _os

# Measured on v5e through this environment (round-3 microbench,
# tools/bench_attention.py, jitted fwd+bwd in bf16, tunnel RTT amortized
# over a 20-iteration inner scan):
#   (48,12,201,64) vision:  XLA 2.19 ms | blockwise 3.29 | whole-seq 3.91
#   (100,8,77,64)  text:    XLA 1.92 ms | blockwise 3.03 | whole-seq 3.00
#   (8,12,1024,64) long:    XLA 3.95 ms | blockwise 4.19 | whole-seq 2.96
# XLA's fused attention wins at every CLIP shape (the d=64 -> 128 lane
# padding doubles both Pallas matmuls; at these lengths the L^2 working
# set fits VMEM so XLA's fusion already avoids HBM round-trips).  "Don't
# hand-schedule what the compiler already does": XLA is the default
# everywhere; FSVLM_FORCE_PALLAS=1 dispatches the BLOCKWISE kernel below
# (the long-context scaffold, O(L) memory), and FSVLM_FORCE_PALLAS=legacy
# keeps the whole-sequence scaffold.


# --------------------------------------------------------------------------
# Blockwise (flash) attention: tiles the L^2 working set over a
# (batch*head, q-block, kv-block) grid with running max/sum accumulation.
# The kv dimension is the innermost (sequential) grid axis, so Mosaic's
# BlockSpec machinery double-buffers the HBM->VMEM streams of K/V blocks
# across iterations — the pipelining the whole-sequence kernel lacked.
# O(L) memory: only (BQ, BK) score tiles ever materialize.


def _blockwise_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                          m_scr, l_scr, acc_scr, *, scale, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, dp)
    k = k_ref[0]  # (BK, dp)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + mask_ref[...]  # (BQ, BK) fp32

    m_prev = m_scr[:, :1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)
    p = jnp.exp(s - m_new)  # (BQ, BK)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        # logsumexp residual for the backward recomputation
        lse_ref[0] = jnp.broadcast_to(
            m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30)), lse_ref.shape[1:]
        )


def _blockwise_fwd_impl(q, k, v, mask, block_q, block_k, interpret):
    B, H, L, d = q.shape
    scale = d ** -0.5
    BQ = min(block_q, max(_round_up(L, 128), 128))
    BK = min(block_k, max(_round_up(L, 128), 128))
    Lq = _round_up(max(L, BQ), BQ)
    Lk = _round_up(max(L, BK), BK)
    dp = max(_round_up(d, 128), 128)
    n_q, n_kv = Lq // BQ, Lk // BK

    full_mask = np.zeros((Lq, Lk), np.float32)
    if L < Lk:
        full_mask[:, L:] = -1e30  # padded keys never attended
    full_mask = jnp.asarray(full_mask)
    if mask is not None:
        full_mask = full_mask.at[:L, :L].add(mask.astype(jnp.float32))

    def pad(t, Lp):
        return jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, dp - d))).reshape(
            B * H, Lp, dp
        )

    out, lse = pl.pallas_call(
        functools.partial(_blockwise_fwd_kernel, scale=scale, n_kv=n_kv),
        grid=(B * H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((BQ, BK), lambda b, qi, ki: (qi, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, BQ, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BQ, 128), lambda b, qi, ki: (b, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Lq, dp), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, dp), jnp.float32),
        ],
        interpret=interpret,
    )(pad(q, Lq), pad(k, Lk), pad(v, Lk), full_mask)

    return out.reshape(B, H, Lq, dp)[:, :, :L, :d], lse


def _blockwise_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                          mask_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                          *, scale, n_q):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]  # (BQ, 1)
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + mask_ref[...]
    p = jnp.exp(s - lse)  # (BQ, BK)

    # dv += p^T g
    dv_scr[...] += jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # ds = p * (dp - delta); dp = g v^T
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    # dk += ds^T q * scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _blockwise_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                         mask_ref, dq_ref, dq_scr, *, scale, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + mask_ref[...]
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq_scr[...] += jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ki == n_kv - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def blockwise_attention(q, k, v, mask, block_q=DEFAULT_BLOCK_Q,
                        block_k=DEFAULT_BLOCK_K, interpret=False):
    """Flash attention over a (B*H, q-block, kv-block) grid.

    q, k, v: (B, H, L, d); mask: optional (L, L) additive fp32.  O(L)
    memory in both directions: the backward recomputes each (BQ, BK) score
    tile from the forward's logsumexp residual (no (L, L) probability
    storage).  This is the long-context path; at CLIP lengths (77/201) one
    block covers the sequence and the grid degenerates to the whole-
    sequence kernel with pipelined (b, h) streaming."""
    out, _ = _blockwise_fwd_impl(q, k, v, mask, block_q, block_k, interpret)
    return out


def _blockwise_vjp_fwd(q, k, v, mask, block_q, block_k, interpret):
    out, lse = _blockwise_fwd_impl(q, k, v, mask, block_q, block_k, interpret)
    return out, (q, k, v, mask, out, lse)


def _blockwise_vjp_bwd(block_q, block_k, interpret, residuals, g):
    q, k, v, mask, out, lse = residuals
    B, H, L, d = q.shape
    scale = d ** -0.5
    BQ = min(block_q, max(_round_up(L, 128), 128))
    BK = min(block_k, max(_round_up(L, 128), 128))
    Lq = _round_up(max(L, BQ), BQ)
    Lk = _round_up(max(L, BK), BK)
    dp = max(_round_up(d, 128), 128)
    n_q, n_kv = Lq // BQ, Lk // BK

    full_mask = np.zeros((Lq, Lk), np.float32)
    if L < Lk:
        full_mask[:, L:] = -1e30
    full_mask = jnp.asarray(full_mask)
    if mask is not None:
        full_mask = full_mask.at[:L, :L].add(mask.astype(jnp.float32))

    def pad(t, Lp):
        return jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, dp - d))).reshape(
            B * H, Lp, dp
        )

    # delta_i = rowsum(g_i * o_i) — the standard flash-attention identity
    # for rowsum(dp * p); computed with XLA, broadcast to 128 lanes
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Lq - L))).reshape(B * H, Lq)
    delta = jnp.broadcast_to(delta[..., None], (B * H, Lq, 128))

    qp, gp = pad(q, Lq), pad(g, Lq)
    kp, vp = pad(k, Lk), pad(v, Lk)

    dk, dv = pl.pallas_call(
        functools.partial(_blockwise_dkv_kernel, scale=scale, n_q=n_q),
        grid=(B * H, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, BQ, dp), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, BQ, dp), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, BQ, 128), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, BQ, 128), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((BQ, BK), lambda b, ki, qi: (qi, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, BK, dp), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, ki, qi: (b, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Lk, dp), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lk, dp), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, dp), jnp.float32),
            pltpu.VMEM((BK, dp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta, full_mask)

    dq = pl.pallas_call(
        functools.partial(_blockwise_dq_kernel, scale=scale, n_kv=n_kv),
        grid=(B * H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, BK, dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, BQ, dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BQ, 128), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BQ, 128), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((BQ, BK), lambda b, qi, ki: (qi, ki)),
        ],
        out_specs=pl.BlockSpec((1, BQ, dp), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, dp), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta, full_mask)

    def unpad(t, Lp):
        return t.reshape(B, H, Lp, dp)[:, :, :L, :d]

    return unpad(dq, Lq), unpad(dk, Lk), unpad(dv, Lk), None


blockwise_attention.defvjp(_blockwise_vjp_fwd, _blockwise_vjp_bwd)


# --------------------------------------------------------------------------
# Head-packed blockwise attention (d=64): two heads share one 128-lane tile.
#
# The padded kernels above waste half of every MXU pass at CLIP's d=64 —
# q/k/v are padded 64 -> 128 lanes, so the score contraction runs K=128 with
# half zeros and every HBM stream carries 50% padding.  Here a PAIR of heads
# is packed into the 128 lanes ([h0 d0..63 | h1 d0..63]):
#   * HBM traffic halves (no zero lanes anywhere: q/k/v/o/dq/dk/dv all dense)
#   * the grid shrinks to B*H/2 programs
#   * the score matmuls contract over a 64-lane slice (K=64) — the MXU
#     streams half the rows of the padded version
#   * the pv / dk / dv / dq matmuls keep K=BK/BQ and emit full 128-lane
#     outputs in which BOTH halves are real heads (vs. one head + 64 zero
#     lanes before)
# Per-head softmax state (running max / sum / lse) lives in the lane half it
# belongs to, selected with a lane-index mask.

_LANE = 128
_HALF = 64


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _hp_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                   m_scr, l_scr, acc_scr, *, scale, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, 128): [h0 | h1]
    k = k_ref[0]
    v = v_ref[0]
    lane = _lane_iota(acc_scr.shape)
    # the value-side lane mask must be KV-block-shaped: BQ != BK whenever
    # L exceeds both default blocks (e.g. L=1024 -> BQ 256, BK 512)
    lane_v = _lane_iota(v.shape)

    alphas, pvs, m_news, l_news = [], [], [], []
    for h in range(2):
        sl = slice(h * _HALF, (h + 1) * _HALF)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask_ref[...]  # (BQ, BK) fp32
        m_prev = m_scr[:, h * _HALF:h * _HALF + 1]  # (BQ, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_news.append(l_scr[:, h * _HALF:h * _HALF + 1] * alpha
                      + jnp.sum(p, axis=-1, keepdims=True))
        hm = (lane_v >= _HALF) if h else (lane_v < _HALF)
        pvs.append(jax.lax.dot_general(
            p.astype(v.dtype), jnp.where(hm, v, 0),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # (BQ, 128), only head h's half nonzero
        alphas.append(alpha)
        m_news.append(m_new)

    lo = lane < _HALF
    alpha_lanes = jnp.where(lo, alphas[0], alphas[1])
    acc_scr[...] = acc_scr[...] * alpha_lanes + pvs[0] + pvs[1]
    m_scr[...] = jnp.where(lo, m_news[0], m_news[1])
    l_scr[...] = jnp.where(lo, l_news[0], l_news[1])

    @pl.when(ki == n_kv - 1)
    def _finalize():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(l)


def _hp_bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                       mask_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                       *, scale, n_q):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lane_q = _lane_iota(q.shape)

    for h in range(2):
        sl = slice(h * _HALF, (h + 1) * _HALF)
        hm_q = (lane_q >= _HALF) if h else (lane_q < _HALF)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask_ref[...]
        p = jnp.exp(s - lse_ref[0][:, h * _HALF:h * _HALF + 1])
        # dv half: p^T (g in head h's lanes)
        dv_scr[...] += jax.lax.dot_general(
            p, jnp.where(hm_q, g, 0.0),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g[:, sl], v[:, sl].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, h * _HALF:h * _HALF + 1])
        dk_scr[...] += jax.lax.dot_general(
            ds, jnp.where(hm_q, q.astype(jnp.float32), 0.0),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _hp_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                      mask_ref, dq_ref, dq_scr, *, scale, n_kv):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lane_k = _lane_iota(k.shape)

    for h in range(2):
        sl = slice(h * _HALF, (h + 1) * _HALF)
        hm_k = (lane_k >= _HALF) if h else (lane_k < _HALF)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask_ref[...]
        p = jnp.exp(s - lse_ref[0][:, h * _HALF:h * _HALF + 1])
        dp = jax.lax.dot_general(
            g[:, sl], v[:, sl].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, h * _HALF:h * _HALF + 1])
        dq_scr[...] += jax.lax.dot_general(
            ds, jnp.where(hm_k, k.astype(jnp.float32), 0.0),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(ki == n_kv - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _pack_heads(t, Lp):
    """(B, H, L, 64) -> (B*H/2, Lp, 128): head pairs share the lane dim."""
    B, H, L, d = t.shape
    t = jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
    t = t.reshape(B, H // 2, 2, Lp, d).transpose(0, 1, 3, 2, 4)
    return t.reshape(B * (H // 2), Lp, 2 * d)


def _unpack_heads(t, B, H, L, d):
    """inverse of _pack_heads (drops L padding)."""
    Lp = t.shape[1]
    t = t.reshape(B, H // 2, Lp, 2, d).transpose(0, 1, 3, 2, 4)
    return t.reshape(B, H, Lp, d)[:, :, :L]


def _hp_block_mask(L, Lq, Lk, mask):
    full_mask = np.zeros((Lq, Lk), np.float32)
    if L < Lk:
        full_mask[:, L:] = -1e30
    full_mask = jnp.asarray(full_mask)
    if mask is not None:
        full_mask = full_mask.at[:L, :L].add(mask.astype(jnp.float32))
    return full_mask


def _hp_fwd_impl(q, k, v, mask, block_q, block_k, interpret):
    B, H, L, d = q.shape
    assert d == _HALF and H % 2 == 0, "head packing needs d=64, even H"
    scale = d ** -0.5
    BQ = min(block_q, max(_round_up(L, 128), 128))
    BK = min(block_k, max(_round_up(L, 128), 128))
    Lq = _round_up(max(L, BQ), BQ)
    Lk = _round_up(max(L, BK), BK)
    n_q, n_kv = Lq // BQ, Lk // BK
    full_mask = _hp_block_mask(L, Lq, Lk, mask)
    G = B * (H // 2)

    out, lse = pl.pallas_call(
        functools.partial(_hp_fwd_kernel, scale=scale, n_kv=n_kv),
        grid=(G, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((BQ, BK), lambda b, qi, ki: (qi, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lq, _LANE), q.dtype),
            jax.ShapeDtypeStruct((G, Lq, _LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BQ, _LANE), jnp.float32),
            pltpu.VMEM((BQ, _LANE), jnp.float32),
            pltpu.VMEM((BQ, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(_pack_heads(q, Lq), _pack_heads(k, Lk), _pack_heads(v, Lk), full_mask)

    return _unpack_heads(out, B, H, L, d), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def packed_attention(q, k, v, mask, block_q=DEFAULT_BLOCK_Q,
                     block_k=DEFAULT_BLOCK_K, interpret=False):
    """Head-packed flash attention for d=64 (CLIP's head dim): two heads per
    128-lane tile, O(L) memory, fwd+bwd Pallas.  mask: optional (L, L)
    additive fp32 shared across heads."""
    out, _ = _hp_fwd_impl(q, k, v, mask, block_q, block_k, interpret)
    return out


def _hp_vjp_fwd(q, k, v, mask, block_q, block_k, interpret):
    out, lse = _hp_fwd_impl(q, k, v, mask, block_q, block_k, interpret)
    return out, (q, k, v, mask, out, lse)


def _hp_vjp_bwd(block_q, block_k, interpret, residuals, g):
    q, k, v, mask, out, lse = residuals
    B, H, L, d = q.shape
    scale = d ** -0.5
    BQ = min(block_q, max(_round_up(L, 128), 128))
    BK = min(block_k, max(_round_up(L, 128), 128))
    Lq = _round_up(max(L, BQ), BQ)
    Lk = _round_up(max(L, BK), BK)
    n_q, n_kv = Lq // BQ, Lk // BK
    full_mask = _hp_block_mask(L, Lq, Lk, mask)
    G = B * (H // 2)

    # per-head delta = rowsum(g_h * o_h), stored in that head's lane half
    d_heads = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    d_heads = jnp.pad(d_heads, ((0, 0), (0, 0), (0, Lq - L)))  # (B, H, Lq)
    d_heads = d_heads.reshape(B, H // 2, 2, Lq).transpose(0, 1, 3, 2)
    delta = jnp.repeat(
        d_heads.reshape(G, Lq, 2), _HALF, axis=-1
    )  # (G, Lq, 128): h0 value in lanes 0-63, h1 in 64-127

    qp, gp = _pack_heads(q, Lq), _pack_heads(g, Lq)
    kp, vp = _pack_heads(k, Lk), _pack_heads(v, Lk)

    dk, dv = pl.pallas_call(
        functools.partial(_hp_bwd_dkv_kernel, scale=scale, n_q=n_q),
        grid=(G, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, BQ, _LANE), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((BQ, BK), lambda b, ki, qi: (qi, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, BK, _LANE), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, ki, qi: (b, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lk, _LANE), k.dtype),
            jax.ShapeDtypeStruct((G, Lk, _LANE), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, _LANE), jnp.float32),
            pltpu.VMEM((BK, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta, full_mask)

    dq = pl.pallas_call(
        functools.partial(_hp_bwd_dq_kernel, scale=scale, n_kv=n_kv),
        grid=(G, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, BK, _LANE), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((BQ, BK), lambda b, qi, ki: (qi, ki)),
        ],
        out_specs=pl.BlockSpec((1, BQ, _LANE), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((G, Lq, _LANE), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, _LANE), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta, full_mask)

    return (
        _unpack_heads(dq, B, H, L, d),
        _unpack_heads(dk, B, H, L, d),
        _unpack_heads(dv, B, H, L, d),
        None,
    )


packed_attention.defvjp(_hp_vjp_fwd, _hp_vjp_bwd)


def _reference_attention_blhd(q, k, v, mask, scale):
    """Same math as _reference_attention but head-minor (B, L, H, d) input/
    output — no explicit head transposes; the contraction layouts are given
    to dot_general directly (layout experiment, FSVLM_ATTN_BLHD=1)."""
    low_prec = (
        q.dtype == jnp.bfloat16 and _os.environ.get("FSVLM_ATTN_BF16") != "0"
    )
    acc_t = q.dtype if low_prec else jnp.float32
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=acc_t) * scale
    if mask is not None:
        s = s + mask.astype(acc_t)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype) if not low_prec \
        else jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attention_dispatch(q, k, v, mask=None, layout="bhld"):
    """XLA fused attention by default; FSVLM_FORCE_PALLAS=1 forces the
    blockwise (flash) Pallas kernel, =packed the head-packed d=64 variant,
    =legacy the whole-sequence scaffold (interpret mode off-TPU, for
    testing).  layout="blhd" takes/returns head-minor tensors without
    transposition."""
    if layout == "blhd":
        return _reference_attention_blhd(q, k, v, mask, q.shape[-1] ** -0.5)
    force = _os.environ.get("FSVLM_FORCE_PALLAS")
    if force == "packed":
        # head-packed blockwise: needs d=64, even H, shared (L, L) mask
        if (q.shape[-1] == 64 and q.shape[1] % 2 == 0
                and (mask is None or mask.ndim == 2)):
            return packed_attention(
                q, k, v, mask, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                jax.default_backend() == "cpu")
        force = "1"  # fall through to the unpacked blockwise kernel
    if force == "1":
        # blockwise wants a shared (L, L) additive mask; fall back to the
        # whole-sequence kernel for broadcast per-example masks.
        if mask is None or mask.ndim == 2:
            return blockwise_attention(
                q, k, v, mask, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                jax.default_backend() == "cpu")
        return fused_attention(q, k, v, mask, jax.default_backend() == "cpu")
    if force == "legacy":
        return fused_attention(q, k, v, mask, jax.default_backend() == "cpu")
    scale = q.shape[-1] ** -0.5
    if _os.environ.get("FSVLM_ATTN_REMAT") == "1":
        # Experiment: don't keep the (B, H, L, L) probs as a backward
        # residual — recompute scores/softmax from q, k, v in the backward
        # (flash-attention-style memory behavior, XLA matmuls).
        if mask is None:
            f = jax.checkpoint(
                lambda q_, k_, v_: _reference_attention(q_, k_, v_, None, scale)
            )
            return f(q, k, v)
        f = jax.checkpoint(
            lambda q_, k_, v_, m_: _reference_attention(q_, k_, v_, m_, scale)
        )
        return f(q, k, v, mask)
    return _reference_attention(q, k, v, mask, scale)

"""Pallas fused-attention kernel: interpret-mode parity + gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvlm_tpu.ops.flash_attention import (
    _reference_attention,
    blockwise_attention,
    fused_attention,
    packed_attention,
)
from fsvlm_tpu.ops.attention import causal_mask


@pytest.mark.parametrize("L,d,with_mask", [(77, 64, True), (197, 64, False), (13, 32, False)])
def test_kernel_matches_reference(L, d, with_mask):
    rng = np.random.RandomState(0)
    B, H = 2, 2
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    mask = causal_mask(L) if with_mask else None

    ref = _reference_attention(q, k, v, mask, d ** -0.5)
    out = fused_attention(q, k, v, mask, True)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_kernel_gradients_match_reference():
    rng = np.random.RandomState(1)
    B, H, L, d = 1, 2, 29, 32
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    mask = causal_mask(L)

    def loss_fused(q, k, v):
        return fused_attention(q, k, v, mask, True).sum()

    def loss_ref(q, k, v):
        return _reference_attention(q, k, v, mask, d ** -0.5).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "L,d,with_mask,bq,bk",
    [
        (77, 64, True, 256, 512),    # CLIP text: single block (degenerate)
        (201, 64, False, 256, 512),  # CLIP vision+VPT
        (300, 32, True, 128, 128),   # multi-block q AND kv, non-divisible L
        (513, 64, True, 256, 128),   # long-context: 3 q blocks x 5 kv blocks
    ],
)
def test_blockwise_matches_reference(L, d, with_mask, bq, bk):
    rng = np.random.RandomState(5)
    B, H = 2, 2
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    mask = causal_mask(L) if with_mask else None

    ref = _reference_attention(q, k, v, mask, d ** -0.5)
    out = blockwise_attention(q, k, v, mask, bq, bk, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("L,bq,bk", [(77, 256, 512), (300, 128, 128)])
def test_blockwise_gradients_match_reference(L, bq, bk):
    """The O(L)-memory backward (lse-residual recomputation across the
    blocked grid) must match autodiff through the reference attention."""
    rng = np.random.RandomState(6)
    B, H, d = 1, 2, 32
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    mask = causal_mask(L)
    w = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))  # non-uniform cotangent

    def loss_block(q, k, v):
        return (blockwise_attention(q, k, v, mask, bq, bk, True) * w).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, mask, d ** -0.5) * w).sum()

    g_block = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_block, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "H,L,with_mask,bq,bk",
    [
        (4, 77, True, 256, 512),    # CLIP text, single block, 2 head pairs
        (2, 201, False, 256, 512),  # CLIP vision+VPT
        (2, 300, True, 128, 128),   # multi-block q AND kv, non-divisible L
        # BQ != BK with multiple blocks of each (the long-context regime
        # where the default 256/512 blocks diverge — caught a fwd-kernel
        # lane-mask bug that crashed the on-chip L=1024 microbench)
        (2, 640, True, 128, 256),
    ],
)
def test_head_packed_matches_reference(H, L, with_mask, bq, bk):
    """Head-packed kernel (two d=64 heads per 128-lane tile): every head of
    the packed pair must match the unpacked reference."""
    rng = np.random.RandomState(7)
    B, d = 2, 64
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    mask = causal_mask(L) if with_mask else None

    ref = _reference_attention(q, k, v, mask, d ** -0.5)
    out = packed_attention(q, k, v, mask, bq, bk, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("L,bq,bk",
                         [(77, 256, 512), (300, 128, 128), (640, 128, 256)])
def test_head_packed_gradients_match_reference(L, bq, bk):
    """Packed backward (per-head lse/delta in lane halves, masked-lane
    accumulations) vs autodiff through the reference attention."""
    rng = np.random.RandomState(8)
    B, H, d = 1, 4, 64
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    mask = causal_mask(L)
    w = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))

    def loss_packed(q, k, v):
        return (packed_attention(q, k, v, mask, bq, bk, True) * w).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v, mask, d ** -0.5) * w).sum()

    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_packed, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_per_example_key_mask_broadcast():
    """(B, 1, 1, L) key-bias masks broadcast through the XLA path — the
    mechanism for batching sequences with different valid lengths (e.g. a
    fused student+teacher image pass)."""
    rng = np.random.RandomState(3)
    B, H, L, d = 3, 2, 10, 16
    q = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, d).astype(np.float32))

    # example 0 masks out the last 3 keys; others unmasked
    bias = np.zeros((B, 1, 1, L), np.float32)
    bias[0, ..., L - 3 :] = -1e30
    out = _reference_attention(q, k, v, jnp.asarray(bias), d ** -0.5)

    # equivalent: run example 0 with truncated keys
    ref0 = _reference_attention(
        q[:1, :, :, :], k[:1, :, : L - 3, :], v[:1, :, : L - 3, :], None, d ** -0.5
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]), rtol=1e-5, atol=1e-6)
    # unmasked examples match the no-mask result
    ref_all = _reference_attention(q, k, v, None, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out[1:]), np.asarray(ref_all[1:]), rtol=1e-5, atol=1e-6)

"""Pallas fused-attention kernel: interpret-mode parity + gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvlm_tpu.ops.flash_attention import (
    _reference_attention,
    fused_attention,
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

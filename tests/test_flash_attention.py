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

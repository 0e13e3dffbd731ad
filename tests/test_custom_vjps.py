"""Memory-lean custom VJPs must match plain autodiff gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from fsvlm_tpu.ops.layers import layer_norm, quick_gelu


def _ln_plain(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def test_layer_norm_vjp_matches_autodiff():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7, 16).astype(np.float32))
    scale = jnp.asarray(rng.randn(16).astype(np.float32))
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    g = jnp.asarray(rng.randn(4, 7, 16).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(layer_norm(x, scale, bias)),
        np.asarray(_ln_plain(x, scale, bias)),
        rtol=1e-5, atol=1e-6,
    )

    def loss_custom(x, s, b):
        return (layer_norm(x, s, b) * g).sum()

    def loss_plain(x, s, b):
        return (_ln_plain(x, s, b) * g).sum()

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gc, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_quick_gelu_vjp_matches_autodiff():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64).astype(np.float32) * 3)
    g = jnp.asarray(rng.randn(64).astype(np.float32))

    def plain(x):
        return x * jax.nn.sigmoid(1.702 * x)

    np.testing.assert_allclose(
        np.asarray(quick_gelu(x)), np.asarray(plain(x)), rtol=1e-6, atol=1e-7
    )
    gc = jax.grad(lambda x: (quick_gelu(x) * g).sum())(x)
    gp = jax.grad(lambda x: (plain(x) * g).sum())(x)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), rtol=1e-5, atol=1e-6)

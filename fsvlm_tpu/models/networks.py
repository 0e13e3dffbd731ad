"""Generator network zoo (NETWORK_REGISTRY): DDAIG's perturbation FCN.

Functional rebuild of Dassl.pytorch/dassl/modeling/network/ddaig_fcn.py:
reflection-padded conv stem, residual blocks with instance norm (stateless
— affine=False, track_running_stats=False in the reference), optional
global-context fusion, tanh-regressed perturbation added to the input
scaled by lmda.  Convs carry N(0, 0.02) init like the reference's
``init_network_weights(init_type="normal")``.

NHWC layout; instance norm reduces over H,W per-sample per-channel so the
whole generator is a pure function (params in, image out) — ideal for the
one-step DDAIG min/max which differentiates through G twice.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

NETWORK_REGISTRY = Registry("NETWORK")


def build_network(name, verbose=False, **kwargs):
    net = NETWORK_REGISTRY.get(name)(**kwargs)
    if verbose:
        print(f"Network: {name}")
    return net


def _conv_init(rng, kh, kw, cin, cout, gain=0.02, bias=False):
    p = {"w": (rng.standard_normal((kh, kw, cin, cout)) * gain).astype(np.float32)}
    if bias:
        p["b"] = np.zeros(cout, np.float32)
    return p


def _conv(x, p, stride=1, padding=0):
    pad = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False): per-sample, per-channel over H,W."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _reflect_pad(x, p=1):
    return jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")


class FCN:
    """Perturbation generator: x_p = x + lmda * tanh(regress(features))."""

    def __init__(self, input_nc=3, output_nc=3, nc=32, n_blocks=3, gctx=True,
                 seed=0):
        rng = np.random.RandomState(seed)
        self.n_blocks = n_blocks
        self.gctx = gctx
        p = {"stem": _conv_init(rng, 3, 3, input_nc, nc)}
        for i in range(n_blocks):
            p[f"res{i}a"] = _conv_init(rng, 3, 3, nc, nc)
            p[f"res{i}b"] = _conv_init(rng, 3, 3, nc, nc)
        if gctx:
            p["fuse"] = _conv_init(rng, 1, 1, 2 * nc, nc)
        p["regress"] = _conv_init(rng, 1, 1, nc, output_nc, bias=True)
        self.params = p

    def apply(self, params, x, lmda=1.0, return_p=False):
        h = _conv(_reflect_pad(x), params["stem"])
        h = jax.nn.relu(_instance_norm(h))
        for i in range(self.n_blocks):
            r = _conv(_reflect_pad(h), params[f"res{i}a"])
            r = jax.nn.relu(_instance_norm(r))
            r = _conv(_reflect_pad(r), params[f"res{i}b"])
            h = h + _instance_norm(r)
        if self.gctx:
            c = h.mean(axis=(1, 2), keepdims=True)
            c = jnp.broadcast_to(c, h.shape)
            h = jnp.concatenate([h, c], axis=-1)
            h = jax.nn.relu(_instance_norm(_conv(h, params["fuse"])))
        p = jnp.tanh(_conv(h, params["regress"]))
        x_p = x + lmda * p
        if return_p:
            return x_p, p
        return x_p


@NETWORK_REGISTRY.register()
def fcn_3x32_gctx(seed=0, **kw):
    return FCN(3, 3, nc=32, n_blocks=3, seed=seed)


@NETWORK_REGISTRY.register()
def fcn_3x64_gctx(seed=0, **kw):
    return FCN(3, 3, nc=64, n_blocks=3, seed=seed)

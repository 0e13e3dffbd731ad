"""Functional CNN primitives for the backbone zoo (NHWC, MXU-friendly).

TPU-native replacement for the torch layers the Dassl modeling zoo builds
on (Dassl.pytorch/dassl/modeling/backbone/*.py): convolutions lower to
``lax.conv_general_dilated`` in NHWC/HWIO (XLA tiles them onto the MXU),
BatchNorm is explicit functional state (params {scale, bias} + running
{mean, var}) threaded through the step — no hidden module mutation, so a
"frozen" tower can never silently update its statistics (a reference bug
PARITY.md documents).

Initializers follow torchvision semantics (kaiming-normal fan_out for
convs, unit/zero BN) so random-init training curves are comparable.
"""

import numpy as np

import jax
import jax.numpy as jnp


def conv_init(rng, kh, kw, cin, cout):
    """Kaiming-normal (fan_out, relu) — torchvision's conv init."""
    fan_out = kh * kw * cout
    std = float(np.sqrt(2.0 / fan_out))
    return {"w": (rng.standard_normal((kh, kw, cin, cout)) * std).astype(np.float32)}


def conv_apply(x, p, stride=1, padding=0, dilation=1):
    """padding is an int -> symmetric explicit padding, matching torch's
    Conv2d(padding=p) exactly (XLA's "SAME" splits odd padding
    differently, which breaks edge-pixel parity with the reference)."""
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    pad = [(padding, padding), (padding, padding)] if isinstance(padding, int) else padding
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=s,
        padding=pad,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bn_init(c, zero_scale=False):
    params = {
        "scale": np.zeros(c, np.float32) if zero_scale else np.ones(c, np.float32),
        "bias": np.zeros(c, np.float32),
    }
    state = {"mean": np.zeros(c, np.float32), "var": np.ones(c, np.float32)}
    return params, state


def bn_apply(x, p, s, train, momentum=0.1, eps=1e-5):
    """BatchNorm with torch semantics (biased batch var for normalization,
    unbiased for the running update).  Stats in fp32 regardless of the
    activation dtype.  Returns (y, new_state)."""
    if train:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = xf.mean(axes)
        var = xf.var(axes)
        n = np.prod([x.shape[i] for i in range(x.ndim - 1)])
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean) * inv * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_state


def linear_init(rng, cin, cout):
    """torch nn.Linear default: U(-1/sqrt(cin), 1/sqrt(cin))."""
    bound = 1.0 / np.sqrt(cin)
    return {
        "w": rng.uniform(-bound, bound, (cin, cout)).astype(np.float32),
        "b": rng.uniform(-bound, bound, (cout,)).astype(np.float32),
    }


def linear_apply(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def max_pool(x, window=3, stride=2, padding=1):
    """torch MaxPool2d(window, stride, padding) semantics (symmetric
    explicit padding with -inf fill)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def avg_pool_global(x):
    return x.mean(axis=(1, 2))


def relu(x):
    return jax.nn.relu(x)

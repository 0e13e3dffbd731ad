"""Modeling ops zoo: MixStyle, EFDMix, MMD, Sinkhorn OT, TransNorm, DSBN,
label-smoothed CE, squeeze-excite Attention, dynamic conv.

Functional rebuilds of Dassl.pytorch/dassl/modeling/ops/*.py.  The torch
modules' hidden state (activation toggles, `self.training`, per-module
buffers) becomes explicit arguments: style mixers take an rng + train
flag, the normalizers take and return their running-stat pytrees.  NHWC
layout throughout (the reference is NCHW; channel-last keeps XLA layouts
trivial on TPU).
"""

import numpy as np

import jax
import jax.numpy as jnp

from .backbones.common import conv_apply, conv_init, linear_apply, linear_init


# ------------------------------------------------------------- style mixing

def _mix_perm(rng, B, mix):
    """Partner permutation: 'random' shuffles, 'crossdomain' reverses the
    batch (assumed [domain A | domain B]) and shuffles within each half
    (mixstyle.py:100-113)."""
    if mix == "random":
        return jax.random.permutation(rng, B)
    if mix == "crossdomain":
        perm = jnp.arange(B - 1, -1, -1)
        half = B // 2
        k1, k2 = jax.random.split(rng)
        perm_b = perm[:half][jax.random.permutation(k1, half)]
        perm_a = perm[half:][jax.random.permutation(k2, B - half)]
        return jnp.concatenate([perm_b, perm_a], 0)
    raise NotImplementedError(mix)


def mixstyle(rng, x, p=0.5, alpha=0.1, eps=1e-6, mix="random", train=True):
    """MixStyle (Zhou et al., ICLR 2021; ops/mixstyle.py:53-124): mix
    per-sample channel statistics with a Beta(alpha, alpha) weight.
    x is NHWC; the whole batch is mixed or passed through with prob p."""
    if not train:
        return x
    B = x.shape[0]
    k_gate, k_lam, k_perm = jax.random.split(rng, 3)
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    sig = jnp.sqrt(var + eps)
    mu = jax.lax.stop_gradient(mu)
    sig = jax.lax.stop_gradient(sig)
    x_normed = (x - mu) / sig
    lmda = jax.random.beta(k_lam, alpha, alpha, (B, 1, 1, 1)).astype(x.dtype)
    perm = _mix_perm(k_perm, B, mix)
    mu_mix = mu * lmda + mu[perm] * (1 - lmda)
    sig_mix = sig * lmda + sig[perm] * (1 - lmda)
    mixed = x_normed * sig_mix + mu_mix
    use = jax.random.uniform(k_gate) <= p
    return jnp.where(use, mixed, x)


def efdmix(rng, x, p=0.5, alpha=0.1, mix="random", train=True):
    """EFDMix (Zhang et al., CVPR 2022; ops/efdmix.py:53-118): exact
    feature-distribution matching via sorted-value interpolation."""
    if not train:
        return x
    B, H, W, C = x.shape
    k_gate, k_lam, k_perm = jax.random.split(rng, 3)
    # channel-major flat view to sort the spatial values per (B, C)
    x_view = x.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    index_x = jnp.argsort(x_view, axis=-1)
    value_x = jnp.take_along_axis(x_view, index_x, axis=-1)
    lmda = jax.random.beta(k_lam, alpha, alpha, (B, 1, 1)).astype(x.dtype)
    perm = _mix_perm(k_perm, B, mix)
    inverse_index = jnp.argsort(index_x, axis=-1)
    x_view_copy = jnp.take_along_axis(value_x[perm], inverse_index, axis=-1)
    new_x = x_view + (x_view_copy - jax.lax.stop_gradient(x_view)) * (1 - lmda)
    mixed = new_x.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    use = jax.random.uniform(k_gate) <= p
    return jnp.where(use, mixed, x)


# --------------------------------------------------------------------- MMD

def _remove_self_distance(distmat):
    """Drop the diagonal: (n, n) -> (n, n-1) (ops/mmd.py:66-72)."""
    n = distmat.shape[0]
    mask = ~jnp.eye(n, dtype=bool)
    return distmat[mask].reshape(n, n - 1)


def _euclidean_squared_distance(x, y):
    d = (x ** 2).sum(1, keepdims=True) + (y ** 2).sum(1)[None] - 2 * x @ y.T
    return d


def _rbf_mixture(exponent, sigmas=(1, 5, 10)):
    K = 0.0
    for sigma in sigmas:
        K = K + jnp.exp(-exponent / (2.0 * sigma ** 2))
    return K


def maximum_mean_discrepancy(x, y, kernel_type="rbf", normalize=False):
    """MMD^2(x, y) with linear/poly/rbf kernels (ops/mmd.py)."""
    if normalize:
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
        y = y / jnp.linalg.norm(y, axis=1, keepdims=True).clip(1e-12)
    if kernel_type == "linear":
        k_xx = _remove_self_distance(x @ x.T)
        k_yy = _remove_self_distance(y @ y.T)
        k_xy = x @ y.T
    elif kernel_type == "poly":
        alpha, c, d = 1.0, 2.0, 2
        k_xx = (alpha * _remove_self_distance(x @ x.T) + c) ** d
        k_yy = (alpha * _remove_self_distance(y @ y.T) + c) ** d
        k_xy = (alpha * (x @ y.T) + c) ** d
    elif kernel_type == "rbf":
        k_xx = _rbf_mixture(_remove_self_distance(_euclidean_squared_distance(x, x)))
        k_yy = _rbf_mixture(_remove_self_distance(_euclidean_squared_distance(y, y)))
        k_xy = _rbf_mixture(_euclidean_squared_distance(x, y))
    else:
        raise NotImplementedError(kernel_type)
    return k_xx.mean() + k_yy.mean() - 2 * k_xy.mean()


# -------------------------------------------------------- optimal transport

def _ot_distance(b1, b2, dist_metric="cosine"):
    if dist_metric == "cosine":
        b1 = b1 / jnp.linalg.norm(b1, axis=1, keepdims=True).clip(1e-12)
        b2 = b2 / jnp.linalg.norm(b2, axis=1, keepdims=True).clip(1e-12)
        return 1.0 - b1 @ b2.T
    if dist_metric in ("euclidean", "fast_euclidean"):
        return _euclidean_squared_distance(b1, b2)
    raise ValueError(f"Unknown cost function: {dist_metric}")


def _sinkhorn_plan(C, eps, max_iter):
    """Entropic OT plan via log-domain Sinkhorn (ops/optimal_transport.py:
    sinkhorn_iterate).  Runs the full max_iter (documented divergence: the
    reference early-stops on a host-side err check; a fixed trip count
    keeps the loop jittable — with max_iter=5 default both run all
    iterations in practice)."""
    nx, ny = C.shape
    mu = jnp.full((nx,), 1.0 / nx, C.dtype)
    nu = jnp.full((ny,), 1.0 / ny, C.dtype)

    def M(u, v):
        return (-C + u[:, None] + v[None, :]) / eps

    def body(carry, _):
        u, v = carry
        u = eps * (jnp.log(mu + 1e-8) - jax.nn.logsumexp(M(u, v), axis=1)) + u
        v = eps * (jnp.log(nu + 1e-8) - jax.nn.logsumexp(M(u, v).T, axis=1)) + v
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (jnp.zeros_like(mu), jnp.zeros_like(nu)),
                             None, length=max_iter)
    return jnp.exp(M(u, v))


def sinkhorn_divergence(x, y, dist_metric="cosine", eps=0.01, max_iter=5,
                        bp_to_sinkhorn=False):
    """2 W(x,y) - W(x,x) - W(y,y) (ops/optimal_transport.py:36-67)."""

    def cost(a, b):
        C = _ot_distance(a, b, dist_metric)
        pi = _sinkhorn_plan(C, eps, max_iter)
        if not bp_to_sinkhorn:
            pi = jax.lax.stop_gradient(pi)
        return (pi * C).sum()

    return 2 * cost(x, y) - cost(x, x) - cost(y, y)


def minibatch_energy_distance(x, y, **kw):
    """MED over split halves (ops/optimal_transport.py:104-147)."""
    x1, x2 = jnp.split(x, 2, axis=0)
    y1, y2 = jnp.split(y, 2, axis=0)

    def cost(a, b):
        C = _ot_distance(a, b, kw.get("dist_metric", "cosine"))
        pi = _sinkhorn_plan(C, kw.get("eps", 0.01), kw.get("max_iter", 5))
        if not kw.get("bp_to_sinkhorn", False):
            pi = jax.lax.stop_gradient(pi)
        return (pi * C).sum()

    return (cost(x1, y1) + cost(x1, y2) + cost(x2, y1) + cost(x2, y2)
            - 2 * cost(x1, x2) - 2 * cost(y1, y2))


# ------------------------------------------------------------------ losses

def cross_entropy_smooth(logits, labels, label_smooth=0.0, reduction="mean"):
    """CE with label smoothing (ops/cross_entropy.py)."""
    n_cls = logits.shape[1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    target = jax.nn.one_hot(labels, n_cls, dtype=logp.dtype)
    target = (1.0 - label_smooth) * target + label_smooth / n_cls
    loss = -(target * logp).sum(1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(reduction)


# -------------------------------------------------------------- normalizers

def transnorm_init(c):
    """TransNorm (Wang et al., NeurIPS 2019; ops/transnorm.py): affine
    params + separate source/target running stats."""
    params = {"scale": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}
    state = {"mean_s": np.zeros(c, np.float32), "var_s": np.ones(c, np.float32),
             "mean_t": np.zeros(c, np.float32), "var_t": np.ones(c, np.float32)}
    return params, state


def _tn_alpha(mean_s, var_s, mean_t, var_t, eps):
    C = mean_s.shape[-1]
    ratio_s = mean_s / jnp.sqrt(var_s + eps)
    ratio_t = mean_t / jnp.sqrt(var_t + eps)
    dist_inv = 1.0 / (1.0 + jnp.abs(ratio_s - ratio_t))
    return C * dist_inv / dist_inv.sum()


def transnorm_apply(x, params, state, train, momentum=0.1, eps=1e-5,
                    adaptive_alpha=True):
    """x: (B, ..., C) with the batch = [source half | target half] in train
    (the reference's DA batch convention, transnorm.py:96-133).
    NOTE the reference's running-stat update multiplies the OLD value by
    momentum and adds (1-momentum)*new — inverted vs torch BN; reproduced
    faithfully.  Returns (y, new_state)."""
    axes = tuple(range(x.ndim - 1))
    scale, bias = params["scale"], params["bias"]
    if not train:
        mean_t, var_t = state["mean_t"], state["var_t"]
        y = (x - mean_t) / jnp.sqrt(var_t + eps) * scale + bias
        if adaptive_alpha:
            alpha = _tn_alpha(state["mean_s"], state["var_s"], mean_t, var_t, eps)
            y = (1 + jax.lax.stop_gradient(alpha)) * y
        return y, state
    xs, xt = jnp.split(x, 2, axis=0)
    mean_s = xs.astype(jnp.float32).mean(axes)
    var_s = xs.astype(jnp.float32).var(axes)
    mean_t = xt.astype(jnp.float32).mean(axes)
    var_t = xt.astype(jnp.float32).var(axes)
    new_state = {
        "mean_s": momentum * state["mean_s"] + (1 - momentum) * mean_s,
        "var_s": momentum * state["var_s"] + (1 - momentum) * var_s,
        "mean_t": momentum * state["mean_t"] + (1 - momentum) * mean_t,
        "var_t": momentum * state["var_t"] + (1 - momentum) * var_t,
    }
    ys = (xs - mean_s) / jnp.sqrt(var_s + eps) * scale + bias
    yt = (xt - mean_t) / jnp.sqrt(var_t + eps) * scale + bias
    y = jnp.concatenate([ys, yt], axis=0)
    if adaptive_alpha:
        alpha = _tn_alpha(mean_s, var_s, mean_t, var_t, eps)
        y = (1 + jax.lax.stop_gradient(alpha)) * y
    return y, new_state


def dsbn_init(c, n_domain):
    """Domain-specific BN (ops/dsbn.py): one BN per domain, stacked."""
    params = {"scale": np.ones((n_domain, c), np.float32),
              "bias": np.zeros((n_domain, c), np.float32)}
    state = {"mean": np.zeros((n_domain, c), np.float32),
             "var": np.ones((n_domain, c), np.float32)}
    return params, state


def dsbn_apply(x, params, state, domain_idx, train, momentum=0.1, eps=1e-5):
    """Select domain domain_idx's BN; only its running stats update.
    Returns (y, new_state)."""
    scale = jnp.take(params["scale"], domain_idx, axis=0)
    bias = jnp.take(params["bias"], domain_idx, axis=0)
    if train:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axes)
        var = xf.var(axes)
        n = int(np.prod([x.shape[i] for i in range(x.ndim - 1)]))
        unbiased = var * (n / max(n - 1, 1))
        new_mean = state["mean"].at[domain_idx].set(
            (1 - momentum) * state["mean"][domain_idx] + momentum * mean)
        new_var = state["var"].at[domain_idx].set(
            (1 - momentum) * state["var"][domain_idx] + momentum * unbiased)
        new_state = {"mean": new_mean, "var": new_var}
    else:
        mean = jnp.take(state["mean"], domain_idx, axis=0)
        var = jnp.take(state["var"], domain_idx, axis=0)
        new_state = state
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype), new_state


# --------------------------------------------------- dynamic-conv attention

def attention_init(rng, in_channels, out_features, squeeze=None):
    """Squeeze-excite-style attention (ops/attention.py, DDG)."""
    squeeze = squeeze or in_channels // 16
    assert squeeze > 0
    return {"fc1": linear_init(rng, in_channels, squeeze),
            "fc2": linear_init(rng, squeeze, out_features)}


def attention_apply(x, params):
    """x: NHWC -> softmax weights (B, out_features)."""
    h = x.mean(axis=(1, 2))
    h = jax.nn.relu(linear_apply(h, params["fc1"]))
    return jax.nn.softmax(linear_apply(h, params["fc2"]).astype(jnp.float32), -1)


def conv2d_dynamic_init(rng, cin, cout, kernel_size, squeeze=None,
                        attention_in_channels=None):
    """Conv2dDynamic (ops/conv.py, DDG): a base conv blended with grouped
    and 1x1 kernel templates by attention weights.  attention_in_channels
    sets the attention input width when the attention is computed over a
    different tensor than the conv input (the dynamic resnet blocks feed
    the block input, resnet_dynamic.py:282-289)."""
    if kernel_size % 2 == 0:
        raise ValueError("Kernel_size must be odd now because the templates "
                         "we used are odd (kernel_size=1).")
    p = {"conv": conv_init(rng, kernel_size, kernel_size, cin, cout),
         "conv_11": conv_init(rng, 1, 1, cin, cout),
         "att": attention_init(rng, attention_in_channels or cin, 2,
                               squeeze=squeeze)}
    for name in ("conv", "conv_11"):
        p[name]["b"] = np.zeros(cout, np.float32)
    # grouped template: groups = min(cin, cout)
    groups = min(cin, cout)
    p["conv_nn"] = {"w": (rng.standard_normal(
        (kernel_size, kernel_size, cin // groups, cout)) *
        np.sqrt(2.0 / (kernel_size * kernel_size * cout))).astype(np.float32),
        "b": np.zeros(cout, np.float32)}
    p["groups"] = groups
    return p


def conv2d_dynamic_apply(x, params, stride=1, attention_x=None):
    """y = conv(x) + w0 * conv_nn(x) + w1 * conv_11(x)
    (ops/conv.py:70-95)."""
    att_in = attention_x if attention_x is not None else x
    w = attention_apply(att_in, params["att"]).astype(x.dtype)
    k = params["conv"]["w"].shape[0]
    pad = k // 2
    y = conv_apply(x, params["conv"], stride=stride, padding=pad)
    y = y + params["conv"]["b"].astype(x.dtype)
    groups = params["groups"]
    y_nn = jax.lax.conv_general_dilated(
        x, params["conv_nn"]["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)], feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_nn = y_nn + params["conv_nn"]["b"].astype(x.dtype)
    y_11 = conv_apply(x, params["conv_11"], stride=stride, padding=0)
    y_11 = y_11 + params["conv_11"]["b"].astype(x.dtype)
    return y + y_nn * w[:, None, None, 0:1] + y_11 * w[:, None, None, 1:2]

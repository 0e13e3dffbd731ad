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
    """Perturbation generator: x_p = x + lmda * tanh(regress(features)).

    Stateless (instance norm only) — ``state`` is an empty pytree and
    ``apply_stateful`` exists so trainers can thread generator state
    uniformly (the STN variant carries LocNet BatchNorm statistics)."""

    def __init__(self, input_nc=3, output_nc=3, nc=32, n_blocks=3, gctx=True,
                 seed=0):
        rng = np.random.RandomState(seed)
        self.n_blocks = n_blocks
        self.gctx = gctx
        self.state = {}
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

    def apply_stateful(self, params, state, x, lmda=1.0, train=False):
        """(x_p, new_state) — uniform stateful contract for trainers."""
        return self.apply(params, x, lmda=lmda), state


def _affine_grid_sample(x, theta):
    """Bilinear sampling on an affine grid, torch semantics
    (F.affine_grid(align_corners=False) + F.grid_sample with zero padding)
    — NHWC.  theta: (B, 2, 3) mapping output normalized coords to input."""
    B, H, W, C = x.shape
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * 2.0 / H - 1.0
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * 2.0 / W - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (HW, 3)
    src = jnp.einsum("bij,pj->bpi", theta.astype(jnp.float32), coords)  # (B,HW,2)
    sx = (src[..., 0] + 1.0) * W / 2.0 - 0.5
    sy = (src[..., 1] + 1.0) * H / 2.0 - 0.5

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = x.reshape(B, H * W, C)
        v = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return v * inside[..., None].astype(x.dtype)

    out = (gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
           + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
           + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
           + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None])
    return out.reshape(B, H, W, C).astype(x.dtype)


class LocNet:
    """Localization net for the STN FCN variants (ddaig_fcn.py:115-161):
    strided conv + BN + resblocks w/ maxpool -> fc predicting a 2x2 linear
    map; fc initialized to the identity transform."""

    def __init__(self, input_nc=3, nc=32, n_blocks=3, image_size=32, seed=0):
        rng = np.random.RandomState(seed)
        self.n_blocks = n_blocks
        p = {"stem": _conv_init(rng, 3, 3, input_nc, nc)}
        s = {}
        from .backbones.common import bn_init

        p["stem_bn"], s["stem_bn"] = bn_init(nc)
        for i in range(n_blocks):
            p[f"res{i}a"] = _conv_init(rng, 3, 3, nc, nc)
            p[f"res{i}a_bn"], s[f"res{i}a_bn"] = bn_init(nc)
            p[f"res{i}b"] = _conv_init(rng, 3, 3, nc, nc)
            p[f"res{i}b_bn"], s[f"res{i}b_bn"] = bn_init(nc)
        reduced = int(image_size * 0.5 ** (n_blocks + 1))
        # identity init (init_loc_layer, ddaig_fcn.py:236-242)
        p["fc"] = {"w": np.zeros((nc * reduced * reduced, 4), np.float32),
                   "b": np.array([1, 0, 0, 1], np.float32)}
        self.params, self.state = p, s

    def apply(self, params, state, x, train=False):
        from .backbones.common import bn_apply, max_pool

        ns = {}
        h = _conv(x, params["stem"], stride=2, padding=1)
        h, ns["stem_bn"] = bn_apply(h, params["stem_bn"], state["stem_bn"], train)
        h = jax.nn.relu(h)
        for i in range(self.n_blocks):
            r = _conv(h, params[f"res{i}a"], padding=1)
            r, ns[f"res{i}a_bn"] = bn_apply(
                r, params[f"res{i}a_bn"], state[f"res{i}a_bn"], train)
            r = jax.nn.relu(r)
            r = _conv(r, params[f"res{i}b"], padding=1)
            r, ns[f"res{i}b_bn"] = bn_apply(
                r, params[f"res{i}b_bn"], state[f"res{i}b_bn"], train)
            h = max_pool(h + r, 2, 2, 0)
        B = x.shape[0]
        h = h.reshape(B, -1)
        lin = jnp.tanh(h @ params["fc"]["w"] + params["fc"]["b"])
        lin = lin.reshape(B, 2, 2)
        theta = jnp.concatenate(
            [lin, jnp.zeros((B, 2, 1), lin.dtype)], axis=-1)
        return theta, ns


class FCNSTN(FCN):
    """FCN with a spatial-transformer front end (stn=True variants).

    The LocNet carries BatchNorm running statistics; the reference runs it
    in train mode during G updates (ddaig_fcn.py:115-161 under
    set_model_mode("train")), so ``apply_stateful`` normalizes with batch
    stats and returns the updated running stats for the trainer to thread
    through its G state pytree.  The stateless ``apply`` (eval helper /
    ad-hoc callers) uses the init statistics in eval mode."""

    def __init__(self, input_nc=3, output_nc=3, nc=32, n_blocks=3, gctx=True,
                 image_size=32, seed=0):
        super().__init__(input_nc, output_nc, nc, n_blocks, gctx, seed)
        self.locnet = LocNet(input_nc, nc, n_blocks, image_size, seed + 1)
        self.params = {"fcn": self.params, "loc": self.locnet.params}
        self.state = self.locnet.state

    def apply(self, params, x, lmda=1.0, return_p=False, state=None,
              train=False):
        loc_state = state if state is not None else self.state
        theta, _ = self.locnet.apply(params["loc"], loc_state, x, train=train)
        x = _affine_grid_sample(x, theta)
        return FCN.apply(self, params["fcn"], x, lmda=lmda, return_p=return_p)

    def apply_stateful(self, params, state, x, lmda=1.0, train=False):
        theta, new_state = self.locnet.apply(params["loc"], state, x,
                                             train=train)
        x = _affine_grid_sample(x, theta)
        return FCN.apply(self, params["fcn"], x, lmda=lmda), new_state


@NETWORK_REGISTRY.register()
def fcn_3x32_gctx(seed=0, **kw):
    return FCN(3, 3, nc=32, n_blocks=3, seed=seed)


@NETWORK_REGISTRY.register()
def fcn_3x64_gctx(seed=0, **kw):
    return FCN(3, 3, nc=64, n_blocks=3, seed=seed)


@NETWORK_REGISTRY.register()
def fcn_3x32_gctx_stn(image_size=32, seed=0, **kw):
    return FCNSTN(3, 3, nc=32, n_blocks=3, image_size=image_size, seed=seed)


@NETWORK_REGISTRY.register()
def fcn_3x64_gctx_stn(image_size=224, seed=0, **kw):
    return FCNSTN(3, 3, nc=64, n_blocks=3, image_size=image_size, seed=seed)

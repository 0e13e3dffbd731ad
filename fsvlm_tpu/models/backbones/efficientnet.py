"""EfficientNet B0-B7 backbones.

Functional rebuild of Dassl.pytorch/dassl/modeling/backbone/efficientnet/
(the lukemelas port): MBConv blocks (expand 1x1 -> depthwise -> SE ->
project) with swish, TF-SAME padding, compound width/depth scaling
(round_filters/round_repeats), per-block linearly-ramped drop-connect.
BN uses the reference's momentum 0.01 (1 - 0.99) and eps 1e-3.  The
classifier fc is stripped — the backbone returns pooled head features
(out_features = round_filters(1280)).

Drop-connect/dropout need an rng in train mode; absent rng raises (no
silent no-op)."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from . import BACKBONE_REGISTRY, Backbone
from .common import bn_init, conv_init

# (repeats, kernel, stride, expand, c_in, c_out, se_ratio) — the B0 block
# args (efficientnet/utils.py:370-379), scaled per model.
_BLOCKS_ARGS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

# width, depth, resolution, dropout (efficientnet/utils.py:266-283)
_PARAMS = {
    "b0": (1.0, 1.0, 224, 0.2), "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3), "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4), "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5), "b7": (2.0, 3.1, 600, 0.5),
}

_BN_MOM, _BN_EPS = 0.01, 1e-3  # torch momentum = 1 - 0.99
_DROP_CONNECT = 0.2


def _round_filters(filters, width, divisor=8):
    if not width:
        return filters
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats, depth):
    return int(math.ceil(depth * repeats)) if depth else repeats


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv_same(x, w, stride=1, groups=1):
    """TF-SAME-padded conv, NHWC/HWIO (the reference's static same-padding
    Conv2d, efficientnet/utils.py Conv2dStaticSamePadding)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "SAME",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, s, train):
    from .common import bn_apply

    return bn_apply(x, p, s, train, momentum=_BN_MOM, eps=_BN_EPS)


def _drop_connect(x, rng, rate, train):
    if not train or not rate:
        return x
    if rng is None:
        raise ValueError("efficientnet drop-connect needs an rng in train mode")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return (x / keep * mask).astype(x.dtype)


class EfficientNetBackbone(Backbone):
    def __init__(self, name, seed=0):
        width, depth, _res, dropout = _PARAMS[name]
        self.dropout_rate = dropout
        rng = np.random.RandomState(seed)
        p, s = {}, {}
        stem_out = _round_filters(32, width)
        p["stem_conv"] = conv_init(rng, 3, 3, 3, stem_out)
        p["stem_bn"], s["stem_bn"] = bn_init(stem_out)

        self.blocks = []  # (key, kernel, stride, expand, cin, cout, se)
        cin = stem_out
        bi = 0
        for (r, k, st, e, _ci, co, se) in _BLOCKS_ARGS:
            cout = _round_filters(co, width)
            for j in range(_round_repeats(r, depth)):
                stride = st if j == 0 else 1
                key = f"block{bi}"
                bp, bs = {}, {}
                mid = cin * e
                if e != 1:
                    bp["expand"] = conv_init(rng, 1, 1, cin, mid)
                    bp["bn0"], bs["bn0"] = bn_init(mid)
                bp["dw"] = conv_init(rng, k, k, 1, mid)  # depthwise HWIO: I=1
                bp["bn1"], bs["bn1"] = bn_init(mid)
                n_sq = max(1, int(cin * se))
                bp["se_reduce"] = conv_init(rng, 1, 1, mid, n_sq)
                bp["se_reduce"]["b"] = np.zeros(n_sq, np.float32)
                bp["se_expand"] = conv_init(rng, 1, 1, n_sq, mid)
                bp["se_expand"]["b"] = np.zeros(mid, np.float32)
                bp["project"] = conv_init(rng, 1, 1, mid, cout)
                bp["bn2"], bs["bn2"] = bn_init(cout)
                p[key], s[key] = bp, bs
                self.blocks.append((key, k, stride, e, cin, cout))
                cin = cout
                bi += 1

        head_out = _round_filters(1280, width)
        p["head_conv"] = conv_init(rng, 1, 1, cin, head_out)
        p["head_bn"], s["head_bn"] = bn_init(head_out)
        self.out_features = head_out
        self.params, self.state = p, s

    def apply(self, params, state, x, train=False, rng=None):
        ns = {}
        h = _conv_same(x, params["stem_conv"]["w"], stride=2)
        h, ns["stem_bn"] = _bn(h, params["stem_bn"], state["stem_bn"], train)
        h = _swish(h)
        n_blocks = len(self.blocks)
        for i, (key, k, stride, e, cin, cout) in enumerate(self.blocks):
            bp, bs = params[key], state[key]
            nbs = {}
            inputs = h
            if e != 1:
                h = _conv_same(h, bp["expand"]["w"])
                h, nbs["bn0"] = _bn(h, bp["bn0"], bs["bn0"], train)
                h = _swish(h)
            mid = h.shape[-1]
            h = _conv_same(h, bp["dw"]["w"], stride=stride, groups=mid)
            h, nbs["bn1"] = _bn(h, bp["bn1"], bs["bn1"], train)
            h = _swish(h)
            # squeeze & excite
            sq = h.mean(axis=(1, 2), keepdims=True)
            sq = _conv_same(sq, bp["se_reduce"]["w"]) + bp["se_reduce"]["b"].astype(h.dtype)
            sq = _swish(sq)
            sq = _conv_same(sq, bp["se_expand"]["w"]) + bp["se_expand"]["b"].astype(h.dtype)
            h = jax.nn.sigmoid(sq) * h
            h = _conv_same(h, bp["project"]["w"])
            h, nbs["bn2"] = _bn(h, bp["bn2"], bs["bn2"], train)
            if stride == 1 and cin == cout:
                rate = _DROP_CONNECT * float(i) / n_blocks
                k_i = jax.random.fold_in(rng, i) if rng is not None else None
                h = _drop_connect(h, k_i, rate, train)
                h = h + inputs
            ns[key] = nbs
        h = _conv_same(h, params["head_conv"]["w"])
        h, ns["head_bn"] = _bn(h, params["head_bn"], state["head_bn"], train)
        h = _swish(h)
        h = h.mean(axis=(1, 2))
        if train and self.dropout_rate:
            if rng is None:
                raise ValueError(
                    "efficientnet dropout needs an rng in train mode")
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, 10_000), 1.0 - self.dropout_rate, h.shape)
            h = (h * keep / (1.0 - self.dropout_rate)).astype(h.dtype)
        return h, ns


def _register():
    for name in _PARAMS:
        def make(name=name):
            def build(seed=0, **kw):
                return EfficientNetBackbone(name, seed)
            return build

        fn = make()
        fn.__name__ = f"efficientnet_{name}"
        BACKBONE_REGISTRY.register(fn)


_register()

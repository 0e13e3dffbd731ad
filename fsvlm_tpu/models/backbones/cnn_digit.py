"""Digit-benchmark CNN backbones (32x32 inputs).

Functional rebuilds of the reference's three small digit nets:
- cnn_digitsdg (Dassl.pytorch/dassl/modeling/backbone/cnn_digitsdg.py):
  4x [conv3x3-64+relu, maxpool2] -> flatten, fdim 256.
- cnn_digitsingle (cnn_digitsingle.py): conv5(valid)x2 with pools, two fc
  layers, fdim 1024.
- cnn_digit5_m3sda (cnn_digit5_m3sda.py): 3x conv5(pad2)+bn (+pool after
  the first two), fc(8192->3072)+bn + dropout + fc(3072->2048)+bn,
  fdim 2048.
"""

import numpy as np

import jax

from . import BACKBONE_REGISTRY, Backbone
from .common import (
    bn_apply,
    bn_init,
    conv_apply,
    conv_init,
    linear_apply,
    linear_init,
    max_pool,
    relu,
)


def _biased_conv(rng, kh, kw, cin, cout):
    p = conv_init(rng, kh, kw, cin, cout)
    p["b"] = np.zeros(cout, np.float32)
    return p


def _conv_b(x, p, stride=1, padding=0):
    return conv_apply(x, p, stride=stride, padding=padding) + p["b"].astype(x.dtype)


class CnnDigitsDG(Backbone):
    def __init__(self, seed=0, c_hidden=64):
        rng = np.random.RandomState(seed)
        self.params = {
            f"conv{i}": _biased_conv(rng, 3, 3, 3 if i == 0 else c_hidden, c_hidden)
            for i in range(4)
        }
        self.state = {}
        self.out_features = c_hidden * 2 * 2

    def apply(self, params, state, x, train=False, rng=None):
        h = x
        for i in range(4):
            h = relu(_conv_b(h, params[f"conv{i}"], padding=1))
            h = max_pool(h, 2, 2, 0)
        return h.reshape(h.shape[0], -1), state


class CnnDigitSingle(Backbone):
    """conv1 5x5 valid -> pool2 -> conv2 5x5 valid -> pool2 -> fc3 -> fc4."""

    out_features = 1024

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        self.params = {
            "conv1": _biased_conv(rng, 5, 5, 3, 64),
            "conv2": _biased_conv(rng, 5, 5, 64, 128),
            "fc3": linear_init(rng, 5 * 5 * 128, 1024),
            "fc4": linear_init(rng, 1024, 1024),
        }
        self.state = {}

    def apply(self, params, state, x, train=False, rng=None):
        h = max_pool(relu(_conv_b(x, params["conv1"], padding=0)), 2, 2, 0)
        h = max_pool(relu(_conv_b(h, params["conv2"], padding=0)), 2, 2, 0)
        h = h.reshape(h.shape[0], -1)
        h = relu(linear_apply(h, params["fc3"]))
        return relu(linear_apply(h, params["fc4"])), state


class CnnDigit5M3SDA(Backbone):
    out_features = 2048

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        p = {
            "conv1": _biased_conv(rng, 5, 5, 3, 64),
            "conv2": _biased_conv(rng, 5, 5, 64, 64),
            "conv3": _biased_conv(rng, 5, 5, 64, 128),
            "fc1": linear_init(rng, 8192, 3072),
            "fc2": linear_init(rng, 3072, 2048),
        }
        s = {}
        for name, c in (("bn1", 64), ("bn2", 64), ("bn3", 128),
                        ("bnf1", 3072), ("bnf2", 2048)):
            p[name], s[name] = bn_init(c)
        self.params, self.state = p, s

    def apply(self, params, state, x, train=False, rng=None, dropout_rng=None):
        if dropout_rng is None:
            dropout_rng = rng
        ns = {}
        h = _conv_b(x, params["conv1"], padding=2)
        h, ns["bn1"] = bn_apply(h, params["bn1"], state["bn1"], train)
        h = max_pool(relu(h), 3, 2, 1)
        h = _conv_b(h, params["conv2"], padding=2)
        h, ns["bn2"] = bn_apply(h, params["bn2"], state["bn2"], train)
        h = max_pool(relu(h), 3, 2, 1)
        h = _conv_b(h, params["conv3"], padding=2)
        h, ns["bn3"] = bn_apply(h, params["bn3"], state["bn3"], train)
        h = relu(h).reshape(x.shape[0], 8192)
        h = linear_apply(h, params["fc1"])
        h, ns["bnf1"] = bn_apply(h, params["bnf1"], state["bnf1"], train)
        h = relu(h)
        if train and dropout_rng is not None:  # F.dropout(training=...), p=.5
            keep = jax.random.bernoulli(dropout_rng, 0.5, h.shape)
            h = (h * keep / 0.5).astype(h.dtype)
        h = linear_apply(h, params["fc2"])
        h, ns["bnf2"] = bn_apply(h, params["bnf2"], state["bnf2"], train)
        return relu(h), ns


@BACKBONE_REGISTRY.register()
def cnn_digitsdg(seed=0, **kw):
    return CnnDigitsDG(seed)


@BACKBONE_REGISTRY.register()
def cnn_digitsingle(seed=0, **kw):
    return CnnDigitSingle(seed)


@BACKBONE_REGISTRY.register()
def cnn_digit5_m3sda(seed=0, **kw):
    return CnnDigit5M3SDA(seed)

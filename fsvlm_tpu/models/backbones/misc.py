"""AlexNet, VGG-16, PreAct-ResNet18 backbones.

Functional rebuilds of Dassl.pytorch/dassl/modeling/backbone/
{alexnet,vgg,preact_resnet18}.py.  The torch classifier heads output
FEATURES (the reference strips the final fc), so out_features are 4096
(AlexNet/VGG) and 512 (PreAct).  Dropout layers need an rng in train
mode — passing none raises instead of silently skipping (the framework's
no-silent-no-op rule)."""

import numpy as np

import jax
import jax.numpy as jnp

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


def _dropout(x, rng, rate, train):
    if not train or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("dropout needs an rng in train mode")
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return (x * keep / (1.0 - rate)).astype(x.dtype)


def _biased_conv(rng, kh, kw, cin, cout):
    p = conv_init(rng, kh, kw, cin, cout)
    p["b"] = np.zeros(cout, np.float32)
    return p


def _conv_b(x, p, stride=1, padding=0):
    return conv_apply(x, p, stride=stride, padding=padding) + p["b"].astype(x.dtype)


def _adaptive_avg_pool(x, out_hw):
    """AdaptiveAvgPool2d(out_hw) for NHWC via resize-mean (exact when the
    input divides evenly, which holds at the reference image sizes)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if H % oh == 0 and W % ow == 0:
        return x.reshape(B, oh, H // oh, ow, W // ow, C).mean(axis=(2, 4))
    # uneven fallback: torch adaptive pooling bin edges
    def pool_axis(arr, size, out, axis):
        idx0 = [int(np.floor(i * size / out)) for i in range(out)]
        idx1 = [int(np.ceil((i + 1) * size / out)) for i in range(out)]
        slices = [arr.take(range(a, b), axis=axis).mean(axis=axis, keepdims=True)
                  for a, b in zip(idx0, idx1)]
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, H, oh, 1)
    return pool_axis(x, W, ow, 2)


class AlexNetBackbone(Backbone):
    """backbone/alexnet.py: 5-conv features + 6x6 avgpool + 2-layer fc."""

    out_features = 4096

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        self.params = {
            "conv1": _biased_conv(rng, 11, 11, 3, 64),
            "conv2": _biased_conv(rng, 5, 5, 64, 192),
            "conv3": _biased_conv(rng, 3, 3, 192, 384),
            "conv4": _biased_conv(rng, 3, 3, 384, 256),
            "conv5": _biased_conv(rng, 3, 3, 256, 256),
            "fc1": linear_init(rng, 256 * 6 * 6, 4096),
            "fc2": linear_init(rng, 4096, 4096),
        }
        self.state = {}

    def apply(self, params, state, x, train=False, rng=None):
        h = max_pool(relu(_conv_b(x, params["conv1"], stride=4, padding=2)), 3, 2, 0)
        h = max_pool(relu(_conv_b(h, params["conv2"], padding=2)), 3, 2, 0)
        h = relu(_conv_b(h, params["conv3"], padding=1))
        h = relu(_conv_b(h, params["conv4"], padding=1))
        h = max_pool(relu(_conv_b(h, params["conv5"], padding=1)), 3, 2, 0)
        h = _adaptive_avg_pool(h, (6, 6)).reshape(x.shape[0], -1)
        k1 = k2 = None
        if rng is not None:
            k1, k2 = jax.random.split(rng)
        h = _dropout(h, k1, 0.5, train)
        h = relu(linear_apply(h, params["fc1"]))
        h = _dropout(h, k2, 0.5, train)
        return relu(linear_apply(h, params["fc2"])), state


_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16Backbone(Backbone):
    """backbone/vgg.py (cfg 'D', no BN): 13 convs + 7x7 avgpool + 2 fcs."""

    out_features = 4096

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        p = {}
        cin = 3
        i = 0
        for v in _VGG16_CFG:
            if v == "M":
                continue
            p[f"conv{i}"] = _biased_conv(rng, 3, 3, cin, v)
            cin = v
            i += 1
        p["fc1"] = linear_init(rng, 512 * 7 * 7, 4096)
        p["fc2"] = linear_init(rng, 4096, 4096)
        self.params = p
        self.state = {}

    def apply(self, params, state, x, train=False, rng=None):
        h = x
        i = 0
        for v in _VGG16_CFG:
            if v == "M":
                h = max_pool(h, 2, 2, 0)
            else:
                h = relu(_conv_b(h, params[f"conv{i}"], padding=1))
                i += 1
        h = _adaptive_avg_pool(h, (7, 7)).reshape(x.shape[0], -1)
        k1 = k2 = None
        if rng is not None:
            k1, k2 = jax.random.split(rng)
        h = relu(linear_apply(h, params["fc1"]))
        h = _dropout(h, k1, 0.5, train)
        h = relu(linear_apply(h, params["fc2"]))
        return _dropout(h, k2, 0.5, train), state


class PreActResNet18Backbone(Backbone):
    """backbone/preact_resnet18.py: CIFAR-style 3x3 stem, pre-activation
    basic blocks, 4x4 avg pool."""

    out_features = 512

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        p, s = {"conv1": conv_init(rng, 3, 3, 3, 64)}, {}
        cin = 64
        self._layout = []
        for stage, (planes, stride0) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            for b in range(2):
                stride = stride0 if b == 0 else 1
                key = f"layer{stage + 1}_{b}"
                bp, bs = {}, {}
                bp["bn1"], bs["bn1"] = bn_init(cin)
                bp["conv1"] = conv_init(rng, 3, 3, cin, planes)
                bp["bn2"], bs["bn2"] = bn_init(planes)
                bp["conv2"] = conv_init(rng, 3, 3, planes, planes)
                if stride != 1 or cin != planes:
                    bp["shortcut"] = conv_init(rng, 1, 1, cin, planes)
                p[key], s[key] = bp, bs
                self._layout.append((key, stride))
                cin = planes
        self.params, self.state = p, s

    def apply(self, params, state, x, train=False, rng=None):
        ns = {}
        h = conv_apply(x, params["conv1"], stride=1, padding=1)
        for key, stride in self._layout:
            bp, bs = params[key], state[key]
            nbs = {}
            out, nbs["bn1"] = bn_apply(h, bp["bn1"], bs["bn1"], train)
            out = relu(out)
            shortcut = (conv_apply(out, bp["shortcut"], stride=stride, padding=0)
                        if "shortcut" in bp else h)
            out = conv_apply(out, bp["conv1"], stride=stride, padding=1)
            out2, nbs["bn2"] = bn_apply(out, bp["bn2"], bs["bn2"], train)
            out = conv_apply(relu(out2), bp["conv2"], stride=1, padding=1)
            h = out + shortcut
            ns[key] = nbs
        # F.avg_pool2d(out, 4)
        B, H, W, C = h.shape
        h = h.reshape(B, H // 4, 4, W // 4, 4, C).mean(axis=(2, 4))
        return h.reshape(B, -1), ns


@BACKBONE_REGISTRY.register()
def alexnet(seed=0, **kw):
    return AlexNetBackbone(seed)


@BACKBONE_REGISTRY.register()
def vgg16(seed=0, **kw):
    return VGG16Backbone(seed)


@BACKBONE_REGISTRY.register()
def preact_resnet18(seed=0, **kw):
    return PreActResNet18Backbone(seed)

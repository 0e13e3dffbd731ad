"""Functional ResNet backbone family (resnet18/34/50/101).

TPU-native rebuild of the Dassl modeling zoo's resnet
(Dassl.pytorch/dassl/modeling/backbone/resnet.py, itself torchvision):
same architecture and init, expressed as explicit (params, state) pytrees
with a pure apply function.  BatchNorm state is threaded, never mutated in
place.  Weights from a torchvision ``state_dict`` checkpoint on disk can
be imported with ``load_torch_state_dict`` (this environment has no
network egress, so there is no downloader — same policy as the CLIP
loader, trainers/backbone.py:56-61).

Pretrained=True with no checkpoint found raises loudly rather than
training silently from random weights.
"""

import numpy as np

from . import BACKBONE_REGISTRY, Backbone
from .common import (
    avg_pool_global,
    bn_apply,
    bn_init,
    conv_apply,
    conv_init,
    max_pool,
    relu,
)

BLOCK_BASIC = "basic"
BLOCK_BOTTLENECK = "bottleneck"
_EXPANSION = {BLOCK_BASIC: 1, BLOCK_BOTTLENECK: 4}


def _init_block(rng, kind, cin, width, stride, zero_init_residual=False,
                dynamic=False):
    """One residual block's (params, state).  dynamic=True swaps the 3x3
    convs for Conv2dDynamic (DDG, dassl backbone/resnet_dynamic.py:256-376)
    with the attention computed on the block input."""
    from ..modeling_ops import conv2d_dynamic_init

    def conv3x3(ci, co):
        if dynamic:
            return conv2d_dynamic_init(rng, ci, co, 3,
                                       squeeze=max(cin // 16, 4),
                                       attention_in_channels=cin)
        return conv_init(rng, 3, 3, ci, co)

    p, s = {}, {}
    cout = width * _EXPANSION[kind]
    if kind == BLOCK_BASIC:
        p["conv1"] = conv3x3(cin, width)
        p["bn1"], s["bn1"] = bn_init(width)
        p["conv2"] = conv3x3(width, width)
        p["bn2"], s["bn2"] = bn_init(width, zero_scale=zero_init_residual)
    else:
        p["conv1"] = conv_init(rng, 1, 1, cin, width)
        p["bn1"], s["bn1"] = bn_init(width)
        p["conv2"] = conv3x3(width, width)
        p["bn2"], s["bn2"] = bn_init(width)
        p["conv3"] = conv_init(rng, 1, 1, width, cout)
        p["bn3"], s["bn3"] = bn_init(cout, zero_scale=zero_init_residual)
    if stride != 1 or cin != cout:
        p["down_conv"] = conv_init(rng, 1, 1, cin, cout)
        p["down_bn"], s["down_bn"] = bn_init(cout)
    return p, s


def _apply_block(x, p, s, kind, stride, train, dynamic=False):
    from ..modeling_ops import conv2d_dynamic_apply

    def conv3x3(h, cp, st):
        if dynamic:
            # attention over the BLOCK input (resnet_dynamic.py:297-303)
            return conv2d_dynamic_apply(h, cp, stride=st, attention_x=x)
        return conv_apply(h, cp, stride=st, padding=1)

    ns = {}
    identity = x
    if kind == BLOCK_BASIC:
        h = conv3x3(x, p["conv1"], stride)
        h, ns["bn1"] = bn_apply(h, p["bn1"], s["bn1"], train)
        h = relu(h)
        h = conv3x3(h, p["conv2"], 1)
        h, ns["bn2"] = bn_apply(h, p["bn2"], s["bn2"], train)
    else:
        h = conv_apply(x, p["conv1"], stride=1, padding=0)
        h, ns["bn1"] = bn_apply(h, p["bn1"], s["bn1"], train)
        h = relu(h)
        h = conv3x3(h, p["conv2"], stride)
        h, ns["bn2"] = bn_apply(h, p["bn2"], s["bn2"], train)
        h = relu(h)
        h = conv_apply(h, p["conv3"], stride=1, padding=0)
        h, ns["bn3"] = bn_apply(h, p["bn3"], s["bn3"], train)
    if "down_conv" in p:
        identity = conv_apply(x, p["down_conv"], stride=stride, padding=0)
        identity, ns["down_bn"] = bn_apply(identity, p["down_bn"], s["down_bn"], train)
    return relu(h + identity), ns


class ResNetBackbone(Backbone):
    """Functional ResNet; ``apply(params, state, x, train)`` ->
    (features (B, fdim), new_state).

    ms_layers/ms_class insert a style mixer (MixStyle or EFDMix,
    models/modeling_ops.py) after the named stages — the reference's DG
    resnet variants (dassl backbone/resnet.py:283-594).  Stochastic mixing
    needs an ``rng``: calling a style variant in train mode without one
    raises instead of silently skipping the augmentation."""

    def __init__(self, kind, layers, seed=0, ms_layers=(), ms_class="mixstyle",
                 ms_p=0.5, ms_a=0.1, dynamic=False):
        self.kind = kind
        self.layers = layers
        self.dynamic = dynamic
        self.out_features = 512 * _EXPANSION[kind]
        self.ms_layers = tuple(ms_layers)
        self.ms_class = ms_class
        self.ms_p, self.ms_a = ms_p, ms_a
        rng = np.random.RandomState(seed)
        p, s = {}, {}
        p["conv1"] = conv_init(rng, 7, 7, 3, 64)
        p["bn1"], s["bn1"] = bn_init(64)
        cin = 64
        self._strides = []
        for stage, n_blocks in enumerate(layers):
            width = 64 * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                key = f"layer{stage + 1}_{b}"
                p[key], s[key] = _init_block(rng, kind, cin, width, stride,
                                             dynamic=dynamic)
                self._strides.append((key, stride))
                cin = width * _EXPANSION[kind]
        self.params, self.state = p, s

    def _mix(self, h, rng, stage_idx):
        import jax

        from ..modeling_ops import efdmix, mixstyle

        k = jax.random.fold_in(rng, stage_idx)
        fn = mixstyle if self.ms_class == "mixstyle" else efdmix
        return fn(k, h, p=self.ms_p, alpha=self.ms_a)

    def apply(self, params, state, x, train=False, rng=None):
        if self.ms_layers and train and rng is None:
            raise ValueError(
                f"{self.ms_class} backbone needs an rng in train mode "
                "(pass rng= through SimpleNet.apply)")
        ns = {}
        h = conv_apply(x, params["conv1"], stride=2, padding=3)
        h, ns["bn1"] = bn_apply(h, params["bn1"], state["bn1"], train)
        h = relu(h)
        h = max_pool(h, 3, 2, 1)
        stage_of = lambda key: key.split("_")[0]  # noqa: E731
        last_in_stage = {}
        for key, _ in self._strides:
            last_in_stage[stage_of(key)] = key
        for i, (key, stride) in enumerate(self._strides):
            h, ns[key] = _apply_block(h, params[key], state[key], self.kind,
                                      stride, train, dynamic=self.dynamic)
            stage = stage_of(key)
            if (train and stage in self.ms_layers
                    and last_in_stage[stage] == key):
                h = self._mix(h, rng, i)
        return avg_pool_global(h), ns


_TV_STAGE = {  # our key prefix -> torchvision prefix
    "conv1": "conv1", "bn1": "bn1",
}


def load_torch_state_dict(backbone, sd):
    """Import a torchvision resnet state_dict (torch tensors or numpy)
    into (params, state).  Returns the new pytrees."""
    def get(name):
        t = sd[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    p = {k: dict(v) if isinstance(v, dict) else v for k, v in backbone.params.items()}
    s = {k: dict(v) for k, v in backbone.state.items()}

    def put_conv(ours, theirs):
        p[ours] = {"w": get(theirs + ".weight").transpose(2, 3, 1, 0)}

    def put_bn(tree, ours, theirs):
        tree[ours] = {
            "scale": get(theirs + ".weight"),
            "bias": get(theirs + ".bias"),
        } if tree is p else {
            "mean": get(theirs + ".running_mean"),
            "var": get(theirs + ".running_var"),
        }

    put_conv("conv1", "conv1")
    put_bn(p, "bn1", "bn1")
    put_bn(s, "bn1", "bn1")
    for key, _ in backbone._strides:
        stage, b = key.split("_")
        tv = f"{stage}.{b}"
        blk_p, blk_s = dict(p[key]), dict(s[key])
        names = ["conv1", "conv2"] if backbone.kind == BLOCK_BASIC else ["conv1", "conv2", "conv3"]
        for c in names:
            blk_p[c] = {"w": get(f"{tv}.{c}.weight").transpose(2, 3, 1, 0)}
            bn = "bn" + c[-1]
            blk_p[bn] = {"scale": get(f"{tv}.{bn}.weight"), "bias": get(f"{tv}.{bn}.bias")}
            blk_s[bn] = {"mean": get(f"{tv}.{bn}.running_mean"), "var": get(f"{tv}.{bn}.running_var")}
        if "down_conv" in blk_p:
            blk_p["down_conv"] = {"w": get(f"{tv}.downsample.0.weight").transpose(2, 3, 1, 0)}
            blk_p["down_bn"] = {
                "scale": get(f"{tv}.downsample.1.weight"),
                "bias": get(f"{tv}.downsample.1.bias"),
            }
            blk_s["down_bn"] = {
                "mean": get(f"{tv}.downsample.1.running_mean"),
                "var": get(f"{tv}.downsample.1.running_var"),
            }
        p[key], s[key] = blk_p, blk_s
    return p, s


@BACKBONE_REGISTRY.register()
def resnet18(seed=0, **kw):
    return ResNetBackbone(BLOCK_BASIC, [2, 2, 2, 2], seed)


@BACKBONE_REGISTRY.register()
def resnet34(seed=0, **kw):
    return ResNetBackbone(BLOCK_BASIC, [3, 4, 6, 3], seed)


@BACKBONE_REGISTRY.register()
def resnet50(seed=0, **kw):
    return ResNetBackbone(BLOCK_BOTTLENECK, [3, 4, 6, 3], seed)


@BACKBONE_REGISTRY.register()
def resnet101(seed=0, **kw):
    return ResNetBackbone(BLOCK_BOTTLENECK, [3, 4, 23, 3], seed)


@BACKBONE_REGISTRY.register()
def resnet152(seed=0, **kw):
    return ResNetBackbone(BLOCK_BOTTLENECK, [3, 8, 36, 3], seed)


_ARCH = {"resnet18": (BLOCK_BASIC, [2, 2, 2, 2]),
         "resnet50": (BLOCK_BOTTLENECK, [3, 4, 6, 3]),
         "resnet101": (BLOCK_BOTTLENECK, [3, 4, 23, 3])}


def _register_style_variants():
    """MixStyle/EFDMix resnet variants (dassl backbone/resnet.py:283-594):
    resnet{18,50,101}_{ms,efdmix}_l{123,12,1}, and the DDG dynamic-conv
    variants (backbone/resnet_dynamic.py:575-737):
    resnet{18,50,101}_dynamic[_ms_l{123,12,1}]."""
    stage_sets = (("l123", ("layer1", "layer2", "layer3")),
                  ("l12", ("layer1", "layer2")),
                  ("l1", ("layer1",)))

    def reg(name, **fixed):
        def build(seed=0, _fixed=fixed, **kw):
            return ResNetBackbone(seed=seed, **_fixed)

        build.__name__ = name
        BACKBONE_REGISTRY.register(build)

    for arch, (kind, layers) in _ARCH.items():
        for ms_class, tag in (("mixstyle", "ms"), ("efdmix", "efdmix")):
            for stages_tag, stages in stage_sets:
                reg(f"{arch}_{tag}_{stages_tag}", kind=kind, layers=layers,
                    ms_layers=stages, ms_class=ms_class)
        reg(f"{arch}_dynamic", kind=kind, layers=layers, dynamic=True)
        for stages_tag, stages in stage_sets:
            reg(f"{arch}_dynamic_ms_{stages_tag}", kind=kind, layers=layers,
                dynamic=True, ms_layers=stages, ms_class="mixstyle")


_register_style_variants()

"""Wide ResNet (pre-activation, LeakyReLU 0.01) — the SSL standard.

Functional rebuild of Dassl.pytorch/dassl/modeling/backbone/wide_resnet.py
(wide_resnet_28_2 / wide_resnet_16_4): pre-activation BasicBlocks in three
stages (strides 1/2/2), final BN+LeakyReLU+global-avg-pool.
"""

import numpy as np

import jax

from . import BACKBONE_REGISTRY, Backbone
from .common import avg_pool_global, bn_apply, bn_init, conv_apply, conv_init


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class WideResNet(Backbone):
    def __init__(self, depth, widen_factor, seed=0):
        assert (depth - 4) % 6 == 0
        n = (depth - 4) // 6
        chans = [16, 16 * widen_factor, 32 * widen_factor, 64 * widen_factor]
        rng = np.random.RandomState(seed)
        p, s = {}, {}
        p["conv1"] = conv_init(rng, 3, 3, 3, chans[0])
        cin = chans[0]
        self._blocks = []
        for stage in range(3):
            cout = chans[stage + 1]
            stride = 1 if stage == 0 else 2
            for b in range(n):
                key = f"b{stage}_{b}"
                blk_p, blk_s = {}, {}
                blk_p["bn1"], blk_s["bn1"] = bn_init(cin)
                blk_p["conv1"] = conv_init(rng, 3, 3, cin, cout)
                blk_p["bn2"], blk_s["bn2"] = bn_init(cout)
                blk_p["conv2"] = conv_init(rng, 3, 3, cout, cout)
                if cin != cout:
                    blk_p["shortcut"] = conv_init(rng, 1, 1, cin, cout)
                p[key], s[key] = blk_p, blk_s
                self._blocks.append((key, stride if b == 0 else 1, cin != cout))
                cin = cout
        p["bn_out"], s["bn_out"] = bn_init(cin)
        self.params, self.state = p, s
        self.out_features = cin

    def apply(self, params, state, x, train=False, rng=None):
        ns = {}
        h = conv_apply(x, params["conv1"], stride=1, padding=1)
        for key, stride, proj in self._blocks:
            bp, bs = params[key], state[key]
            nbs = {}
            pre, nbs["bn1"] = bn_apply(h, bp["bn1"], bs["bn1"], train)
            pre = _lrelu(pre)
            # pre-activation: when the block projects, the shortcut taps the
            # activated input; otherwise the raw input (wide_resnet.py:50-58)
            out = conv_apply(pre, bp["conv1"], stride=stride, padding=1)
            out, nbs["bn2"] = bn_apply(out, bp["bn2"], bs["bn2"], train)
            out = conv_apply(_lrelu(out), bp["conv2"], stride=1, padding=1)
            shortcut = (
                conv_apply(pre, bp["shortcut"], stride=stride, padding=0)
                if proj
                else h
            )
            h = shortcut + out
            ns[key] = nbs
        h, ns["bn_out"] = bn_apply(h, params["bn_out"], state["bn_out"], train)
        return avg_pool_global(_lrelu(h)), ns


@BACKBONE_REGISTRY.register()
def wide_resnet_28_2(seed=0, **kw):
    return WideResNet(28, 2, seed)


@BACKBONE_REGISTRY.register()
def wide_resnet_16_4(seed=0, **kw):
    return WideResNet(16, 4, seed)

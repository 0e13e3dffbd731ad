"""Head zoo (HEAD_REGISTRY): the reference's mlp head as a registry entry.

Parity: Dassl.pytorch/dassl/modeling/head/{build,mlp}.py — `build_head`
resolves by name; `mlp` is [Linear -> BN1d -> activation (-> dropout)] per
hidden layer.  Functional: returns a Head with (params, state) pytrees and
a pure apply; SimpleNet (models/simple_net.py) consumes the same
primitives directly for the config-driven path.
"""

import numpy as np

import jax

from ..utils.registry import Registry
from .backbones.common import bn_apply, linear_apply, linear_init

HEAD_REGISTRY = Registry("HEAD")


def build_head(name, verbose=False, **kwargs):
    head = HEAD_REGISTRY.get(name)(**kwargs)
    if verbose:
        print(f"Head: {name} (out_features={head.out_features})")
    return head


class MLPHead:
    def __init__(self, in_features=2048, hidden_layers=(), activation="relu",
                 bn=True, dropout=0.0, seed=0):
        hidden_layers = ([hidden_layers] if isinstance(hidden_layers, int)
                         else list(hidden_layers))
        assert len(hidden_layers) > 0
        if activation == "relu":
            self.act = jax.nn.relu
        elif activation == "leaky_relu":
            self.act = lambda x: jax.nn.leaky_relu(x, 0.01)
        else:
            raise NotImplementedError(activation)
        self.bn = bn
        self.dropout = dropout
        self.out_features = hidden_layers[-1]
        rng = np.random.RandomState(seed)
        params, state = {}, {}
        cin = in_features
        self.n_layers = len(hidden_layers)
        for i, width in enumerate(hidden_layers):
            params[f"fc{i}"] = linear_init(rng, cin, width)
            if bn:
                from .backbones.common import bn_init

                params[f"bn{i}"], state[f"bn{i}"] = bn_init(width)
            cin = width
        self.params, self.state = params, state

    def apply(self, params, state, x, train=False, rng=None):
        new_state = {}
        for i in range(self.n_layers):
            x = linear_apply(x, params[f"fc{i}"])
            if self.bn:
                x, new_state[f"bn{i}"] = bn_apply(
                    x, params[f"bn{i}"], state[f"bn{i}"], train)
            x = self.act(x)
            if self.dropout > 0 and train:
                if rng is None:
                    raise ValueError("mlp head dropout needs an rng in train mode")
                k = jax.random.fold_in(rng, i)
                keep = jax.random.bernoulli(k, 1.0 - self.dropout, x.shape)
                x = (x * keep / (1.0 - self.dropout)).astype(x.dtype)
        return x, new_state


@HEAD_REGISTRY.register()
def mlp(**kwargs):
    return MLPHead(**kwargs)

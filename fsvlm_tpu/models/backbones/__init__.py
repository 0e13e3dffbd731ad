"""Backbone zoo: functional CNN feature extractors.

Mirror of the reference modeling zoo's registry surface
(Dassl.pytorch/dassl/modeling/backbone/build.py): names are looked up in
``BACKBONE_REGISTRY`` and built with ``build_backbone(name)``.  Each entry
returns a ``Backbone`` carrying init pytrees (``.params``, ``.state``) and
a pure ``apply(params, state, x, train) -> (features, new_state)``.
"""

from ...utils.registry import Registry

BACKBONE_REGISTRY = Registry("BACKBONE")


class Backbone:
    """Base: subclasses set .params, .state, .out_features, .apply()."""

    out_features = None
    params = None
    state = None

    def apply(self, params, state, x, train=False, rng=None):
        raise NotImplementedError


def build_backbone(name, verbose=False, **kwargs):
    backbone = BACKBONE_REGISTRY.get(name)(**kwargs)
    if verbose:
        print(f"Backbone: {name} (fdim={backbone.out_features})")
    return backbone


from . import (  # noqa: E402,F401  (register)
    cnn_digit,
    efficientnet,
    misc,
    resnet,
    wide_resnet,
)

"""SimpleNet: backbone + optional mlp head + linear classifier.

Functional rebuild of the reference's generic classification network
(Dassl.pytorch/dassl/engine/trainer.py:22-77 SimpleNet and
dassl/modeling/head/mlp.py): pytrees in, (logits | features, new_state)
out.  This is the model every DA/DG/SSL trainer builds.
"""

import glob
import os

import numpy as np

from .backbones import build_backbone
from .backbones.common import bn_apply, bn_init, linear_apply, linear_init, relu


def find_backbone_weights(name):
    """Locate a torchvision-style state_dict for a zoo backbone: searches
    $FSVLM_BACKBONE_WEIGHTS (file or dir) then the torch hub cache.  The
    reference auto-downloads (dassl backbone/resnet.py model_zoo); this
    environment has no egress, so weights must be staged on disk."""
    cand = os.environ.get("FSVLM_BACKBONE_WEIGHTS", "")
    paths = []
    if cand:
        paths += [cand] if os.path.isfile(cand) else glob.glob(
            os.path.join(cand, f"{name}*.pth")) + glob.glob(
            os.path.join(cand, f"{name}*.pt"))
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    paths += sorted(glob.glob(os.path.join(hub, f"{name}-*.pth")))
    return paths[0] if paths else None


class SimpleNet:
    def __init__(self, cfg, model_cfg, num_classes, seed=0, **kwargs):
        self.backbone = build_backbone(
            model_cfg.BACKBONE.NAME, verbose=cfg.VERBOSE, seed=seed, **kwargs
        )
        if model_cfg.BACKBONE.PRETRAINED:
            self._try_load_pretrained(model_cfg.BACKBONE.NAME)
        fdim = self.backbone.out_features
        rng = np.random.RandomState(seed + 1)

        params = {"backbone": self.backbone.params}
        state = {"backbone": self.backbone.state}

        self.head_layers = []
        head_cfg = getattr(model_cfg, "HEAD", None)
        if head_cfg is not None and head_cfg.NAME and list(head_cfg.HIDDEN_LAYERS):
            hp, hs = {}, {}
            cin = fdim
            for i, width in enumerate(head_cfg.HIDDEN_LAYERS):
                hp[f"fc{i}"] = linear_init(rng, cin, width)
                if head_cfg.BN:
                    hp[f"bn{i}"], hs[f"bn{i}"] = bn_init(width)
                self.head_layers.append((i, bool(head_cfg.BN)))
                cin = width
            params["head"], state["head"] = hp, hs
            fdim = cin

        if num_classes > 0:
            params["classifier"] = linear_init(rng, fdim, num_classes)

        self.fdim = fdim
        self.params, self.state = params, state

    def _try_load_pretrained(self, name):
        """MODEL.BACKBONE.PRETRAINED=True: import staged weights when
        available, otherwise warn PROMINENTLY (never a silent no-op; the
        reference would have downloaded them, dassl resnet.py:219-226)."""
        path = find_backbone_weights(name)
        if path is None:
            print(
                f"* WARNING: MODEL.BACKBONE.PRETRAINED=True but no weights "
                f'found for "{name}" (searched $FSVLM_BACKBONE_WEIGHTS and '
                f"~/.cache/torch/hub/checkpoints) — initializing randomly. "
                f"Set MODEL.BACKBONE.PRETRAINED False to silence."
            )
            return
        from .backbones.resnet import ResNetBackbone, load_torch_state_dict

        if not isinstance(self.backbone, ResNetBackbone) or self.backbone.dynamic:
            print(
                f"* WARNING: pretrained import for \"{name}\" is not "
                f"implemented (only plain/MixStyle resnets); found {path} "
                f"but initializing randomly."
            )
            return
        import pickle

        try:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            with open(path, "rb") as f:
                sd = pickle.load(f)
        p, s = load_torch_state_dict(self.backbone, sd)
        self.backbone.params, self.backbone.state = p, s
        print(f'Loaded pretrained backbone weights from "{path}"')

    def apply(self, params, state, x, train=False, return_feature=False,
              rng=None):
        bb_kw = {"rng": rng} if rng is not None else {}
        f, bb_state = self.backbone.apply(
            params["backbone"], state["backbone"], x, train, **bb_kw
        )
        new_state = dict(state, backbone=bb_state)
        if self.head_layers:
            hp = params["head"]
            hs = state["head"]
            nhs = {}
            for i, use_bn in self.head_layers:
                f = linear_apply(f, hp[f"fc{i}"])
                if use_bn:
                    f, nhs[f"bn{i}"] = bn_apply(f, hp[f"bn{i}"], hs[f"bn{i}"], train)
                f = relu(f)
            new_state["head"] = nhs
        if "classifier" not in params:
            return f, new_state
        logits = linear_apply(f, params["classifier"])
        if return_feature:
            return (logits, f), new_state
        return logits, new_state

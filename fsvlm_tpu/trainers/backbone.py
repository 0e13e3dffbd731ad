"""CLIP backbone resolution for trainers.

The reference downloads OpenAI release archives on demand
(clip/clip.py:39-68 + trainers' load_clip_to_cpu).  This environment has no
network egress, so resolution is file-search based:

1. ``$FSVLM_CLIP_WEIGHTS`` (a file, or a directory containing
   ``<Name-with-dashes>.pt``),
2. ``~/.cache/clip/<Name>.pt`` (the reference's cache location),
3. random weights with the reference init distributions when
   MODEL.BACKBONE.PRETRAINED is False or the arch is a test-tiny config —
   this keeps every trainer, test, and benchmark runnable offline.
"""

import os

from ..models.clip import ARCHS
from ..models.clip.convert import load_openai_checkpoint, random_clip_params

_FILENAMES = {
    "ViT-B/16": "ViT-B-16.pt",
    "ViT-B/32": "ViT-B-32.pt",
    "RN50": "RN50.pt",
    "RN101": "RN101.pt",
    "RN50x4": "RN50x4.pt",
    "RN50x16": "RN50x16.pt",
}


def find_clip_weights(name):
    fname = _FILENAMES.get(name)
    candidates = []
    env = os.environ.get("FSVLM_CLIP_WEIGHTS")
    if env:
        candidates.append(env if os.path.isfile(env) else os.path.join(env, fname or ""))
    if fname:
        candidates.append(os.path.expanduser(os.path.join("~/.cache/clip", fname)))
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


def _apply_frozen_dtype(cfg, params):
    """MODEL.FROZEN_DTYPE=bf16 stores the frozen towers in bfloat16.

    Upstream OpenAI CLIP ships fp16 weights (clip/model.py convert_weights;
    the fork comments the call out at model.py:699 and keeps fp32).  bf16
    storage halves weight HBM reads (+1.3-2% step throughput measured,
    PERF.md) at upstream-comparable storage precision; fp32-stat LayerNorm
    and fp32 softmax/logits still apply on top either way.  Default fp32 =
    the fork's behavior."""
    mode = str(getattr(cfg.MODEL, "FROZEN_DTYPE", "fp32")).lower()
    if mode in ("fp32", "float32", ""):
        return params
    if mode not in ("bf16", "bfloat16"):
        raise ValueError(f"Unknown MODEL.FROZEN_DTYPE: {mode}")
    import jax
    import jax.numpy as jnp
    import numpy as np

    def cast(x):
        arr = np.asarray(x)
        return arr.astype(jnp.bfloat16) if arr.dtype == np.float32 else x

    return jax.tree.map(cast, params)


def load_clip_backbone(cfg):
    """Returns (clip_params, clip_cfg) for cfg.MODEL.BACKBONE.NAME."""
    name = cfg.MODEL.BACKBONE.NAME
    if name not in ARCHS:
        raise ValueError(f"Unknown CLIP backbone: {name} (choices {sorted(ARCHS)})")
    arch = ARCHS[name]

    if name.startswith("test-tiny") or not cfg.MODEL.BACKBONE.PRETRAINED:
        print(f"Building {name} CLIP with random weights (no pretrained load)")
        return _apply_frozen_dtype(cfg, random_clip_params(arch, seed=max(cfg.SEED, 0))), arch

    path = find_clip_weights(name)
    if path is None:
        raise FileNotFoundError(
            f"No CLIP weights found for {name}. Set FSVLM_CLIP_WEIGHTS or place "
            f"{_FILENAMES.get(name)} under ~/.cache/clip. (This environment has "
            "no network egress, so weights cannot be downloaded.)"
        )
    print(f"Loading CLIP {name} from {path}")
    params, loaded_cfg = load_openai_checkpoint(path)
    return _apply_frozen_dtype(cfg, params), loaded_cfg

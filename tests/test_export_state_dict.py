"""export_openai_state_dict must be the exact inverse of
clip_params_from_state_dict — the golden-pack generator relies on it to
feed deterministically regenerable full-shape weights (random_clip_params)
to the torch oracle (reference clip/model.py:370-431) without committing
hundreds of MB of weights.  Pure fsvlm roundtrip; no reference needed."""

import numpy as np
import pytest

from fsvlm_tpu.models.clip.config import CLIPConfig
from fsvlm_tpu.models.clip.convert import (
    clip_params_from_state_dict,
    export_openai_state_dict,
    random_clip_params,
)

VIT = CLIPConfig(64, 32, 2, 64, 16, 77, 49408, 64, 4, 2)
RN = CLIPConfig(64, 32, (1, 1, 1, 1), 8, None, 77, 49408, 64, 4, 2)


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flat(v, f"{prefix}[{i}]")
    else:
        yield prefix, np.asarray(tree)


@pytest.mark.parametrize("cfg", [VIT, RN], ids=["vit", "rn"])
def test_roundtrip_exact(cfg):
    params = random_clip_params(cfg, seed=5)
    sd = export_openai_state_dict(params, cfg)
    params2, cfg2 = clip_params_from_state_dict(sd)
    assert cfg2.is_vit == cfg.is_vit
    assert cfg2.vision_layers == cfg.vision_layers
    assert cfg2.embed_dim == cfg.embed_dim
    a = dict(_flat(params))
    b = dict(_flat(params2))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_exported_keys_are_total():
    """Every exported key is one the forward converter consumes (so
    torch load_state_dict(strict=True) against the reference model has no
    unexpected keys) and vice versa."""
    from fsvlm_tpu.models.clip.convert import _consumed_keys

    for cfg in (VIT, RN):
        sd = export_openai_state_dict(random_clip_params(cfg, seed=1), cfg)
        consumed = _consumed_keys(cfg)
        # num_batches_tracked is emitted for torch strict-load but matched
        # by the converter's skip patterns, not its consumed set
        extra = {k for k in sd if k not in consumed
                 and not k.endswith("num_batches_tracked")}
        missing = {k for k in consumed if k not in sd
                   and ".downsample." not in k}
        assert not extra, sorted(extra)[:5]
        assert not missing, sorted(missing)[:5]

"""Weight-porting paths: torch state-dict file -> pytree, and totality of
the converter's key accounting."""

import numpy as np
import pytest
import torch

from reference_oracle import import_reference_clip, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _tiny_model():
    import_reference_clip()
    from clip.model import CLIP

    torch.manual_seed(0)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    return CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).eval()


def test_load_openai_checkpoint_state_dict_file(tmp_path):
    from fsvlm_tpu.models.clip.convert import load_openai_checkpoint

    model = _tiny_model()
    path = tmp_path / "clip.pt"
    torch.save(model.state_dict(), path)

    params, cfg = load_openai_checkpoint(str(path))
    assert cfg.vision_width == 128 and cfg.transformer_layers == 2
    np.testing.assert_allclose(
        params["text"]["token_embedding"],
        model.token_embedding.weight.detach().numpy(),
    )


def test_converter_rejects_unknown_keys():
    from fsvlm_tpu.models.clip.convert import clip_params_from_state_dict

    model = _tiny_model()
    sd = dict(model.state_dict())
    sd["mystery.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="Unmapped checkpoint keys"):
        clip_params_from_state_dict(sd)


def test_converter_skips_prompt_keys():
    from fsvlm_tpu.models.clip.convert import clip_params_from_state_dict

    model = _tiny_model()
    sd = dict(model.state_dict())
    sd["prompt_learner.ctx"] = torch.zeros(4, 128)
    sd["visual.VPT"] = torch.zeros(4, 128)
    params, cfg = clip_params_from_state_dict(sd)  # sanctioned skips
    assert "visual" in params

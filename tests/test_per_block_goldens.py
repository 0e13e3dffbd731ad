"""Per-block activation goldens (SURVEY.md §4(b)): every transformer block's
output must match the reference, not just the tower outputs.  Uses the
reference's own saved_features instrumentation (clip/model.py:340-366) as
the golden source and our collect_activations hook."""

import numpy as np
import pytest

from reference_oracle import import_reference_clip, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def test_text_tower_per_block_parity():
    import torch

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    from fsvlm_tpu.models.clip.tokenizer import tokenize
    from fsvlm_tpu.models.clip.transformer import transformer
    from fsvlm_tpu.ops.attention import causal_mask

    torch.manual_seed(3)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = CLIP(64, 32, 4, 128, 16, 77, 49408, 128, 2, 4, design).eval()
    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))

    ids = tokenize(["a photo of a cat.", "itap of a dog."])
    with torch.no_grad():
        x = model.token_embedding(torch.from_numpy(ids).long())
        emb = x.numpy()
        x = (x + model.positional_embedding).permute(1, 0, 2)
        model.transformer(x)  # first forward populates saved_features
    goldens = [f.permute(1, 0, 2).numpy() for f in model.transformer.saved_features]
    assert len(goldens) == 4

    import jax.numpy as jnp

    inp = jnp.asarray(emb) + params["text"]["positional_embedding"]
    _, acts = transformer(
        params["text"]["blocks"],
        inp,
        n_heads=cfg.transformer_heads,
        mask=causal_mask(77),
        collect_activations=True,
    )
    acts = np.asarray(acts)  # (n_layers, B, L, D)
    for layer, golden in enumerate(goldens):
        np.testing.assert_allclose(
            acts[layer], golden, rtol=2e-4, atol=2e-5,
            err_msg=f"block {layer} diverged",
        )

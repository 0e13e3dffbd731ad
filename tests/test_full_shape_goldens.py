"""Full-scale-shape random-weight oracle parity (round-3 VERDICT item 2).

Every other oracle test runs tiny architectures; shape-dependent conversion
bugs (14x14 patch-grid ordering, pos-emb length 197, RN50 attention-pool at
7x7) would hide there and silently burn the +-0.3% accuracy budget the day
real weights arrive.  This module replays the REAL shapes once against the
torch reference instantiated with random weights (clip/model.py:370-431):

- ViT-B/16 @ 224^2: per-block activations of both towers + final features
  + logits
- RN50 @ 224^2: stem/stages + the 7x7 attention pool (model.py:56-92)

fp32 end-to-end on CPU; no pretrained weights or TPU needed.  Runtime is
~1-2 min (the heaviest CPU oracle test — keep it to one batch).
"""

import numpy as np
import pytest

from reference_oracle import import_reference_clip, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

PLAIN_DESIGN = {
    "trainer": "CoOp",
    "vision_depth": 0,
    "language_depth": 0,
    "vision_ctx": 0,
    "language_ctx": 0,
}

PROMPTS = [
    "a photo of a golden retriever, a type of dog.",
    "itap of a 1962 Ferrari 250 GTO.",
    "a bad photo of the sea.",
]


@pytest.fixture(scope="module")
def vit_b16():
    """Reference ViT-B/16 CLIP at the real published shape, random weights."""
    import torch

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    torch.manual_seed(16)
    model = CLIP(
        embed_dim=512,
        image_resolution=224,
        vision_layers=12,
        vision_width=768,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
        design_details=PLAIN_DESIGN,
    ).eval()
    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))
    assert cfg.is_vit and cfg.vision_layers == 12 and cfg.vision_width == 768
    # 14x14 grid + CLS = 197 positions — the length tiny arches never reach
    assert params["visual"]["positional_embedding"].shape[0] == 197
    return model, params, cfg


def _images(n, seed=11):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 224, 224, 3).astype(np.float32)


def test_vit_b16_vision_tower_per_block(vit_b16):
    """Per-block activations of the 12x768 vision tower at 197 tokens,
    golden-sourced from the reference's saved_features instrumentation
    (clip/model.py:340-366)."""
    import torch

    import jax.numpy as jnp

    from fsvlm_tpu.models.clip.model import patch_embed
    from fsvlm_tpu.ops.layers import layer_norm
    from fsvlm_tpu.models.clip.transformer import transformer

    model, params, cfg = vit_b16
    imgs = _images(2)
    with torch.no_grad():
        ref_feat = model.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    goldens = [
        f.permute(1, 0, 2).numpy() for f in model.visual.transformer.saved_features
    ]
    assert len(goldens) == 12 and goldens[0].shape == (2, 197, 768)

    v = params["visual"]
    x = patch_embed(jnp.asarray(imgs), v["patch_embed"])
    cls = jnp.broadcast_to(v["class_embedding"], (2, 1, 768))
    x = jnp.concatenate([cls, x], axis=1) + v["positional_embedding"]
    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])
    out, acts = transformer(
        v["blocks"], x, n_heads=cfg.vision_heads, collect_activations=True
    )
    acts = np.asarray(acts)
    for layer, golden in enumerate(goldens):
        np.testing.assert_allclose(
            acts[layer], golden, rtol=1e-3, atol=2e-3,
            err_msg=f"vision block {layer} diverged at full shape",
        )

    from fsvlm_tpu.models.clip import encode_image

    ours = np.asarray(encode_image(params, cfg, imgs))
    np.testing.assert_allclose(ours, ref_feat, rtol=1e-3, atol=2e-3)


def test_vit_b16_text_tower_per_block(vit_b16):
    """Per-block activations of the 12x512 text tower over 77 positions."""
    import torch

    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import encode_text_ids
    from fsvlm_tpu.models.clip.tokenizer import tokenize
    from fsvlm_tpu.models.clip.transformer import transformer
    from fsvlm_tpu.ops.attention import causal_mask

    model, params, cfg = vit_b16
    ids = tokenize(PROMPTS)
    with torch.no_grad():
        x = model.token_embedding(torch.from_numpy(ids).long())
        emb = x.numpy()
        x = (x + model.positional_embedding).permute(1, 0, 2)
        model.transformer(x)
    goldens = [
        f.permute(1, 0, 2).numpy() for f in model.transformer.saved_features
    ]
    assert len(goldens) == 12 and goldens[0].shape == (3, 77, 512)

    inp = jnp.asarray(emb) + params["text"]["positional_embedding"]
    _, acts = transformer(
        params["text"]["blocks"],
        inp,
        n_heads=cfg.transformer_heads,
        mask=causal_mask(77),
        collect_activations=True,
    )
    acts = np.asarray(acts)
    for layer, golden in enumerate(goldens):
        np.testing.assert_allclose(
            acts[layer], golden, rtol=1e-3, atol=2e-3,
            err_msg=f"text block {layer} diverged at full shape",
        )

    with torch.no_grad():
        ref_tx = model.encode_text(torch.from_numpy(ids).long()).numpy()
    ours_tx = np.asarray(encode_text_ids(params, cfg, ids))
    np.testing.assert_allclose(ours_tx, ref_tx, rtol=1e-3, atol=2e-3)


def test_vit_b16_logits(vit_b16):
    import torch

    from fsvlm_tpu.models.clip import clip_logits, encode_image, encode_text_ids
    from fsvlm_tpu.models.clip.tokenizer import tokenize

    model, params, cfg = vit_b16
    imgs = _images(2, seed=12)
    ids = tokenize(PROMPTS)
    with torch.no_grad():
        ref_logits, _ = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(ids).long(),
        )
    imf = encode_image(params, cfg, imgs)
    txf = encode_text_ids(params, cfg, ids)
    ours = np.asarray(clip_logits(imf, txf, params["logit_scale"]))
    np.testing.assert_allclose(ours, ref_logits.numpy(), rtol=1e-3, atol=5e-3)


def test_rn50_full_shape():
    """RN50 @ 224^2 with the real stage widths — exercises the 7x7
    attention pool (clip/model.py:56-92) and the stem/stage downsampling at
    the published geometry."""
    import torch

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip import clip_params_from_state_dict, encode_image

    torch.manual_seed(50)
    model = CLIP(
        embed_dim=1024,
        image_resolution=224,
        vision_layers=(3, 4, 6, 3),
        vision_width=64,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
        design_details=PLAIN_DESIGN,
    ).eval()
    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))
    assert not cfg.is_vit
    # attnpool operates on the 7x7 grid: 49+1 positions
    assert params["visual"]["attnpool"]["positional_embedding"].shape[0] == 50

    imgs = _images(2, seed=13)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(encode_image(params, cfg, imgs))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)

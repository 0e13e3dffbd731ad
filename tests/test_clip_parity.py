"""Random-weight golden parity: our JAX CLIP vs the reference torch CLIP.

No pretrained weights are available offline, so the reference implementation
itself (read-only at /root/reference) is instantiated with random weights and
used as the numerical oracle.  fp32 end-to-end; tolerances are tight.
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


def _tiny_torch_clip(design=PLAIN_DESIGN, seed=0, vision_layers=2):
    import torch

    import_reference_clip()
    from clip.model import CLIP

    torch.manual_seed(seed)
    # widths must be multiples of 64 so inferred head counts (width//64,
    # clip/model.py:678,684) match the constructor arguments
    model = CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=vision_layers,
        vision_width=128,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
        design_details=design,
    ).eval()
    return model


def _convert(model):
    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    sd = {k: v for k, v in model.state_dict().items()}
    return clip_params_from_state_dict(sd)


@pytest.fixture(scope="module")
def tiny():
    model = _tiny_torch_clip()
    params, cfg = _convert(model)
    return model, params, cfg


def test_encode_text_parity(tiny):
    import torch

    from fsvlm_tpu.models.clip import encode_text_ids
    from fsvlm_tpu.models.clip.tokenizer import tokenize

    model, params, cfg = tiny
    ids = tokenize(["a photo of a cat.", "a photo of a dog, a type of pet."])
    with torch.no_grad():
        ref = model.encode_text(torch.from_numpy(ids).long()).numpy()
    ours = np.asarray(encode_text_ids(params, cfg, ids))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_encode_image_parity(tiny):
    import torch

    from fsvlm_tpu.models.clip import encode_image

    model, params, cfg = tiny
    rng = np.random.RandomState(0)
    imgs = rng.randn(3, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(encode_image(params, cfg, imgs))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_full_logits_parity(tiny):
    import torch

    from fsvlm_tpu.models.clip import clip_logits, encode_image, encode_text_ids
    from fsvlm_tpu.models.clip.tokenizer import tokenize

    model, params, cfg = tiny
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    ids = tokenize(["a photo of a cat.", "a photo of a dog.", "a photo of a bird."])
    with torch.no_grad():
        ref_logits, _ = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)), torch.from_numpy(ids).long()
        )
    imf = encode_image(params, cfg, imgs)
    txf = encode_text_ids(params, cfg, ids)
    ours = np.asarray(clip_logits(imf, txf, params["logit_scale"]))
    np.testing.assert_allclose(ours, ref_logits.numpy(), rtol=2e-4, atol=1e-4)


def test_ivlp_deep_prompt_parity():
    """Deep prompt splicing must match the reference _IVLP blocks, including
    the fork's .half() rounding of prompt tokens (clip/model.py:229-256)."""
    import torch

    from fsvlm_tpu.models.clip import VisionPrompts, encode_image, encode_text_ids
    from fsvlm_tpu.models.clip.tokenizer import tokenize

    design = {
        "trainer": "IVLP",
        "vision_depth": 2,
        "language_depth": 2,
        "vision_ctx": 3,
        "language_ctx": 3,
    }
    model = _tiny_torch_clip(design=design, seed=3)
    params, cfg = _convert(model)

    # --- vision: VPT shallow (from VisionTransformer.VPT) + per-layer deep
    vpt_shallow = model.visual.VPT.detach().numpy()
    deep_v = np.zeros((cfg.vision_layers, 3, cfg.vision_width), np.float32)
    flags_v = np.zeros(cfg.vision_layers, bool)
    for i, blk in enumerate(model.visual.transformer.resblocks):
        if i > 0 and getattr(blk, "add_prompt", False):
            # reference casts prompts through fp16 before splicing
            deep_v[i] = blk.VPT_shallow.detach().half().float().numpy()
            flags_v[i] = True

    rng = np.random.RandomState(2)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_im = model.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    prompts = VisionPrompts(
        shallow=vpt_shallow.astype(np.float16).astype(np.float32),
        deep=deep_v,
        flags=flags_v,
    )
    ours_im = np.asarray(encode_image(params, cfg, imgs, prompts=prompts))
    np.testing.assert_allclose(ours_im, ref_im, rtol=2e-4, atol=2e-5)

    # --- text: per-layer deep prompts replace tokens [1:1+n_ctx)
    deep_t = np.zeros((cfg.transformer_layers, 3, cfg.transformer_width), np.float32)
    flags_t = np.zeros(cfg.transformer_layers, bool)
    for i, blk in enumerate(model.transformer.resblocks):
        if i > 0 and getattr(blk, "add_prompt", False):
            deep_t[i] = blk.VPT_shallow.detach().half().float().numpy()
            flags_t[i] = True

    ids = tokenize(["a photo of a cat.", "a photo of a dog."])
    with torch.no_grad():
        ref_tx = model.encode_text(torch.from_numpy(ids).long()).numpy()
    ours_tx = np.asarray(
        encode_text_ids(params, cfg, ids, deep_prompts=deep_t, splice_flags=flags_t)
    )
    np.testing.assert_allclose(ours_tx, ref_tx, rtol=2e-4, atol=2e-5)


def test_resnet_parity():
    import torch

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip import clip_params_from_state_dict, encode_image

    torch.manual_seed(7)
    model = CLIP(
        embed_dim=128,
        image_resolution=64,
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
        design_details=PLAIN_DESIGN,
    ).eval()
    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))
    assert not cfg.is_vit

    rng = np.random.RandomState(4)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(encode_image(params, cfg, imgs))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)

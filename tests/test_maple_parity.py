"""MaPLe block parity vs the reference _MaPLe transformer blocks.

The reference threads [x, compound_prompts, counter] through nn.Sequential
(clip/model.py:287-331, 454-485); our scan transformer must reproduce the
same token replacement schedule.
"""

import numpy as np
import pytest

from reference_oracle import import_reference_clip, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def test_maple_text_and_vision_parity():
    import torch

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip import (
        VisionPrompts,
        clip_params_from_state_dict,
        encode_image,
        encode_text_embeds,
    )
    from fsvlm_tpu.models.clip.tokenizer import tokenize

    design = {
        "trainer": "MaPLe",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
        "maple_length": 2,
    }
    torch.manual_seed(11)
    model = CLIP(64, 32, 3, 128, 16, 77, 49408, 128, 2, 3, design).eval()
    # fork quirk: Transformer.saved_features (clip/model.py:340-366) crashes
    # on MaPLe's list-valued inputs (x.clone() on a list) — the reference's
    # own MaPLe path only works with this instrumentation disabled
    model.transformer.init = False
    model.visual.transformer.init = False
    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))

    n_ctx = 2
    rng = np.random.RandomState(5)
    shared_ctx_text = rng.randn(n_ctx, 128).astype(np.float32) * 0.02
    compound_text = [rng.randn(n_ctx, 128).astype(np.float32) * 0.02]  # depth 2
    shared_ctx_vis = rng.randn(n_ctx, 128).astype(np.float32) * 0.02
    compound_vis = [rng.randn(n_ctx, 128).astype(np.float32) * 0.02]

    # ---- text side
    ids = tokenize(["a photo of a cat.", "a photo of a dog."])
    with torch.no_grad():
        emb = model.token_embedding(torch.from_numpy(ids).long())
        # splice shared ctx at positions 1..1+n_ctx (prompt-learner level)
        emb[:, 1 : 1 + n_ctx] = torch.from_numpy(shared_ctx_text)
        x = emb + model.positional_embedding
        x = x.permute(1, 0, 2)
        compound_t = [torch.from_numpy(c) for c in compound_text]
        out = model.transformer([x, compound_t, 0])[0].permute(1, 0, 2)
        out = model.ln_final(out)
        ref_tx = (
            out[torch.arange(out.shape[0]), torch.from_numpy(ids).long().argmax(-1)]
            @ model.text_projection
        ).numpy()

    prompts_np = np.asarray(emb.detach().numpy())
    deep_t = np.zeros((cfg.transformer_layers, n_ctx, 128), np.float32)
    flags_t = np.zeros(cfg.transformer_layers, bool)
    # reference casts through half before splicing
    deep_t[1] = compound_text[0].astype(np.float16).astype(np.float32)
    flags_t[1] = True
    ours_tx = np.asarray(
        encode_text_embeds(
            params,
            cfg,
            prompts_np,
            ids.argmax(-1),
            deep_prompts=deep_t,
            splice_flags=flags_t,
        )
    )
    np.testing.assert_allclose(ours_tx, ref_tx, rtol=2e-4, atol=2e-5)

    # ---- vision side
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        compound_v = [torch.from_numpy(c) for c in compound_vis]
        ref_im = model.visual(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(shared_ctx_vis),
            compound_v,
        ).numpy()

    deep_v = np.zeros((cfg.vision_layers, n_ctx, 128), np.float32)
    flags_v = np.zeros(cfg.vision_layers, bool)
    deep_v[1] = compound_vis[0].astype(np.float16).astype(np.float32)
    flags_v[1] = True
    ours_im = np.asarray(
        encode_image(
            params,
            cfg,
            imgs,
            prompts=VisionPrompts(
                shallow=shared_ctx_vis.astype(np.float16).astype(np.float32),
                deep=deep_v,
                flags=flags_v,
            ),
        )
    )
    np.testing.assert_allclose(ours_im, ref_im, rtol=2e-4, atol=2e-5)

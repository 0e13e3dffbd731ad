"""Replay the committed FULL-SHAPE golden pack — ZERO reference dependency.

tests/test_full_shape_goldens.py drives the torch reference live at the
published shapes and dies with the checkout; these tests replay the same
surfaces from committed artifacts (VERDICT r4 missing #2): weights and
inputs regenerate from seeds (golden_pack_common — the generator fed the
identical weights to the torch oracle via export_openai_state_dict), and
activations compare at the stored sub-sampled positions + moments.

Covered full-shape bug classes: 14x14 patch-grid ordering + 197-token
pos-emb (per-block, both towers), fp32 feature/logit agreement, RN50
stem/stage downsampling at the published geometry + the 7x7 attention pool
(reference clip/model.py:370-431, 56-150).
"""

import os

import numpy as np
import pytest

import golden_pack_common as C

PACK_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden_pack")


def _load(name):
    path = os.path.join(PACK_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not in the committed pack (regenerate with "
                    f"tools/make_golden_pack.py)")
    return dict(np.load(path, allow_pickle=False))


@pytest.fixture(scope="module")
def vit_pack():
    return _load("vit_full_shape.npz")


@pytest.fixture(scope="module")
def vit():
    import jax

    params, cfg = C.full_shape_vit_params()
    return jax.tree.map(np.asarray, params), cfg


def test_vit_b16_vision_blocks_full_shape(vit_pack, vit):
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import encode_image
    from fsvlm_tpu.models.clip.model import patch_embed
    from fsvlm_tpu.models.clip.transformer import transformer
    from fsvlm_tpu.ops.layers import layer_norm

    params, cfg = vit
    imgs = C.golden_images(2, C.IMAGES_SEED_VIT)

    v = params["visual"]
    x = patch_embed(jnp.asarray(imgs), v["patch_embed"])
    cls = jnp.broadcast_to(v["class_embedding"], (2, 1, 768))
    x = jnp.concatenate([cls, x], axis=1) + v["positional_embedding"]
    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])
    _, acts = transformer(
        v["blocks"], x, n_heads=cfg.vision_heads, collect_activations=True)
    acts = np.asarray(acts)
    assert acts.shape[0] == 12 and acts.shape[1:] == (2, 197, 768)
    for layer in range(12):
        C.check_subsampled(vit_pack, f"vis_block_{layer}", acts[layer])

    imf = np.asarray(encode_image(params, cfg, imgs))
    ref = vit_pack["image_features"]
    np.testing.assert_allclose(imf, ref, rtol=0,
                               atol=2e-3 * np.abs(ref).max())


def test_vit_b16_text_blocks_and_logits_full_shape(vit_pack, vit):
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import clip_logits, encode_text_ids
    from fsvlm_tpu.models.clip.tokenizer import tokenize
    from fsvlm_tpu.models.clip.transformer import transformer
    from fsvlm_tpu.ops.attention import causal_mask

    params, cfg = vit
    ids = tokenize(C.PROMPTS)
    np.testing.assert_array_equal(ids, vit_pack["ids"])

    t = params["text"]
    emb = t["token_embedding"][np.asarray(ids)]
    inp = jnp.asarray(emb) + t["positional_embedding"]
    _, acts = transformer(
        t["blocks"], inp, n_heads=cfg.transformer_heads,
        mask=causal_mask(77), collect_activations=True)
    acts = np.asarray(acts)
    assert acts.shape[0] == 12 and acts.shape[1:] == (3, 77, 512)
    for layer in range(12):
        C.check_subsampled(vit_pack, f"text_block_{layer}", acts[layer])

    txf = np.asarray(encode_text_ids(params, cfg, ids))
    ref_tx = vit_pack["text_features"]
    np.testing.assert_allclose(txf, ref_tx, rtol=0,
                               atol=2e-3 * np.abs(ref_tx).max())

    # logits on the OTHER image seed would drift the comparison — the
    # generator used the same images as the vision test
    from fsvlm_tpu.models.clip import encode_image

    imgs = C.golden_images(2, C.IMAGES_SEED_VIT)
    imf = encode_image(params, cfg, imgs)
    logits = np.asarray(clip_logits(imf, jnp.asarray(txf),
                                    params["logit_scale"]))
    ref_logits = vit_pack["logits_per_image"]
    np.testing.assert_allclose(
        logits, ref_logits, rtol=0, atol=5e-3 * np.abs(ref_logits).max())
    assert (logits.argmax(1) == ref_logits.argmax(1)).all()


def test_rn50_full_shape_stages_and_pool():
    pack = _load("rn50_full_shape.npz")
    import jax

    from fsvlm_tpu.models.clip.resnet import encode_image_resnet

    params, cfg = C.full_shape_rn50_params()
    params = jax.tree.map(np.asarray, params)
    imgs = C.golden_images(2, C.IMAGES_SEED_RN)
    feat, stages = encode_image_resnet(
        params, cfg, np.asarray(imgs), collect_stages=True)
    assert np.asarray(stages[3]).shape == (2, 7, 7, 2048)
    for i, stage in enumerate(stages, start=1):
        C.check_subsampled(pack, f"stage{i}", np.asarray(stage),
                           rtol=2e-3)
    ref = pack["image_features"]
    np.testing.assert_allclose(np.asarray(feat), ref, rtol=0,
                               atol=5e-3 * np.abs(ref).max())

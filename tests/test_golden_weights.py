"""Golden-weights replay (SURVEY §7.3 north star, VERDICT r1 item 4).

Three layers of coverage:

1. ``test_harness_roundtrip_tiny`` ALWAYS runs: it saves a random reference
   CLIP in the OpenAI checkpoint format, builds goldens through
   tools/make_goldens.py's torch-oracle path, and replays them through
   fsvlm_tpu — proving the whole harness (checkpoint load, converter,
   tokenizer ids, both towers, logits) works end to end today.
2. ``test_real_weights_replay`` runs the moment real OpenAI checkpoints
   appear on disk (find_clip_weights search order) — skipped until then.
3. ``test_saved_goldens_replay`` replays a pre-built $FSVLM_GOLDENS .npz
   (e.g. produced on a machine that has the weights).
"""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from reference_oracle import reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

BACKBONES = ["ViT-B/16", "ViT-B/32", "RN50", "RN101"]


def replay(goldens, atol_feat, prob_budget=0.003):
    """Run fsvlm_tpu on the golden inputs and compare every surface."""
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import encode_image, encode_text_ids
    from fsvlm_tpu.models.clip.convert import load_openai_checkpoint
    from fsvlm_tpu.models.clip.tokenizer import tokenize
    from make_goldens import CLASSNAMES

    params, cfg = load_openai_checkpoint(str(goldens["weights_path"]))

    # tokenizer ids byte-identical
    ids = tokenize([f"a photo of a {c}." for c in CLASSNAMES])
    np.testing.assert_array_equal(ids, goldens["ids"])

    images = jnp.asarray(goldens["images"])
    imf = np.asarray(encode_image(params, cfg, images))
    txf = np.asarray(encode_text_ids(params, cfg, jnp.asarray(ids)))

    ref_imf = np.asarray(goldens["image_features"])
    ref_txf = np.asarray(goldens["text_features"])
    scale_feat_i = np.abs(ref_imf).max()
    scale_feat_t = np.abs(ref_txf).max()
    np.testing.assert_allclose(imf, ref_imf, rtol=0, atol=atol_feat * scale_feat_i)
    np.testing.assert_allclose(txf, ref_txf, rtol=0, atol=atol_feat * scale_feat_t)

    # logits: the ±0.3% accuracy budget means per-class softmax probabilities
    # must agree within 0.003 and the prediction must not flip
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    logits = float(goldens["logit_scale"]) * norm(imf) @ norm(txf).T
    ref_logits = np.asarray(goldens["logits_per_image"])
    assert (logits.argmax(1) == ref_logits.argmax(1)).all()

    def softmax(z):
        z = z - z.max(-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(-1, keepdims=True)

    prob_diff = np.abs(softmax(logits) - softmax(ref_logits)).max()
    assert prob_diff < prob_budget, f"softmax drift {prob_diff} > {prob_budget}"


def test_harness_roundtrip_tiny(tmp_path):
    import torch

    from reference_oracle import import_reference_clip

    import_reference_clip()
    from clip.model import CLIP

    from make_goldens import PLAIN_DESIGN, build_goldens

    torch.manual_seed(7)
    model = CLIP(64, 32, 4, 128, 16, 77, 49408, 128, 2, 4, PLAIN_DESIGN).float()
    path = str(tmp_path / "tiny_clip.pt")
    torch.save(model.state_dict(), path)

    goldens = build_goldens("tiny", n_images=4, weights_path=path)
    assert goldens is not None
    # per-block activations captured for both towers
    assert "text_block_3" in goldens and "vis_block_3" in goldens
    # tiny random towers produce larger relative spread; the tolerance is
    # still far below anything that could flip a prediction
    replay(goldens, atol_feat=2e-4, prob_budget=0.003)


@pytest.mark.parametrize("backbone", BACKBONES)
def test_real_weights_replay(backbone):
    from fsvlm_tpu.trainers.backbone import find_clip_weights
    from make_goldens import build_goldens

    if find_clip_weights(backbone) is None:
        pytest.skip(f"no {backbone} checkpoint on disk")
    goldens = build_goldens(backbone, n_images=8)
    replay(goldens, atol_feat=2e-4)


def test_saved_goldens_replay():
    path = os.environ.get("FSVLM_GOLDENS")
    if not path or not os.path.isfile(path):
        pytest.skip("FSVLM_GOLDENS not set")
    goldens = dict(np.load(path, allow_pickle=False))
    replay(goldens, atol_feat=2e-4)


def test_cached_teacher_accuracy_ab(tmp_path):
    """Accuracy gate for the CACHED_TEACHER bench headline (VERDICT r3
    missing #4): the headline config feeds the frozen teacher the CLEAN
    cached image instead of the per-step augmented view the reference uses
    (PromptSRC/trainers/promptsrc.py:198-201).  The day real weights + a
    real dataset are on disk, train PromptSRC twice (same seed, same
    few-shot split) and assert the final top-1 delta is inside the ±0.3%
    parity budget.  Skipped until weights/data exist, like the replays."""
    from fsvlm_tpu.trainers.backbone import find_clip_weights

    if find_clip_weights("ViT-B/16") is None:
        pytest.skip("no ViT-B/16 checkpoint on disk")
    root = os.environ.get("FSVLM_AB_DATA_ROOT") or os.environ.get("DATA")
    if not root or not os.path.isdir(os.path.join(root, "caltech-101")):
        pytest.skip("no caltech-101 dataset root (set FSVLM_AB_DATA_ROOT)")

    from fsvlm_tpu.config import get_cfg_default
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    def run(cached):
        cfg = get_cfg_default()
        cfg.merge_from_file(os.path.join(
            ROOT, "configs", "datasets", "caltech101.yaml"))
        cfg.merge_from_file(os.path.join(
            ROOT, "configs", "trainers", "PromptSRC",
            "vit_b16_c2_ep20_batch4_4+4ctx.yaml"))
        cfg.TRAINER.NAME = "PromptSRC"
        cfg.DATASET.ROOT = root
        cfg.DATASET.NUM_SHOTS = 16
        cfg.SEED = 1
        cfg.TRAINER.PROMPTSRC.CACHED_TEACHER = bool(cached)
        cfg.OUTPUT_DIR = str(tmp_path / ("cached" if cached else "default"))
        cfg.TEST.NO_TEST = True
        cfg.freeze()
        t = build_trainer(cfg)
        t.train()
        return t.test()

    acc_default = run(False)
    acc_cached = run(True)
    assert abs(acc_default - acc_cached) <= 0.3, (acc_default, acc_cached)


@pytest.mark.parametrize("backbone", ["ViT-B/16", "ViT-B/32"])
def test_real_weights_int8_serving_agreement(backbone):
    """Int8 serving accuracy gate (MODEL.QUANT_INT8): the day real OpenAI
    weights appear, measure int8-vs-fp32 top-1 agreement and feature cosine
    on the golden images.  Skipped until weights exist (like the replay)."""
    from fsvlm_tpu.trainers.backbone import find_clip_weights
    from make_goldens import build_goldens

    if find_clip_weights(backbone) is None:
        pytest.skip(f"no {backbone} checkpoint on disk")
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import encode_image
    from fsvlm_tpu.models.clip.convert import load_openai_checkpoint
    from fsvlm_tpu.ops.quant import quantize_clip_params

    goldens = build_goldens(backbone, n_images=8)
    params, cfg = load_openai_checkpoint(str(goldens["weights_path"]))
    qparams = quantize_clip_params(params, towers=("visual",))

    images = jnp.asarray(goldens["images"])
    f_fp = np.asarray(encode_image(params, cfg, images))
    f_q = np.asarray(encode_image(qparams, cfg, images))

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    cos = (norm(f_fp) * norm(f_q)).sum(-1)
    assert cos.min() > 0.995, cos

    txf = norm(np.asarray(goldens["text_features"]))
    top1_fp = (norm(f_fp) @ txf.T).argmax(1)
    top1_q = (norm(f_q) @ txf.T).argmax(1)
    assert (top1_fp == top1_q).mean() >= 7 / 8

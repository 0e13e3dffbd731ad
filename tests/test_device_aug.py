"""Device-side fused augmentation pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvlm_tpu.ops.preprocess import (
    normalize_only,
    random_resized_crop_flip_normalize,
)
from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def test_rrc_shapes_and_stats():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    out = random_resized_crop_flip_normalize(
        jnp.asarray(imgs), jax.random.PRNGKey(0), out_size=32
    )
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    # normalized range sanity: CLIP mean/std maps [0,1] into roughly [-2, 2]
    assert float(jnp.abs(out).max()) < 3.0
    # different keys -> different crops
    out2 = random_resized_crop_flip_normalize(
        jnp.asarray(imgs), jax.random.PRNGKey(1), out_size=32
    )
    assert float(jnp.abs(out - out2).max()) > 1e-3


def test_full_scale_crop_matches_plain_resize():
    """With scale=(1,1) and square input the crop is the identity resize,
    so the result must equal normalize_only up to flip."""
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    out = random_resized_crop_flip_normalize(
        jnp.asarray(imgs), jax.random.PRNGKey(3), out_size=32, scale=(1.0, 1.0)
    )
    ref = normalize_only(jnp.asarray(imgs))
    ref_flipped = ref[:, :, ::-1, :]
    for b in range(2):
        d_plain = float(jnp.abs(out[b] - ref[b]).max())
        d_flip = float(jnp.abs(out[b] - ref_flipped[b]).max())
        assert min(d_plain, d_flip) < 1e-4, (d_plain, d_flip)


def test_device_aug_end_to_end(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "DATALOADER.DEVICE_AUG": True,
            "DATALOADER.PRE_SIZE": 48,
            "OPTIM.MAX_EPOCH": 8,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    batch = next(iter(t.train_loader_x))
    assert batch["img"].dtype == np.uint8
    assert batch["img"].shape == (16, 48, 48, 3)
    acc = t.train()
    assert acc > 25.0, f"device-aug CoOp failed to learn: {acc}"

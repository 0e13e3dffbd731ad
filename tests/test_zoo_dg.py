"""DG zoo trainer family end-to-end on the synthetic DG fixture (sources
only, no target domain).

Covers Vanilla, CrossGrad, DDAIG, DomainMix, DAELDG
(Dassl.pytorch/dassl/engine/dg/*.py semantics).
"""

import numpy as np
import pytest

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401  (registers zoo)


def dg_cfg(tmp_path, **overrides):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.DATASET.NAME = "SyntheticDA"
    cfg.DATASET.SOURCE_DOMAINS = ["d0", "d1"]
    cfg.DATASET.TARGET_DOMAINS = []
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_flip", "normalize"]
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.03
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.TEST.NO_TEST = False
    cfg.TEST.FINAL_MODEL = "last_step"
    cfg.TRAIN.PRINT_FREQ = 5
    for k, v in overrides.items():
        node = cfg
        keys = k.split(".")
        for sub in keys[:-1]:
            node = node[sub]
        node[keys[-1]] = v
    return cfg


def test_vanilla_learns(tmp_path):
    cfg = dg_cfg(tmp_path, **{"TRAINER.NAME": "Vanilla",
                              "OPTIM.MAX_EPOCH": 12, "OPTIM.LR": 0.02})
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert acc > 40.0, f"Vanilla failed to learn: {acc}"


def test_crossgrad_perturbs(tmp_path):
    cfg = dg_cfg(tmp_path, **{"TRAINER.NAME": "CrossGrad"})
    cfg.freeze()
    t = build_trainer(cfg)
    assert set(t.params) == {"F", "D"}
    acc = t.train()
    assert np.isfinite(acc)


def test_ddaig_generator(tmp_path):
    cfg = dg_cfg(tmp_path, **{"TRAINER.NAME": "DDAIG",
                              "TRAINER.DDAIG.G_ARCH": "fcn_3x32_gctx",
                              "TRAINER.DDAIG.CLAMP": True})
    cfg.freeze()
    t = build_trainer(cfg)
    assert set(t.params) == {"F", "D", "G"}
    g_before = np.asarray(t.params["G"]["regress"]["w"])
    acc = t.train()
    assert not np.allclose(np.asarray(t.params["G"]["regress"]["w"]), g_before)
    assert np.isfinite(acc)


@pytest.mark.parametrize("mix", ["crossdomain", "random"])
def test_domainmix(tmp_path, mix):
    cfg = dg_cfg(tmp_path, **{"TRAINER.NAME": "DomainMix",
                              "TRAINER.DOMAINMIX.TYPE": mix})
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert np.isfinite(acc)


def test_daeldg_experts(tmp_path):
    cfg = dg_cfg(tmp_path, **{
        "TRAINER.NAME": "DAELDG",
        "DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
        "TRAINER.DAELDG.STRONG_TRANSFORMS": ("random_flip", "cutout", "normalize"),
    })
    cfg.freeze()
    t = build_trainer(cfg)
    assert t.params["E"]["w"].shape[0] == 2
    acc = t.train()
    assert np.isfinite(acc)


def test_fcn_generator_shapes():
    from fsvlm_tpu.models.networks import build_network

    g = build_network("fcn_3x64_gctx", seed=3)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    x_p, p = g.apply(g.params, x, lmda=0.3, return_p=True)
    assert x_p.shape == x.shape and p.shape == x.shape
    assert float(np.abs(np.asarray(p)).max()) <= 1.0
    np.testing.assert_allclose(np.asarray(x_p), x + 0.3 * np.asarray(p),
                               rtol=1e-5, atol=1e-5)


def test_fcn_stn_generator():
    import jax.numpy as jnp

    from fsvlm_tpu.models.networks import build_network

    g = build_network("fcn_3x32_gctx_stn", image_size=32, seed=3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), np.float32)
    x_p, p = g.apply(g.params, x, lmda=0.3, return_p=True)
    assert x_p.shape == x.shape and p.shape == x.shape
    # the reference "identity" init still passes through tanh
    # (ddaig_fcn.py:152-161), so the initial warp is a tanh(1)=0.76x zoom —
    # reproduce it directly and check the warp path end-to-end
    import jax.numpy as jnp2

    from fsvlm_tpu.models.networks import _affine_grid_sample

    theta = jnp2.tile(jnp2.asarray(
        [[np.tanh(1.0), 0.0, 0.0], [0.0, np.tanh(1.0), 0.0]],
        jnp2.float32)[None], (2, 1, 1))
    warped = _affine_grid_sample(x, theta)
    base = np.asarray(x_p) - 0.3 * np.asarray(p)
    np.testing.assert_allclose(base, np.asarray(warped), atol=1e-4)
    assert not np.allclose(np.asarray(warped), np.asarray(x))

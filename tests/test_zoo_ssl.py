"""SSL zoo trainer family end-to-end on the synthetic SSL fixture.

Covers SupBaseline, EntMin, MeanTeacher, MixMatch, FixMatch
(Dassl.pytorch/dassl/engine/ssl/*.py semantics) — each runs a couple of
epochs on CPU with the small digit CNN and must produce finite losses,
a working eval path, and (for the supervised baseline) learn the
color-separable synthetic classes.
"""

import numpy as np
import pytest

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401  (registers zoo)


def zoo_cfg(tmp_path, **overrides):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.DATASET.NAME = "SyntheticSSL"
    cfg.DATASET.NUM_LABELED = 8
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_flip", "normalize"]
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TRAIN_U.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.03
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.TEST.NO_TEST = False
    cfg.TEST.FINAL_MODEL = "last_step"
    cfg.TRAIN.PRINT_FREQ = 5
    cfg.TRAIN.COUNT_ITER = "train_u"
    for k, v in overrides.items():
        node = cfg
        keys = k.split(".")
        for sub in keys[:-1]:
            node = node[sub]
        node[keys[-1]] = v
    return cfg


def test_sup_baseline_learns(tmp_path):
    cfg = zoo_cfg(
        tmp_path,
        **{"TRAINER.NAME": "SupBaseline", "OPTIM.MAX_EPOCH": 15, "OPTIM.LR": 0.05},
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert acc > 40.0, f"SupBaseline failed to learn: {acc}"


def test_entmin_runs(tmp_path):
    cfg = zoo_cfg(tmp_path, **{"TRAINER.NAME": "EntMin"})
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert np.isfinite(acc)


def test_mean_teacher_updates_ema(tmp_path):
    cfg = zoo_cfg(tmp_path, **{"TRAINER.NAME": "MeanTeacher"})
    cfg.freeze()
    t = build_trainer(cfg)
    before = {k: np.asarray(v) for k, v in
              jax_flat(t.extra["teacher"]).items()}
    acc = t.train()
    after = jax_flat(t.extra["teacher"])
    moved = any(not np.allclose(before[k], np.asarray(v))
                for k, v in after.items())
    assert moved, "EMA teacher never moved"
    assert np.isfinite(acc)


def jax_flat(tree):
    import jax

    return {
        "/".join(str(p) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_mixmatch_runs(tmp_path):
    cfg = zoo_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "MixMatch",
            "DATALOADER.K_TRANSFORMS": 2,
            "TRAINER.MIXMATCH.RAMPUP": 10,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert np.isfinite(acc)


def test_fixmatch_runs_and_masks(tmp_path):
    cfg = zoo_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "FixMatch",
            "TRAINER.FIXMATCH.STRONG_TRANSFORMS": (
                "random_flip", "cutout", "normalize"),
            "TRAINER.FIXMATCH.CONF_THRE": 0.5,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    # weak and strong views must genuinely differ
    batch = next(iter(t.train_loader_x))
    assert not np.allclose(batch["img"], batch["img2"])
    acc = t.train()
    assert np.isfinite(acc)


def test_ssl_checkpoint_roundtrip(tmp_path):
    """Zoo extra state (BN stats + EMA teacher) must survive save/resume."""
    cfg = zoo_cfg(tmp_path, **{"TRAINER.NAME": "MeanTeacher",
                               "OPTIM.MAX_EPOCH": 2})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    t2 = build_trainer(cfg)
    start = t2.resume_model_if_exist(cfg.OUTPUT_DIR)
    assert start == 2
    a = jax_flat(t.extra["teacher"])
    b = jax_flat(t2.extra["teacher"])
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6)

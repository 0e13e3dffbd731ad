"""DA zoo trainer family end-to-end on the synthetic DA fixture.

Covers SourceOnly, DANN, ADDA, AdaBN, MCD, MME, SE, M3SDA, CDAC, DAEL
(Dassl.pytorch/dassl/engine/da/*.py semantics).
"""

import numpy as np
import pytest

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401  (registers zoo)


def da_cfg(tmp_path, **overrides):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.DATASET.NAME = "SyntheticDA"
    cfg.DATASET.SOURCE_DOMAINS = ["d0", "d1"]
    cfg.DATASET.TARGET_DOMAINS = ["d2"]
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_flip", "normalize"]
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TRAIN_U.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.03
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 0
    cfg.TEST.NO_TEST = False
    cfg.TEST.FINAL_MODEL = "last_step"
    cfg.TRAIN.PRINT_FREQ = 5
    cfg.TRAIN.COUNT_ITER = "smaller_one"
    for k, v in overrides.items():
        node = cfg
        keys = k.split(".")
        for sub in keys[:-1]:
            node = node[sub]
        node[keys[-1]] = v
    return cfg


@pytest.mark.parametrize("name", ["SourceOnly", "DANN", "MME"])
def test_da_single_pass_trainers(tmp_path, name):
    cfg = da_cfg(tmp_path, **{"TRAINER.NAME": name})
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert np.isfinite(acc)


def test_source_only_learns(tmp_path):
    cfg = da_cfg(tmp_path, **{"TRAINER.NAME": "SourceOnly",
                              "OPTIM.MAX_EPOCH": 12, "OPTIM.LR": 0.05})
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert acc > 40.0, f"SourceOnly failed to learn: {acc}"


def test_mcd_three_phase(tmp_path):
    cfg = da_cfg(tmp_path, **{"TRAINER.NAME": "MCD",
                              "TRAINER.MCD.N_STEP_F": 2})
    cfg.freeze()
    t = build_trainer(cfg)
    assert set(t.params) == {"F", "C1", "C2"}
    acc = t.train()
    assert np.isfinite(acc)


def test_se_k_transforms(tmp_path):
    cfg = da_cfg(tmp_path, **{"TRAINER.NAME": "SE",
                              "DATALOADER.K_TRANSFORMS": 2})
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert np.isfinite(acc)


def _source_ckpt(tmp_path):
    """Train SourceOnly briefly and return its checkpoint file."""
    import glob

    cfg = da_cfg(tmp_path, **{"TRAINER.NAME": "SourceOnly",
                              "OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    files = glob.glob(str(tmp_path / "out" / "model" / "model.pkl-*"))
    assert files
    return files[0]


def test_adda_trains_from_source(tmp_path):
    ckpt = _source_ckpt(tmp_path)
    cfg = da_cfg(tmp_path / "adda", **{"TRAINER.NAME": "ADDA",
                                       "MODEL.INIT_WEIGHTS": ckpt})
    cfg.freeze()
    t = build_trainer(cfg)
    clf_before = np.asarray(t.params["net"]["classifier"]["w"])
    acc = t.train()
    # the classifier must stay frozen at its source weights
    np.testing.assert_allclose(
        np.asarray(t.params["net"]["classifier"]["w"]), clf_before)
    assert np.isfinite(acc)


def test_adabn_updates_stats_only(tmp_path):
    ckpt = _source_ckpt(tmp_path)
    cfg = da_cfg(tmp_path / "adabn", **{"TRAINER.NAME": "AdaBN",
                                        "MODEL.INIT_WEIGHTS": ckpt,
                                        "MODEL.BACKBONE.NAME": "cnn_digit5_m3sda",
                                        "OPTIM.MAX_EPOCH": 1})
    cfg.freeze()
    t = build_trainer(cfg)
    params_before = {k: np.asarray(v) for k, v in
                     np.ndenumerate(np.empty(0))}  # placeholder
    import jax

    flat_before = jax.tree.map(np.asarray, t.params)
    state_before = jax.tree.map(np.asarray, t.model_state)
    acc = t.train()
    flat_after = jax.tree.map(np.asarray, t.params)
    # params unchanged
    for a, b in zip(jax.tree.leaves(flat_before), jax.tree.leaves(flat_after)):
        np.testing.assert_array_equal(a, b)
    # BN stats moved
    sb = jax.tree.leaves(state_before)
    sa = jax.tree.leaves(jax.tree.map(np.asarray, t.model_state))
    assert any(not np.allclose(a, b) for a, b in zip(sb, sa))
    assert np.isfinite(acc)


def test_m3sda_domain_bank(tmp_path):
    cfg = da_cfg(tmp_path, **{"TRAINER.NAME": "M3SDA",
                              "DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
                              "DATALOADER.TRAIN_U.SAME_AS_X": False,
                              "TRAINER.M3SDA.N_STEP_F": 2})
    cfg.freeze()
    t = build_trainer(cfg)
    assert t.params["C"]["c1"]["w"].shape[0] == 2  # one pair per source
    acc = t.train()
    assert np.isfinite(acc)


def test_dael_experts(tmp_path):
    cfg = da_cfg(tmp_path, **{
        "TRAINER.NAME": "DAEL",
        "DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
        "DATALOADER.TRAIN_U.SAME_AS_X": False,
        "TRAINER.DAEL.STRONG_TRANSFORMS": ("random_flip", "cutout", "normalize"),
    })
    cfg.freeze()
    t = build_trainer(cfg)
    assert t.params["E"]["w"].shape[0] == 2
    acc = t.train()
    assert np.isfinite(acc)


def test_cdac_custom_schedule(tmp_path):
    cfg = da_cfg(tmp_path, **{
        "TRAINER.NAME": "CDAC",
        "DATALOADER.K_TRANSFORMS": 2,
        "TRAINER.CDAC.STRONG_TRANSFORMS": ("random_flip", "cutout", "normalize"),
        "TRAINER.CDAC.P_THRESH": 0.5,
    })
    cfg.freeze()
    t = build_trainer(cfg)
    # custom annealing: lr decays within epoch 0
    lr0 = t.lr_schedule(0)
    lr_mid = t.lr_schedule(t.steps_per_epoch * cfg.OPTIM.MAX_EPOCH // 2)
    assert float(lr_mid) < float(lr0)
    acc = t.train()
    assert np.isfinite(acc)

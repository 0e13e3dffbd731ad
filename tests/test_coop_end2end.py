"""End-to-end CoOp training on the synthetic dataset with a tiny random CLIP.

This is the framework's first train-to-accuracy milestone (SURVEY.md §7.2
step 5): with separable synthetic classes and a learnable ctx, accuracy on
the train distribution must rise well above chance within a few epochs.
"""

import numpy as np
import pytest

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401


def make_cfg(tmp_path, **overrides):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 16
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_resized_crop", "random_flip", "normalize"]
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.MODEL.BACKBONE.NAME = "test-tiny"
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 4
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 16
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 3.0  # random tiny towers need a hot lr to move logits
    cfg.OPTIM.MAX_EPOCH = 40
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 0.5
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


def test_coop_trains_above_chance(tmp_path):
    cfg = make_cfg(tmp_path)
    cfg.freeze()
    trainer = build_trainer(cfg)
    acc = trainer.train()
    # 8 classes -> chance is 12.5%; separable colors must be fit well
    assert acc > 40.0, f"CoOp failed to learn: acc={acc}"

    # checkpoint round-trip: a fresh trainer loads and reproduces eval
    trainer2 = build_trainer(cfg)
    trainer2.load_model(cfg.OUTPUT_DIR, epoch=cfg.OPTIM.MAX_EPOCH)
    acc2 = trainer2.test()
    assert abs(acc2 - trainer.test()) < 1e-6


def test_coop_focal_per_class_shots(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "DATASET.NUM_SHOTS": -1,
            "DATASET.PER_CLASS_SHOTS": [16, 16, 16, 16, 2, 2, 2, 2],
            "TRAINER.COOP.LOSS_TYPE": "focal",
            "OPTIM.MAX_EPOCH": 4,
        },
    )
    cfg.freeze()
    trainer = build_trainer(cfg)
    assert trainer.loss_type == "focal"
    assert trainer.frozen["alpha"] is not None
    # alpha must be inverse-frequency: rarer classes get larger weight
    alpha = np.asarray(trainer.frozen["alpha"])
    assert alpha[4] > alpha[0]
    trainer.train()  # must run without error


def test_coop_csc_and_positions(tmp_path):
    for pos in ["middle", "front"]:
        cfg = make_cfg(
            tmp_path,
            **{
                "TRAINER.COOP.CSC": True,
                "TRAINER.COOP.CLASS_TOKEN_POSITION": pos,
                "OPTIM.MAX_EPOCH": 1,
                "TEST.NO_TEST": True,
            },
        )
        cfg.freeze()
        trainer = build_trainer(cfg)
        assert trainer.params["ctx"].ndim == 3  # class-specific ctx
        trainer.train()

"""RN-tower end-to-end: zero-shot + linear probe on the synthetic dataset
with random ModifiedResNet weights (the RN50-shaped test-tiny-rn arch)."""

import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def test_zeroshot_rn_runs(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "ZeroshotCLIP",
            "MODEL.BACKBONE.NAME": "test-tiny-rn",
            "INPUT.SIZE": (64, 64),
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.test()
    assert 0.0 <= acc <= 100.0


def test_linear_probe_rn_learns(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "LinearProbeCLIP",
            "MODEL.BACKBONE.NAME": "test-tiny-rn",
            "INPUT.SIZE": (64, 64),
            "OPTIM.NAME": "adam",
            "OPTIM.LR": 0.01,
            "OPTIM.MAX_EPOCH": 30,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    # random RN features of color-separable classes are an easy probe target
    assert acc > 40.0, acc

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


def test_coop_trains_on_rn_tower(tmp_path):
    """Train a prompt learner over the RN image tower — the ORIGINAL CoOp
    headline configuration is RN50 (reference configs/trainers/CoOp/
    rn50_ep50.yaml); encode_image routes to the ModifiedResNet
    (models/clip/model.py:151-159) and the ctx gradient flows through the
    text tower only, so learning must still clear chance."""
    cfg = make_cfg(
        tmp_path,
        **{
            "MODEL.BACKBONE.NAME": "test-tiny-rn",
            "INPUT.SIZE": (64, 64),
            "OPTIM.MAX_EPOCH": 40,
            # class-specific contexts: with RANDOM towers the unified-ctx
            # signal through random class-name embeddings is too weak to
            # clear 2x chance (plateaus at 25% across a wide lr sweep); CSC
            # is the reference's own capacity knob (rn50_csc configs) and
            # demonstrates the same RN-tower training path
            "TRAINER.COOP.CSC": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    assert acc > 40.0, f"CoOp-on-RN failed to learn: acc={acc}"


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

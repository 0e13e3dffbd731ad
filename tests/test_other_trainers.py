"""End-to-end coverage for CoCoOp, MaPLe, PLIP, LinearProbeCLIP, ZeroshotCLIP."""

import jax
import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def test_cocoop_learns(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "CoCoOp",
            "TRAINER.COCOOP.N_CTX": 4,
            "TRAINER.COCOOP.CTX_INIT": "a photo of a",
            "TRAINER.COCOOP.PREC": "fp32",
            "OPTIM.MAX_EPOCH": 15,
            "OPTIM.LR": 0.5,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    assert set(t.params) == {"ctx", "meta_net"}
    acc = t.train()
    assert acc > 25.0, f"CoCoOp failed to learn: {acc}"


def test_maple_learns(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "MaPLe",
            "TRAINER.MAPLE.N_CTX": 2,
            "TRAINER.MAPLE.PROMPT_DEPTH": 2,
            "TRAINER.MAPLE.PREC": "fp32",
            "OPTIM.MAX_EPOCH": 15,
            "OPTIM.LR": 1.0,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    assert {"ctx", "proj", "compound_text", "compound_proj"} <= set(t.params)
    acc = t.train()
    assert acc > 25.0, f"MaPLe failed to learn: {acc}"


@pytest.mark.parametrize("reg", ["grad", "svd", "spectral_norm"])
def test_plip_reg_modes(tmp_path, reg):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "PLIP",
            "TRAINER.PLIP.REG_TYPE": reg,
            "TRAINER.PLIP.PREC": "fp32",
            "TRAINER.PLIP.REG_COEFF": 0.01,
            "OPTIM.MAX_EPOCH": 2,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    if reg == "svd":
        assert set(t.params) == {"S"}
    else:
        assert set(t.params) == {"ctx"}
    t.train()


def test_linear_probe_learns(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "LinearProbeCLIP",
            "TRAINER.LINEAR_PROBE.LOSS_TYPE": "focal",
            "DATASET.NUM_SHOTS": -1,
            "DATASET.PER_CLASS_SHOTS": [16, 16, 16, 16, 4, 4, 4, 4],
            "OPTIM.MAX_EPOCH": 20,
            "OPTIM.LR": 0.05,
            "OPTIM.NAME": "adam",
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.train()
    # probs sum to 1 (softmax inference)
    batch = next(iter(t.test_loader))
    probs = np.asarray(t.model_inference(t.parse_batch_test(batch)["img"]))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    assert acc > 40.0, f"LinearProbe failed to learn: {acc}"


def test_zeroshot_clip_runs(tmp_path):
    for trainer in ["ZeroshotCLIP", "ZeroshotCLIP2"]:
        cfg = make_cfg(
            tmp_path, **{"TRAINER.NAME": trainer, "TEST.NO_TEST": True}
        )
        cfg.freeze()
        t = build_trainer(cfg)
        acc = t.test()
        assert 0.0 <= acc <= 100.0

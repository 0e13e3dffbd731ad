"""Full-run determinism: identical cfg + seed => bit-identical final params,
including the host augmentation stream and the device-aug pipeline."""

import jax
import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def _final_params(tmp_path, **overrides):
    cfg = make_cfg(tmp_path, **overrides)
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    return jax.tree.map(lambda x: np.asarray(x), t.params)


@pytest.mark.parametrize("device_aug", [False, True])
def test_two_runs_bit_identical(tmp_path, device_aug):
    common = {
        "OPTIM.MAX_EPOCH": 3,
        "TEST.NO_TEST": True,
        "DATALOADER.DEVICE_AUG": device_aug,
        "DATALOADER.PRE_SIZE": 48,
    }
    p1 = _final_params(tmp_path / "a", **common)
    p2 = _final_params(tmp_path / "b", **common)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "trainer_overrides",
    [
        {
            "TRAINER.NAME": "IVLP",
            "TRAINER.IVLP.PREC": "fp32",
            "TRAINER.IVLP.USE_KD": False,
            "TRAINER.IVLP.USE_MIXUP": False,
        },
        # CoCoOp differentiates B*n_cls text forwards in one graph — the
        # path where REMAT is load-bearing for HBM (trainers/cocoop.py)
        {"TRAINER.NAME": "CoCoOp", "TRAINER.COCOOP.PREC": "fp32"},
    ],
    ids=["ivlp", "cocoop"],
)
def test_remat_matches_no_remat(tmp_path, trainer_overrides):
    """TRAIN.REMAT must not change results, only memory/time."""
    base = {
        **trainer_overrides,
        "OPTIM.MAX_EPOCH": 2,
        "TEST.NO_TEST": True,
    }
    p1 = _final_params(tmp_path / "a", **base)
    p2 = _final_params(tmp_path / "b", **{**base, "TRAIN.REMAT": True})
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        # recomputation reorders float reductions; drift accumulates over steps
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)

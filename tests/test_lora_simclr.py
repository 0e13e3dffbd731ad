"""LoRA trainer + SimCLR two-view loader tests."""

import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def lora_cfg(tmp_path, **overrides):
    base = {
        "TRAINER.NAME": "LoRA",
        "TRAINER.LORA.PREC": "fp32",
        "TRAINER.LORA.ENCODER": "both",
        "TRAINER.LORA.POSITION": "all",
        "TRAINER.LORA.PARAMS": ["q", "k", "v"],
        "TRAINER.LORA.R": 4,
        "TRAINER.LORA.ALPHA": 1,
        "TRAINER.LORA.DROPOUT_RATE": 0.0,
        "TRAINER.LORA.TEXT_LOSS_WEIGHT": 0.0,
        "TRAINER.LORA.IMAGE_LOSS_WEIGHT": 0.0,
        "TRAINER.LORA.LOGITS_LOSS_WEIGHT": 0.0,
        "OPTIM.MAX_EPOCH": 40,
        "OPTIM.LR": 0.01,
        "OPTIM.NAME": "adam",
    }
    base.update(overrides)
    return make_cfg(tmp_path, **base)


def test_lora_learns_and_checkpoint_roundtrip(tmp_path):
    import jax

    cfg = lora_cfg(tmp_path)
    cfg.freeze()
    t = build_trainer(cfg)
    assert set(t.params) == {"text", "vision"}
    assert set(t.params["text"]) == {"q", "k", "v"}
    a, b = t.params["text"]["q"]
    assert a.shape == (2, 64, 4) and b.shape == (2, 4, 64)  # tiny: 2 layers

    # NB: LoRA's statistical power comes from adapting *pretrained* towers;
    # on random towers (all that's available offline) the sound check is
    # optimization progress, not accuracy: the training loss must drop.
    fixed = t.parse_batch_train(next(iter(t.train_loader_x)))
    key = jax.random.PRNGKey(0)
    loss_before = float(t.loss_fn(t.params, t.frozen, fixed, key)[0])
    t.train()
    loss_after = float(t.loss_fn(t.params, t.frozen, fixed, key)[0])
    assert loss_after < loss_before - 0.05, (loss_before, loss_after)

    # LoRA-only checkpoint with metadata validation
    t2 = build_trainer(cfg)
    t2.load_model(cfg.OUTPUT_DIR)
    assert abs(t2.test() - t.test()) < 1e-6

    # metadata mismatch must be rejected
    bad = lora_cfg(tmp_path, **{"TRAINER.LORA.R": 8})
    bad.freeze()
    t3 = build_trainer(bad)
    with pytest.raises(ValueError, match="metadata mismatch"):
        t3.load_model(cfg.OUTPUT_DIR)


def test_lora_zero_init_matches_zeroshot(tmp_path):
    """With B=0 the adapted model must equal the frozen model exactly."""
    cfg = lora_cfg(tmp_path, **{"TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    batch = next(iter(t.test_loader))
    imgs = t.parse_batch_test(batch)["img"]
    with_lora = np.asarray(t.model_inference(imgs))
    zero_params = {
        k: {p: (a, b * 0) for p, (a, b) in v.items()} for k, v in t.params.items()
    }
    also = np.asarray(t._eval_step(zero_params, t.frozen, imgs))
    np.testing.assert_allclose(with_lora, also, rtol=1e-5, atol=1e-5)


def test_lora_dropout_trains_and_eval_deterministic(tmp_path):
    cfg = lora_cfg(
        tmp_path,
        **{
            "TRAINER.LORA.DROPOUT_RATE": 0.25,
            "OPTIM.MAX_EPOCH": 2,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    batch = next(iter(t.test_loader))
    imgs = t.parse_batch_test(batch)["img"]
    a = np.asarray(t.model_inference(imgs))
    b = np.asarray(t.model_inference(imgs))
    np.testing.assert_array_equal(a, b)  # no dropout at eval


def test_simclr_two_view_loader(tmp_path):
    from fsvlm_tpu.trainers.simclr_utils import make_simclr_loader

    cfg = make_cfg(tmp_path)
    cfg.freeze()
    from fsvlm_tpu.data import DataManager

    dm = DataManager(cfg)
    loader = make_simclr_loader(cfg, dm.dataset.train_x)
    batch = next(iter(loader))
    assert batch["img"].shape == batch["img2"].shape == (16, 32, 32, 3)
    # the two views must differ (stochastic augmentation)
    assert np.abs(batch["img"] - batch["img2"]).max() > 1e-3


def test_coop_simclr_loss_runs(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.COOP.LOSS_TYPE": "simclr",
            "OPTIM.MAX_EPOCH": 2,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    from fsvlm_tpu.trainers.simclr_utils import make_simclr_loader

    t.train_loader_x = make_simclr_loader(cfg, t.dm.dataset.train_x)
    t.train()

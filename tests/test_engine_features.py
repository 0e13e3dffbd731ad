"""Engine features: best-val checkpointing, resume, INIT_WEIGHTS, NaN guard."""

import os

import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def test_best_val_checkpointing(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "TEST.FINAL_MODEL": "best_val",
            "OPTIM.MAX_EPOCH": 6,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    best = os.path.join(cfg.OUTPUT_DIR, "prompt_learner", "model-best.pkl")
    assert os.path.exists(best)
    assert t.best_result > -np.inf


def test_resume_from_pointer_file(tmp_path):
    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 3, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    t2 = build_trainer(cfg)
    start = t2.resume_model_if_exist(cfg.OUTPUT_DIR)
    assert start == 3  # picks up after the final saved epoch


def test_best_save_does_not_move_resume_pointer(tmp_path):
    """A best-val save (model-best.pkl) must NOT advance the pointer file:
    a crash after it would otherwise resume from the best epoch, replaying
    epochs (ADVICE r1)."""
    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 2, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    mdir = os.path.join(cfg.OUTPUT_DIR, "prompt_learner")
    with open(os.path.join(mdir, "checkpoint")) as f:
        assert f.read().strip() == "model.pkl-2"
    # simulate a later best-val save at an EARLIER epoch
    t.save_model(0, cfg.OUTPUT_DIR, val_result=99.0, model_name="model-best.pkl")
    with open(os.path.join(mdir, "checkpoint")) as f:
        assert f.read().strip() == "model.pkl-2"
    t2 = build_trainer(cfg)
    assert t2.resume_model_if_exist(cfg.OUTPUT_DIR) == 2


def test_resume_restores_rng_and_gpa(tmp_path):
    """PromptSRC resume must restore the GPA accumulator and rng stream."""
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "PromptSRC",
            "OPTIM.MAX_EPOCH": 4,
            "TEST.NO_TEST": True,
            "TRAINER.PROMPTSRC.PREC": "fp32",
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT": 2,
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION": 2,
            "TRAIN.CHECKPOINT_FREQ": 1,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    # run the first 2 of 4 epochs, checkpointing each
    t.train(max_epoch=2)
    assert t.gpa_params is not None
    gpa_after_2 = [np.asarray(x) for x in __import__("jax").tree.leaves(t.gpa_params)]

    t2 = build_trainer(cfg)
    t2.resume_model_if_exist(cfg.OUTPUT_DIR)
    assert t2.start_epoch == 2
    assert t2.gpa_params is not None
    for a, b in zip(gpa_after_2, __import__("jax").tree.leaves(t2.gpa_params)):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(t.rng_key), np.asarray(t2.rng_key))


def test_resume_missing_checkpoint_announces_fallback(tmp_path, capsys):
    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    start = t.resume_model_if_exist(str(tmp_path / "nonexistent"))
    assert start == 0
    assert "No checkpoint found" in capsys.readouterr().out


def test_init_weights(tmp_path):
    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 2, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    ckpt = os.path.join(cfg.OUTPUT_DIR, "prompt_learner", "model.pkl-2")
    assert os.path.exists(ckpt)

    cfg2 = make_cfg(
        tmp_path / "b", **{"MODEL.INIT_WEIGHTS": ckpt, "TEST.NO_TEST": True}
    )
    cfg2.freeze()
    t2 = build_trainer(cfg2)
    np.testing.assert_allclose(
        np.asarray(t2.params["ctx"]), np.asarray(t.params["ctx"]), rtol=1e-6
    )


def test_nan_guard(tmp_path):
    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)

    import jax.numpy as jnp

    original = t.loss_fn
    t.loss_fn = lambda p, f, b, r: (jnp.float32(jnp.nan), {})
    t._compile_steps()
    with pytest.raises(FloatingPointError):
        t.train()


def test_tensorboard_events_written(tmp_path):
    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    tb_dir = os.path.join(cfg.OUTPUT_DIR, "tensorboard")
    if t._writer is None or not os.path.isdir(tb_dir):
        import pytest

        pytest.skip("tensorflow not available for TB writing")
    assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_frozen_dtype_bf16(tmp_path):
    """MODEL.FROZEN_DTYPE=bf16 stores the frozen CLIP pytree in bfloat16
    (upstream CLIP's fp16-weight storage analog) and still trains."""
    import jax
    import jax.numpy as jnp

    from test_coop_end2end import make_cfg

    cfg = make_cfg(tmp_path, **{"MODEL.FROZEN_DTYPE": "bf16",
                                "OPTIM.MAX_EPOCH": 1,
                                "TEST.NO_TEST": True})
    cfg.freeze()
    from fsvlm_tpu.engine import build_trainer

    t = build_trainer(cfg)
    leaves = jax.tree.leaves(t.frozen["clip"])
    assert any(l.dtype == jnp.bfloat16 for l in leaves)
    t.train()

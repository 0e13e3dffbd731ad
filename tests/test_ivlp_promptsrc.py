"""End-to-end tests for the deep-prompting family (IVLP, PromptSRC)."""

import jax
import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def ivlp_cfg(tmp_path, trainer="IVLP", **overrides):
    base = {
        "TRAINER.NAME": trainer,
        f"TRAINER.{trainer.upper()}.PREC": "fp32",
        f"TRAINER.{trainer.upper()}.N_CTX_TEXT": 2,
        f"TRAINER.{trainer.upper()}.N_CTX_VISION": 2,
        f"TRAINER.{trainer.upper()}.CTX_INIT": "a photo of a",
        f"TRAINER.{trainer.upper()}.PROMPT_DEPTH_TEXT": 2,
        f"TRAINER.{trainer.upper()}.PROMPT_DEPTH_VISION": 2,
        "OPTIM.MAX_EPOCH": 20,
        "OPTIM.LR": 2.0,
    }
    base.update(overrides)
    return make_cfg(tmp_path, **base)


def test_ivlp_param_tree_and_learning(tmp_path):
    cfg = ivlp_cfg(
        tmp_path,
        **{"TRAINER.IVLP.USE_KD": False, "TRAINER.IVLP.USE_MIXUP": False},
    )
    cfg.freeze()
    t = build_trainer(cfg)
    # params: ctx + text_deep + vpt_shallow + vision_deep (depth 2 -> 1 row)
    assert set(t.params) == {"ctx", "text_deep", "vpt_shallow", "vision_deep"}
    assert t.params["ctx"].shape == (2, 64)
    assert t.params["text_deep"].shape == (1, 2, 64)
    assert t.params["vpt_shallow"].shape == (2, 64)
    acc = t.train()
    assert acc > 30.0, f"IVLP failed to learn: {acc}"


def test_ivlp_kd_mixup_smoke(tmp_path):
    cfg = ivlp_cfg(
        tmp_path,
        **{
            "TRAINER.IVLP.USE_KD": True,
            "TRAINER.IVLP.USE_MIXUP": True,
            "OPTIM.MAX_EPOCH": 2,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    assert "teacher_text" in t.frozen
    t.train()


def test_promptsrc_losses_and_gpa(tmp_path):
    cfg = ivlp_cfg(
        tmp_path,
        trainer="PromptSRC",
        # NB: the paper weights (25/10) anchor the prompts to the zero-shot
        # teacher — which is *random* in this offline fixture — so the test
        # uses small weights; the loss plumbing is what's under test.
        **{
            "TRAINER.PROMPTSRC.TEXT_LOSS_WEIGHT": 1.0,
            "TRAINER.PROMPTSRC.IMAGE_LOSS_WEIGHT": 0.5,
            "TRAINER.PROMPTSRC.GPA_MEAN": 8,
            "TRAINER.PROMPTSRC.GPA_STD": 1,
            "OPTIM.MAX_EPOCH": 10,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    assert "zs_text" in t.frozen
    # gaussian epoch weights normalized
    assert abs(t.gauss.sum() - 1.0) < 1e-6
    acc = t.train()
    # GPA must have been applied: params == accumulated average
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        t.params,
        t.gpa_params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-6
    assert acc > 25.0


def test_promptsrc_base_to_new_transfer(tmp_path):
    """Train on base classes, evaluate the checkpoint on new classes —
    the base-to-novel protocol (scripts/promptsrc/base2new_*.sh)."""
    cfg = ivlp_cfg(
        tmp_path,
        trainer="PromptSRC",
        **{"DATASET.SUBSAMPLE_CLASSES": "base", "OPTIM.MAX_EPOCH": 3},
    )
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    cfg2 = ivlp_cfg(
        tmp_path,
        trainer="PromptSRC",
        **{"DATASET.SUBSAMPLE_CLASSES": "new", "OPTIM.MAX_EPOCH": 3},
    )
    cfg2.freeze()
    t2 = build_trainer(cfg2)
    # class-dependent buffers live in frozen, so base-trained prompt params
    # load cleanly against the new class set (reference deletes
    # token_prefix/suffix on load, promptsrc.py:389-419)
    t2.load_model(cfg.OUTPUT_DIR, epoch=3)
    acc = t2.test()
    assert acc >= 0.0  # protocol runs end-to-end


def test_promptsrc_cached_teacher(tmp_path):
    """The fast-SCL extension: precomputed clean-image teacher features
    replace the per-step teacher tower; training still works end-to-end."""
    cfg = ivlp_cfg(
        tmp_path,
        trainer="PromptSRC",
        **{
            "TRAINER.PROMPTSRC.CACHED_TEACHER": True,
            "TRAINER.PROMPTSRC.TEXT_LOSS_WEIGHT": 1.0,
            "TRAINER.PROMPTSRC.IMAGE_LOSS_WEIGHT": 0.5,
            "OPTIM.MAX_EPOCH": 4,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    n_train = len(t.dm.dataset.train_x)
    assert t.frozen["zs_img_cache"].shape == (n_train, t.clip_cfg.embed_dim)
    # features are L2-normalized
    norms = np.linalg.norm(np.asarray(t.frozen["zs_img_cache"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    t.train()

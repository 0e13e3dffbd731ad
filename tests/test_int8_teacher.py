"""PromptSRC with an int8 frozen teacher (TRAINER.PROMPTSRC.INT8_TEACHER).

The teacher pass keeps the reference's semantics (stop-gradient zero-shot
tower over the augmented batch, PromptSRC/trainers/promptsrc.py:198-201) but
executes its GEMMs in W8A8 int8 (ops/quant.py).  Pins: training runs end to
end, the int8 teacher's per-step loss tracks the fp teacher's closely, and
the prompt gradients are unaffected by the teacher's quantization record
(the teacher is outside the differentiated subgraph).
"""

import numpy as np

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_ivlp_promptsrc import ivlp_cfg


def _cfg(tmp_path, **over):
    base = {
        "TRAINER.PROMPTSRC.TEXT_LOSS_WEIGHT": 1.0,
        "TRAINER.PROMPTSRC.IMAGE_LOSS_WEIGHT": 0.5,
        "OPTIM.MAX_EPOCH": 3,
        "TEST.NO_TEST": True,
    }
    base.update(over)
    return ivlp_cfg(tmp_path, trainer="PromptSRC", **base)


def test_int8_teacher_trains_and_tracks_fp(tmp_path):
    cfg = _cfg(tmp_path, **{"TRAINER.PROMPTSRC.INT8_TEACHER": True})
    cfg.freeze()
    t = build_trainer(cfg)
    # int8 copy exists, shares float leaves, quantizes the visual GEMMs
    assert "clip_teacher" in t.frozen
    q = t.frozen["clip_teacher"]["visual"]["blocks"]["attn"]["w_qkv"]
    assert isinstance(q, dict) and q["q8"].dtype.name == "int8"
    assert t.frozen["clip_teacher"]["text"] is not None

    batch = next(iter(t.train_loader_x))
    import jax

    loss_q, _ = t.loss_fn(t.params, t.frozen, batch, jax.random.key(0))

    cfg_fp = _cfg(tmp_path)
    cfg_fp.freeze()
    t_fp = build_trainer(cfg_fp)
    batch_fp = next(iter(t_fp.train_loader_x))
    loss_fp, _ = t_fp.loss_fn(t_fp.params, t_fp.frozen, batch_fp, jax.random.key(0))

    # identical seed/data pipeline -> same batch; the int8 teacher only
    # perturbs the SCL/KL terms slightly
    np.testing.assert_array_equal(
        np.asarray(batch["img"]), np.asarray(batch_fp["img"]))
    assert abs(float(loss_q) - float(loss_fp)) / abs(float(loss_fp)) < 0.05

    # gradients still flow into every prompt leaf and are finite
    grads = jax.grad(lambda p: t.loss_fn(p, t.frozen, batch, jax.random.key(0))[0])(
        t.params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(np.all(np.isfinite(np.asarray(g)))) for g in flat)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in flat)

    t.train()  # full loop end to end


def test_int8_teacher_static_scales(tmp_path):
    """MODEL.QUANT_INT8_STATIC + INT8_TEACHER: the teacher tower carries
    per-layer calibrated static activation scales and the loss still tracks
    the fp teacher."""
    cfg = _cfg(tmp_path, **{
        "TRAINER.PROMPTSRC.INT8_TEACHER": True,
        "MODEL.QUANT_INT8_STATIC": True,
        "MODEL.QUANT_INT8_CALIB_BATCHES": 2,
    })
    cfg.freeze()
    t = build_trainer(cfg)
    q = t.frozen["clip_teacher"]["visual"]["blocks"]["attn"]["w_qkv"]
    assert isinstance(q, dict) and "xs" in q
    assert bool(np.all(np.asarray(q["xs"]) > 0))

    import jax

    batch = next(iter(t.train_loader_x))
    loss_s, _ = t.loss_fn(t.params, t.frozen, batch, jax.random.key(0))

    cfg_fp = _cfg(tmp_path)
    cfg_fp.freeze()
    t_fp = build_trainer(cfg_fp)
    loss_fp, _ = t_fp.loss_fn(
        t_fp.params, t_fp.frozen, next(iter(t_fp.train_loader_x)),
        jax.random.key(0))
    assert abs(float(loss_s) - float(loss_fp)) / abs(float(loss_fp)) < 0.05


def test_ivlp_kd_int8_teacher_smoke(tmp_path):
    cfg = ivlp_cfg(
        tmp_path,
        trainer="IVLP",
        **{
            "TRAINER.IVLP.USE_KD": True,
            "TRAINER.IVLP.KD_ALPHA": 0.7,
            "TRAINER.IVLP.USE_MIXUP": False,
            "TRAINER.IVLP.INT8_TEACHER": True,
            "OPTIM.MAX_EPOCH": 2,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    assert "clip_teacher" in t.frozen
    t.train()

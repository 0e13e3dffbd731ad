"""N-step CoCoOp training-trajectory parity vs the REAL reference trainer.

The architecturally riskiest divergence in the rebuild: the reference
computes instance-conditioned prompts with per-image Python loops
(PromptSRC/trainers/cocoop.py:186-198 prompt stacking, :247-255 per-image
text-encoder loop — why it trains at batch 1); fsvlm batches the whole
thing (one meta-net matmul + vmapped text forward).  This test proves the
batched formulation is numerically IDENTICAL through training: ctx AND
meta-net weight trajectories match the reference step-for-step under the
full loss -> grad -> SGD(momentum, wd) -> lr-staircase composition.

Both sides share tiny random CLIP weights; the reference's random-init
meta_net is copied into our pytree so the starting point is identical.
fp32 on CPU.

The module-level helpers (_cocoop_cfg/_cocoop_batches/_ref_cocoop_drive/
_our_cocoop_drive) are shared with tools/make_golden_pack.py and
tests/test_golden_pack.py, which freeze/replay the reference side of this
exact drive as a committed artifact with zero reference dependency.
"""

import numpy as np
import pytest

from reference_oracle import (
    import_reference_clip,
    import_reference_trainers,
    reference_available,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference checkout not available"
    ),
]

N_EPOCHS = 4
STEPS_PER_EPOCH = 2
BATCH = 4
N_CLS = 8  # must match the Synthetic dataset's class count: the fsvlm
# trainer builds its prompt context from dm.dataset.classnames
CLASSNAMES = [f"synthetic class {i}" for i in range(N_CLS)]


def _cocoop_cfg(outdir):
    """The frozen config both sides (and the golden-pack replay) train under."""
    from fsvlm_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.OUTPUT_DIR = str(outdir)
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.MODEL.BACKBONE.NAME = "test-tiny"
    cfg.MODEL.TEXT_TRUNCATE = False  # bit-comparable summation order
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = BATCH
    cfg.DATALOADER.TEST.BATCH_SIZE = BATCH
    cfg.DATALOADER.DEVICE_AUG = False
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.05
    cfg.OPTIM.MOMENTUM = 0.9
    cfg.OPTIM.WEIGHT_DECAY = 5e-4
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.MAX_EPOCH = N_EPOCHS
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 1e-3
    cfg.TEST.NO_TEST = True
    cfg.TRAIN.PRINT_FREQ = 1000
    cfg.TRAINER.NAME = "CoCoOp"
    cfg.TRAINER.COCOOP.N_CTX = 4
    cfg.TRAINER.COCOOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COCOOP.PREC = "fp32"
    cfg.freeze()
    return cfg


def _cocoop_batches():
    rng = np.random.RandomState(3)
    return [
        (
            rng.randn(BATCH, 32, 32, 3).astype(np.float32),
            rng.randint(0, N_CLS, size=BATCH).astype(np.int64),
        )
        for _ in range(N_EPOCHS * STEPS_PER_EPOCH)
    ]


def _tiny_cocoop_torch_clip():
    """Shared tiny random CLIP at the CoCoOp design (torch seed 17)."""
    import torch

    import_reference_clip()
    from clip.model import CLIP

    design = {
        "trainer": "CoCoOp",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
    }
    torch.manual_seed(17)
    return CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).float()


def _ref_cocoop_drive(cfg, torch_model):
    """Drive the REAL reference CoCoOp.forward_backward for the full
    schedule; returns (init tensors, losses, per-step snapshots)."""
    import torch

    import_reference_trainers()
    import trainers.cocoop as ref_cocoop
    from dassl.engine.trainer import TrainerBase
    from dassl.optim import build_lr_scheduler, build_optimizer

    model = ref_cocoop.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    model.train()
    learner = model.prompt_learner

    shim = ref_cocoop.CoCoOp.__new__(ref_cocoop.CoCoOp)
    TrainerBase.__init__(shim)
    shim.cfg = cfg
    shim.device = torch.device("cpu")
    shim.model = model
    shim.optim = build_optimizer(learner, cfg.OPTIM)
    shim.sched = build_lr_scheduler(shim.optim, cfg.OPTIM)
    shim.register_model("prompt_learner", learner, shim.optim, shim.sched)
    shim.scaler = None
    shim.num_batches = STEPS_PER_EPOCH
    shim.epoch = 0

    meta = dict(learner.meta_net.named_parameters())
    init = {
        "ctx": learner.ctx.detach().numpy().copy(),
        "w1": meta["linear1.weight"].detach().numpy().copy(),
        "b1": meta["linear1.bias"].detach().numpy().copy(),
        "w2": meta["linear2.weight"].detach().numpy().copy(),
        "b2": meta["linear2.bias"].detach().numpy().copy(),
    }

    def snap():
        return {
            "ctx": learner.ctx.detach().numpy().copy(),
            "w1": meta["linear1.weight"].detach().numpy().copy(),
            "w2": meta["linear2.weight"].detach().numpy().copy(),
        }

    batches = _cocoop_batches()
    ref_losses, ref_snaps = [], []
    for ep in range(N_EPOCHS):
        for bi in range(STEPS_PER_EPOCH):
            imgs, labels = batches[ep * STEPS_PER_EPOCH + bi]
            shim.batch_idx = bi
            summary = shim.forward_backward(
                {
                    "img": torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                    "label": torch.from_numpy(labels),
                }
            )
            ref_losses.append(summary["loss"])
            ref_snaps.append(snap())
    return init, ref_losses, ref_snaps


def _our_cocoop_drive(cfg, params, clip_cfg, init, monkeypatch):
    """Run the fsvlm batched CoCoOp from the same weights/init; returns
    (losses, per-step snapshots in torch layout)."""
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401
    import fsvlm_tpu.trainers.cocoop as our_cocoop
    import jax.numpy as jnp

    monkeypatch.setattr(
        our_cocoop, "load_clip_backbone", lambda cfg: (params, clip_cfg)
    )
    trainer = build_trainer(cfg)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH

    # identical ctx init (both derive from the shared token embedding)
    np.testing.assert_allclose(
        np.asarray(trainer.params["ctx"]), init["ctx"], rtol=1e-6, atol=1e-6
    )
    # start from the reference's random-init meta_net (torch Linear weight
    # is (out, in); ours is (in, out))
    trainer.params["meta_net"] = {
        "w1": jnp.asarray(init["w1"].T),
        "b1": jnp.asarray(init["b1"]),
        "w2": jnp.asarray(init["w2"].T),
        "b2": jnp.asarray(init["b2"]),
    }

    batches = _cocoop_batches()
    our_losses, our_snaps = [], []
    for ep in range(N_EPOCHS):
        trainer.epoch = ep
        for bi in range(STEPS_PER_EPOCH):
            imgs, labels = batches[ep * STEPS_PER_EPOCH + bi]
            batch = {
                "img": imgs,
                "label": labels.astype(np.int32),
                "domain": np.zeros(BATCH, np.int32),
                "index": np.arange(BATCH, dtype=np.int32),
                "valid": np.ones(BATCH, bool),
            }
            trainer.batch_idx = bi
            metrics = trainer.forward_backward(batch)
            our_losses.append(float(metrics["loss"]))
            our_snaps.append(
                {
                    "ctx": np.asarray(trainer.params["ctx"]),
                    "w1": np.asarray(trainer.params["meta_net"]["w1"]).T,
                    "w2": np.asarray(trainer.params["meta_net"]["w2"]).T,
                }
            )
    return our_losses, our_snaps


def _assert_cocoop_match(our_losses, our_snaps, ref_losses, ref_snaps):
    assert len(our_losses) == N_EPOCHS * STEPS_PER_EPOCH == len(ref_losses)
    for k in range(len(ref_losses)):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        for key in ("ctx", "w1", "w2"):
            np.testing.assert_allclose(
                our_snaps[k][key],
                ref_snaps[k][key],
                rtol=2e-3,
                atol=3e-5,
                err_msg=f"{key} diverged at step {k}",
            )


def test_cocoop_trajectory_parity(tmp_path, monkeypatch):
    torch_model = _tiny_cocoop_torch_clip()
    cfg = _cocoop_cfg(tmp_path / "out")

    init, ref_losses, ref_snaps = _ref_cocoop_drive(cfg, torch_model)

    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    params, clip_cfg = clip_params_from_state_dict(
        {k: v for k, v in torch_model.state_dict().items()}
    )
    our_losses, our_snaps = _our_cocoop_drive(
        cfg, params, clip_cfg, init, monkeypatch
    )
    _assert_cocoop_match(our_losses, our_snaps, ref_losses, ref_snaps)

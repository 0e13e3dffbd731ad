"""N-step MaPLe training-trajectory parity vs the REAL reference trainer.

Extends the CoOp/PromptSRC trajectory suite (test_trajectory_parity.py) to
the coupled multi-modal prompt learner: shared text ctx + its vision
projection + per-depth compound prompts/projections all update jointly
through both towers (reference trainers/maple.py:290-331 forward_backward,
:112-176 MultiModalPromptLearner).

The reference learner HARDCODES production widths (compound text prompts
at 512, vision projections to 768 — maple.py:149-156) so the shared tiny
model must use the real ViT-B/16 widths with 2 layers per tower.  Both
sides start from the reference's exact initialization (ctx derives from
the shared token embedding on both sides; proj/compound tensors are copied
torch -> pytree) and run fp32 on CPU; the reference's unconditional
.half() casts (maple.py:146 proj.half(), CUDA-era fp16) are no-op'd.
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
N_CLS = 8
N_CTX = 4
DEPTH = 2
CLASSNAMES = [f"synthetic class {i}" for i in range(N_CLS)]


def test_maple_trajectory_parity(tmp_path, monkeypatch):
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.maple as ref_maple

    from fsvlm_tpu.config import get_cfg_default

    # the reference calls .half() unconditionally (maple.py:146); fp32-on-CPU
    # oracle drive no-ops it (same pattern as the PromptSRC trajectory test)
    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "half", lambda self, *a, **k: self, raising=True
    )
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=True
    )

    cfg = get_cfg_default()
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.OUTPUT_DIR = str(tmp_path / "out")
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
    cfg.TRAINER.NAME = "MaPLe"
    cfg.TRAINER.MAPLE.N_CTX = N_CTX
    cfg.TRAINER.MAPLE.CTX_INIT = "a photo of a"
    cfg.TRAINER.MAPLE.PREC = "fp32"
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = DEPTH
    cfg.freeze()

    # shared weights at the widths the reference learner hardcodes
    import_reference_clip()
    from clip.model import CLIP

    design = {
        "trainer": "MaPLe",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
        "maple_length": N_CTX,
    }
    torch.manual_seed(13)
    torch_model = CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=768,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=2,
        design_details=design,
    ).float()
    # fork quirk: Transformer.saved_features instrumentation crashes on
    # MaPLe's list-valued inputs (clip/model.py:340-366)
    torch_model.transformer.init = False
    torch_model.visual.transformer.init = False

    rng = np.random.RandomState(3)
    batches = [
        (
            rng.randn(BATCH, 32, 32, 3).astype(np.float32),
            rng.randint(0, N_CLS, size=BATCH).astype(np.int64),
        )
        for _ in range(N_EPOCHS * STEPS_PER_EPOCH)
    ]

    # ---- reference side
    from dassl.engine.trainer import TrainerBase
    from dassl.optim import build_lr_scheduler, build_optimizer

    model = ref_maple.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    model.train()

    shim = ref_maple.MaPLe.__new__(ref_maple.MaPLe)
    TrainerBase.__init__(shim)
    shim.cfg = cfg
    shim.device = torch.device("cpu")
    shim.model = model
    shim.optim = build_optimizer(model, cfg.OPTIM)
    shim.sched = build_lr_scheduler(shim.optim, cfg.OPTIM)
    shim.register_model("MultiModalPromptLearner", model, shim.optim, shim.sched)
    shim.scaler = None
    shim.num_batches = STEPS_PER_EPOCH
    shim.epoch = 0

    learner = model.prompt_learner

    def snap():
        return {
            "ctx": learner.ctx.detach().numpy().copy(),
            "compound": learner.compound_prompts_text[0].detach().numpy().copy(),
            "proj_w": learner.proj.weight.detach().numpy().copy(),
        }

    # snapshot the reference's INITIAL tensors before it trains: these seed
    # our pytree so both sides start from the identical point
    init = {
        "ctx": learner.ctx.detach().numpy().copy(),
        "proj_w": learner.proj.weight.detach().numpy().copy(),
        "proj_b": learner.proj.bias.detach().numpy().copy(),
        "compound": learner.compound_prompts_text[0].detach().numpy().copy(),
        "cproj_w": learner.compound_prompt_projections[0]
        .weight.detach()
        .numpy()
        .copy(),
        "cproj_b": learner.compound_prompt_projections[0]
        .bias.detach()
        .numpy()
        .copy(),
    }

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

    # ---- fsvlm side (same weights via the converter; same init by copy)
    from fsvlm_tpu.engine import build_trainer
    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    import fsvlm_tpu.trainers  # noqa: F401
    import fsvlm_tpu.trainers.maple as our_maple
    import jax.numpy as jnp

    params, clip_cfg = clip_params_from_state_dict(
        {k: v for k, v in torch_model.state_dict().items()}
    )
    monkeypatch.setattr(
        our_maple, "load_clip_backbone", lambda cfg: (params, clip_cfg)
    )
    trainer = build_trainer(cfg)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH

    # ctx derives from the shared token embedding -> identical by construction
    np.testing.assert_allclose(
        np.asarray(trainer.params["ctx"]), init["ctx"], rtol=1e-6, atol=1e-6
    )
    # copy the reference's random-init proj/compound tensors (torch Linear
    # weight is (out, in); ours is (in, out))
    trainer.params["proj"] = {
        "w": jnp.asarray(init["proj_w"].T),
        "b": jnp.asarray(init["proj_b"]),
    }
    trainer.params["compound_text"] = jnp.asarray(init["compound"][None])
    trainer.params["compound_proj"] = {
        "w": jnp.asarray(init["cproj_w"].T[None]),
        "b": jnp.asarray(init["cproj_b"][None]),
    }

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
                    "compound": np.asarray(trainer.params["compound_text"][0]),
                    "proj_w": np.asarray(trainer.params["proj"]["w"]).T,
                }
            )

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        for key in ("ctx", "compound", "proj_w"):
            np.testing.assert_allclose(
                our_snaps[k][key],
                ref_snaps[k][key],
                rtol=2e-3,
                atol=3e-5,
                err_msg=f"{key} diverged at step {k}",
            )



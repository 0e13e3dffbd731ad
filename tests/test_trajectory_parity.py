"""N-step training-trajectory parity vs the REAL reference trainers.

Losses, schedules, optimizers, and single forwards are parity-tested
piecewise elsewhere; this module proves the COMPOSITION — loss -> grad ->
weight decay -> momentum -> per-epoch lr staircase -> update (and
PromptSRC's GPA aggregation) — matches step-for-step over multiple epochs.

Oracle: the reference's own `forward_backward` methods driven directly
(PromptSRC/trainers/coop.py:437-459, promptsrc.py:285-353) on shared tiny
random CLIP weights and identical batches, with the dassl optimizer/
scheduler stack (Dassl.pytorch/dassl/optim).  Both sides run fp32 on CPU.
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

N_EPOCHS = 5
STEPS_PER_EPOCH = 2
BATCH = 4
N_CLS = 8
CLASSNAMES = [f"synthetic class {i}" for i in range(N_CLS)]


def _shared_cfg():
    """One cfg object serves both sides: the reference CustomCLIP/dassl
    optim read the same keys our mini-yacs tree defines."""
    from fsvlm_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 1  # 8 train imgs -> 2 batches of 4 per epoch
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
    return cfg


def _tiny_torch_clip(design, seed=9):
    import torch

    import_reference_clip()
    from clip.model import CLIP

    torch.manual_seed(seed)
    return CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).float()


def _batches(seed=3):
    """Deterministic already-normalized image batches + labels, one per
    step of the whole run."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(N_EPOCHS * STEPS_PER_EPOCH):
        out.append(
            (
                rng.randn(BATCH, 32, 32, 3).astype(np.float32),
                rng.randint(0, N_CLS, size=BATCH).astype(np.int64),
            )
        )
    return out


def _ref_trainer_shim(trainer_cls, cfg, model, learner):
    """Instantiate the reference trainer WITHOUT its data/build pipeline
    (build_model would download CLIP weights) and wire exactly the state
    its forward_backward reads."""
    import torch

    from dassl.engine.trainer import TrainerBase
    from dassl.optim import build_lr_scheduler, build_optimizer

    t = trainer_cls.__new__(trainer_cls)
    TrainerBase.__init__(t)
    t.cfg = cfg
    t.device = torch.device("cpu")
    t.model = model
    t.optim = build_optimizer(learner, cfg.OPTIM)
    t.sched = build_lr_scheduler(t.optim, cfg.OPTIM)
    t.register_model("prompt_learner", learner, t.optim, t.sched)
    t.num_batches = STEPS_PER_EPOCH
    t.epoch = 0
    return t


def _build_fsvlm_trainer(cfg, torch_model, monkeypatch, trainer_mod):
    """Build OUR trainer with the reference model's converted weights."""
    from fsvlm_tpu.engine import build_trainer
    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    import fsvlm_tpu.trainers  # noqa: F401

    params, clip_cfg = clip_params_from_state_dict(
        {k: v for k, v in torch_model.state_dict().items()}
    )
    monkeypatch.setattr(
        trainer_mod, "load_clip_backbone", lambda cfg: (params, clip_cfg)
    )
    return build_trainer(cfg)


def _run_fsvlm_steps(trainer, batches, record):
    """Drive our trainer step-for-step (bypassing the loader so the pixels
    are bit-identical to the reference's)."""
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
            record(ep, bi, float(metrics["loss"]), trainer.params)


@pytest.mark.parametrize("loss_type", ["ce", "focal"])
def test_coop_trajectory_parity(tmp_path, monkeypatch, loss_type):
    """10 steps / 5 epochs of the REAL reference CoOp.forward_backward
    (coop.py:437-459: loss -> zero_grad -> backward -> SGD step ->
    update_lr at epoch end) vs our jitted step: the ctx trajectories must
    match step-for-step.

    loss_type="focal" additionally proves the fork's headline imbalance
    machinery composes identically: MultiClassFocalLoss with
    inverse-frequency alpha from DATASET.PER_CLASS_SHOTS
    (coop.py:131-162 focal, :326-346 alpha derivation)."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.coop as ref_coop

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 4
    cfg.TRAINER.COOP.CTX_INIT = "a photo of a"  # deterministic shared init
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.TRAINER.COOP.CSC = False
    cfg.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    cfg.TRAINER.COOP.LOSS_TYPE = loss_type
    if loss_type == "focal":
        # imbalanced shot list over the 8 classes -> inverse-freq alpha
        cfg.DATASET.PER_CLASS_SHOTS = [16, 8, 4, 2, 1, 1, 1, 1]
        # the Synthetic fixture generates 34 train images from that list;
        # bs 17 keeps the trainer's loader at STEPS_PER_EPOCH=2 batches so
        # its precomputed LR staircase advances epochs on the same step
        # boundaries as the reference shim's num_batches=2
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 17
    cfg.freeze()

    design = {
        "trainer": "CoOp",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
    }
    torch_model = _tiny_torch_clip(design)
    batches = _batches()

    # ---- reference side
    model = ref_coop.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    model.train()
    shim = _ref_trainer_shim(ref_coop.CoOp, cfg, model, model.prompt_learner)

    ref_losses, ref_ctx = [], []
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
            ref_ctx.append(model.prompt_learner.ctx.detach().numpy().copy())

    # ---- fsvlm side
    import fsvlm_tpu.trainers.coop as our_coop

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_coop)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH
    # identical ctx init (both slice the shared "a photo of a" embedding)
    assert np.asarray(trainer.params["ctx"]).shape == ref_ctx[0].shape

    our_losses, our_ctx = [], []

    def record(ep, bi, loss, params):
        our_losses.append(loss)
        our_ctx.append(np.asarray(params["ctx"]))

    _run_fsvlm_steps(trainer, batches, record)

    # step-for-step: losses and ctx trajectories
    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 5e-4 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        np.testing.assert_allclose(
            our_ctx[k], ref_ctx[k], rtol=2e-3, atol=2e-5,
            err_msg=f"ctx diverged at step {k}",
        )


def test_promptsrc_trajectory_and_gpa_parity(tmp_path, monkeypatch):
    """10 steps / 5 epochs of the REAL reference PromptSRC.forward_backward
    (promptsrc.py:285-353: CE + 3 SCL losses -> SGD -> lr staircase -> GPA
    accumulation at each epoch end -> final GPA swap-in) vs our trainer.

    Text-ctx-only prompts (PROMPT_DEPTH_TEXT=1, no vision prompts): deep/
    shallow prompt splicing passes through the reference's per-forward
    .half() rounding, which our TPU-native path deliberately does not
    reproduce (fp16 is a CUDA-era artifact; splice parity incl. the
    rounding is covered by test_clip_parity) — with ctx-only prompts both
    sides are exact fp32 and the COMPOSITION is what's under test.  The
    oracle drive no-ops torch's .cuda()/.half() (promptsrc.py calls them
    unconditionally; in fp32-on-CPU they would crash / mix dtypes)."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.promptsrc as ref_psrc

    # CPU-compatibility no-ops for the oracle drive
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=True
    )
    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "PromptSRC"
    node = cfg.TRAINER.PROMPTSRC
    node.N_CTX_TEXT = 4
    node.N_CTX_VISION = 0
    # NOT "a photo of a": with the ctx initialized to the teacher's own
    # template the SCL L1 terms start at an EXACT tie (student text features
    # == frozen teacher features elementwise), where the |x| subgradient is
    # implementation-defined (torch picks 0, jax picks 1) — a degenerate
    # point no real run ever revisits.  A different phrase breaks the tie.
    node.CTX_INIT = "a picture of a"
    node.PREC = "fp32"
    node.PROMPT_DEPTH_TEXT = 1
    node.PROMPT_DEPTH_VISION = 0
    node.TEXT_LOSS_WEIGHT = 25.0
    node.IMAGE_LOSS_WEIGHT = 10.0
    node.GPA_MEAN = 3  # centered on the 5-epoch run
    node.GPA_STD = 1
    node.USE_GPA = True
    cfg.TRAIN.CHECKPOINT_FREQ = 0
    cfg.freeze()

    design = {
        "trainer": "IVLP",
        "vision_depth": 0,
        "language_depth": 1,
        "vision_ctx": 0,
        "language_ctx": 4,
    }
    torch_model = _tiny_torch_clip(design, seed=21)
    batches = _batches(seed=7)

    # the reference VLPromptLearner builds its frozen teacher by re-calling
    # load_clip_to_cpu (which downloads weights) — serve plain-design clones
    # carrying the SAME random weights instead
    def fake_load_clip(cfg_, zero_shot_model=False):
        import_reference_clip()
        from clip.model import CLIP

        plain = CLIP(
            64, 32, 2, 128, 16, 77, 49408, 128, 2, 2,
            {
                "trainer": "IVLP",
                "vision_depth": 0,
                "language_depth": 0,
                "vision_ctx": 0,
                "language_ctx": 0,
            },
        )
        plain.load_state_dict(torch_model.state_dict(), strict=False)
        return plain.float()

    monkeypatch.setattr(ref_psrc, "load_clip_to_cpu", fake_load_clip)

    # ---- reference side
    model = ref_psrc.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            if "VPT" in name:
                p.requires_grad_(True)
            else:
                p.requires_grad_(False)
        elif "ZS_image_encoder" in name:
            p.requires_grad_(False)
    model.train()
    shim = _ref_trainer_shim(ref_psrc.PromptSRC, cfg, model, model)
    shim._models.clear(), shim._optims.clear(), shim._scheds.clear()
    shim.register_model("VLPromptLearner", model, shim.optim, shim.sched)
    shim.scaler = None
    shim.step_counter = 1
    shim.total_epochs = N_EPOCHS
    gauss_fn = shim.get_gauss(node.GPA_MEAN, node.GPA_STD)
    gauss = np.array([gauss_fn(a) for a in range(1, N_EPOCHS + 1)])
    shim.gauss = gauss / gauss.sum()
    shim.previous_model_gpa = None

    ref_losses, ref_ctx = [], []
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
            ref_ctx.append(model.prompt_learner.ctx.detach().numpy().copy())
    # after the final forward_backward the reference swapped in the GPA model
    ref_final_ctx = model.prompt_learner.ctx.detach().numpy().copy()

    # ---- fsvlm side
    import fsvlm_tpu.trainers.ivlp as our_ivlp

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_ivlp)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH
    assert set(trainer.params) == {"ctx"}
    np.testing.assert_allclose(np.asarray(trainer.gauss), shim.gauss, rtol=1e-6)

    our_losses, our_ctx = [], []

    def record(ep, bi, loss, params):
        our_losses.append(loss)
        our_ctx.append(np.asarray(params["ctx"]))

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
            record(ep, bi, float(metrics["loss"]), trainer.params)
        trainer.after_epoch()  # GPA accumulation (+ final swap-in)

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        if k == N_EPOCHS * STEPS_PER_EPOCH - 1:
            continue  # the reference swapped in the GPA aggregate INSIDE the
            # final forward_backward (promptsrc.py:349-353), so ref_ctx[-1]
            # is the aggregate, compared below
        np.testing.assert_allclose(
            our_ctx[k], ref_ctx[k], rtol=2e-3, atol=2e-5,
            err_msg=f"ctx diverged at step {k}",
        )
    # the Gaussian aggregate composed over all epochs must match too
    np.testing.assert_allclose(
        np.asarray(trainer.params["ctx"]), ref_final_ctx, rtol=2e-3, atol=2e-5,
        err_msg="GPA aggregate diverged",
    )


def test_plip_grad_penalty_trajectory_parity(tmp_path, monkeypatch):
    """Higher-order AD composition: the reference PLIP 'grad' mode computes
    a create_graph gradient-norm penalty (plip.py:269-279: d/dctx of CE,
    per-token L2 norms, mean((norm-K)^2)) and backpropagates through it.
    Drive the real PLIP.forward_backward N steps and assert our
    jax.grad-of-jax.value_and_grad step matches losses, penalties, and ctx
    step-for-step."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.plip as ref_plip

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "PLIP"
    node = cfg.TRAINER.PLIP
    node.N_CTX_TEXT = 4
    node.N_CTX_VISION = 0
    node.CTX_INIT = "a photo of a"
    node.PREC = "fp32"
    node.PROMPT_DEPTH_TEXT = 0
    node.PROMPT_DEPTH_VISION = 0
    node.REG_TYPE = "grad"
    node.K = 1
    node.REG_COEFF = 1.0  # large enough that the penalty shapes the path
    cfg.freeze()

    design = {
        "trainer": "IVLP",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 4,
    }
    torch_model = _tiny_torch_clip(design, seed=29)
    batches = _batches(seed=11)

    # ---- reference side
    model = ref_plip.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    model.train()
    shim = _ref_trainer_shim(ref_plip.PLIP, cfg, model, model.prompt_learner)

    # torch's flash-SDPA CPU kernel has no double-backward derivative; the
    # math backend does (and is what the penalty's create_graph path needs)
    from torch.nn.attention import SDPBackend, sdpa_kernel

    ref_losses, ref_pens, ref_ctx = [], [], []
    with sdpa_kernel(SDPBackend.MATH):
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
                ref_pens.append(summary["penalty"])
                ref_ctx.append(model.prompt_learner.ctx.detach().numpy().copy())

    # ---- fsvlm side
    import fsvlm_tpu.trainers.plip as our_plip

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_plip)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH
    assert set(trainer.params) == {"ctx"}

    our_losses, our_pens, our_ctx = [], [], []
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
            our_pens.append(float(metrics["penalty"]))
            our_ctx.append(np.asarray(trainer.params["ctx"]))

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        assert abs(our_pens[k] - ref_pens[k]) < 1e-3 * (
            1 + abs(ref_pens[k])
        ), f"penalty diverged at step {k}: {our_pens[k]} vs {ref_pens[k]}"
        np.testing.assert_allclose(
            our_ctx[k], ref_ctx[k], rtol=2e-3, atol=2e-5,
            err_msg=f"ctx diverged at step {k}",
        )


def test_coop_simclr_trajectory_parity(tmp_path, monkeypatch):
    """The fork's logit-space SimCLR aux loss (LogitsNTXentLoss,
    coop.py:66-128): drive the real CoOp.forward_backward in simclr mode
    (two explicit views, label ignored) and assert the loss and ctx
    trajectories match our nt_xent-based step — the (2N,2N-1) gather
    formulation and our masked logsumexp formulation are the same loss."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.coop as ref_coop

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 4
    cfg.TRAINER.COOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.TRAINER.COOP.CSC = False
    cfg.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    cfg.TRAINER.COOP.LOSS_TYPE = "simclr"
    cfg.freeze()

    design = {
        "trainer": "CoOp",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
    }
    torch_model = _tiny_torch_clip(design, seed=31)

    rng = np.random.RandomState(19)
    views = [
        (
            rng.randn(BATCH, 32, 32, 3).astype(np.float32),
            rng.randn(BATCH, 32, 32, 3).astype(np.float32),
        )
        for _ in range(N_EPOCHS * STEPS_PER_EPOCH)
    ]

    # ---- reference side
    model = ref_coop.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    model.train()
    shim = _ref_trainer_shim(ref_coop.CoOp, cfg, model, model.prompt_learner)

    ref_losses, ref_ctx = [], []
    for ep in range(N_EPOCHS):
        for bi in range(STEPS_PER_EPOCH):
            v1, v2 = views[ep * STEPS_PER_EPOCH + bi]
            shim.batch_idx = bi
            summary = shim.forward_backward(
                {
                    "img1": torch.from_numpy(v1.transpose(0, 3, 1, 2)),
                    "img2": torch.from_numpy(v2.transpose(0, 3, 1, 2)),
                    "label": torch.zeros(BATCH, dtype=torch.long),
                }
            )
            ref_losses.append(summary["loss"])
            ref_ctx.append(model.prompt_learner.ctx.detach().numpy().copy())

    # ---- fsvlm side
    import fsvlm_tpu.trainers.coop as our_coop

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_coop)

    our_losses, our_ctx = [], []
    for ep in range(N_EPOCHS):
        trainer.epoch = ep
        for bi in range(STEPS_PER_EPOCH):
            v1, v2 = views[ep * STEPS_PER_EPOCH + bi]
            batch = {
                "img": v1,
                "img2": v2,
                "label": np.zeros(BATCH, np.int32),
                "valid": np.ones(BATCH, bool),
            }
            trainer.batch_idx = bi
            metrics = trainer.forward_backward(batch)
            our_losses.append(float(metrics["loss"]))
            our_ctx.append(np.asarray(trainer.params["ctx"]))

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        np.testing.assert_allclose(
            our_ctx[k], ref_ctx[k], rtol=2e-3, atol=2e-5,
            err_msg=f"ctx diverged at step {k}",
        )


def test_lora_trajectory_parity(tmp_path, monkeypatch):
    """LoRA factor-update composition vs the REAL reference LoRA trainer
    (lora.py:354-396 forward_backward; utils/layers.py LinearLoRA with
    scaling alpha/sqrt(r), A kaiming-uniform / B zero).  Text-encoder LoRA
    on q/k/v, r=2, dropout 0, SCL weights 0 (pure CE): the A/B factor
    trajectories of every wrapped layer must match our stacked-factor
    x@A@B formulation step-for-step."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.lora as ref_lora

    # CPU no-ops for the unconditional .cuda() calls (lora.py:225-239)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=True
    )

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "LoRA"
    node = cfg.TRAINER.LORA
    node.ENCODER = "text"
    node.POSITION = "all"
    node.PARAMS = ["q", "k", "v"]
    node.R = 2
    node.ALPHA = 1
    node.DROPOUT_RATE = 0.0
    node.PREC = "fp32"
    node.N_CTX_TEXT = 2
    node.N_CTX_VISION = 0
    node.PROMPT_DEPTH_TEXT = 0
    node.PROMPT_DEPTH_VISION = 0
    node.CTX_INIT = "a photo of a"
    node.TEXT_LOSS_WEIGHT = 0.0
    node.IMAGE_LOSS_WEIGHT = 0.0
    node.LOGITS_LOSS_WEIGHT = 0.0
    cfg.freeze()

    design = {
        "trainer": "IVLP",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
    }
    torch_model = _tiny_torch_clip(design, seed=37)
    sd = {k: v.clone() for k, v in torch_model.state_dict().items()}
    batches = _batches(seed=23)

    # the reference loads TWO more frozen CLIP clones inside PromptLearner
    # (lora.py:225-226) — serve plain-design clones of the same weights
    def fake_load_clip(cfg_, zero_shot_model=False, use_lora=False):
        import_reference_clip()
        from clip.model import CLIP

        m = CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).float()
        m.load_state_dict(sd, strict=False)
        if use_lora:
            return m, ref_lora.apply_lora(cfg_, m)
        return m

    monkeypatch.setattr(ref_lora, "load_clip_to_cpu", fake_load_clip)

    # ---- reference side (mirror LoRA.build_model without data/download)
    from dassl.engine.trainer import TrainerBase
    from dassl.optim import build_lr_scheduler, build_optimizer

    clip_model, lora_layers = ref_lora.load_clip_to_cpu(
        cfg, zero_shot_model=True, use_lora=True
    )
    model = ref_lora.CustomCLIP(cfg, CLASSNAMES, clip_model)
    ref_lora.mark_only_lora_as_trainable(clip_model)
    model.train()
    assert len(lora_layers) == 2  # both text layers wrapped

    shim = ref_lora.LoRA.__new__(ref_lora.LoRA)
    TrainerBase.__init__(shim)
    shim.cfg = cfg
    shim.device = torch.device("cpu")
    shim.model = model
    shim.optim = build_optimizer(ref_lora.get_lora_parameters(model), cfg.OPTIM)
    shim.sched = build_lr_scheduler(shim.optim, cfg.OPTIM)
    shim.register_model("lora", model, shim.optim, shim.sched)
    shim.num_batches = STEPS_PER_EPOCH
    shim.epoch = 0

    def ref_factors():
        out = {}
        for li, layer in enumerate(lora_layers):
            for pname in ("q", "k", "v"):
                proj = getattr(layer, f"{pname}_proj")
                out[(li, pname)] = (
                    proj.w_lora_A.detach().numpy().copy(),
                    proj.w_lora_B.detach().numpy().copy(),
                )
        return out

    init_factors = ref_factors()

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
            ref_snaps.append(ref_factors())

    # ---- fsvlm side
    import jax.numpy as jnp

    import fsvlm_tpu.trainers.lora as our_lora

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_lora)
    assert set(trainer.params) == {"text"}
    # start from the reference's kaiming-init A (B is zero on both sides);
    # torch A is (r, D) applied as x @ A^T B^T, ours is (D, r) as x @ A @ B
    n_layers = 2
    for pname in ("q", "k", "v"):
        A = np.stack([init_factors[(li, pname)][0].T for li in range(n_layers)])
        B = np.stack([init_factors[(li, pname)][1].T for li in range(n_layers)])
        trainer.params["text"][pname] = (jnp.asarray(A), jnp.asarray(B))

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
                    (li, pname): (
                        np.asarray(trainer.params["text"][pname][0][li]).T,
                        np.asarray(trainer.params["text"][pname][1][li]).T,
                    )
                    for li in range(n_layers)
                    for pname in ("q", "k", "v")
                }
            )

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        for key in our_snaps[k]:
            for fi, name in ((0, "A"), (1, "B")):
                np.testing.assert_allclose(
                    our_snaps[k][key][fi],
                    ref_snaps[k][key][fi],
                    rtol=2e-3,
                    # fp32 CPU-backend noise on near-zero factor elements
                    # amplified by momentum; losses match to 1e-3 throughout
                    atol=1e-4,
                    err_msg=f"lora {name} {key} diverged at step {k}",
                )


def test_linear_probe_trajectory_parity(tmp_path, monkeypatch):
    """Linear probe on frozen CLIP features (linear_probe.py:150-171
    forward_backward: unnormalized encoder features -> nn.Linear -> CE):
    head weight/bias trajectories match our stop_gradient feature +
    feat@W+b step step-for-step."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import trainers.linear_probe as ref_lp

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "LinearProbeCLIP"
    cfg.TRAINER.LINEAR_PROBE.LOSS_TYPE = "ce"
    cfg.TRAINER.LINEAR_PROBE.USE_BIAS = True
    cfg.freeze()

    design = {
        "trainer": "CoOp",
        "vision_depth": 0,
        "language_depth": 0,
        "vision_ctx": 0,
        "language_ctx": 0,
    }
    torch_model = _tiny_torch_clip(design, seed=41)
    batches = _batches(seed=29)

    # ---- reference side (mirror build_model without data/download)
    from dassl.engine.trainer import TrainerBase
    from dassl.optim import build_lr_scheduler, build_optimizer

    shim = ref_lp.LinearProbeCLIP.__new__(ref_lp.LinearProbeCLIP)
    TrainerBase.__init__(shim)
    shim.cfg = cfg
    shim.device = torch.device("cpu")
    shim.image_encoder = torch_model.visual
    torch.manual_seed(5)
    head = torch.nn.Linear(64, N_CLS, bias=True)
    shim.linear_head = head
    shim.criterion = torch.nn.CrossEntropyLoss()
    shim.optim = build_optimizer(head, cfg.OPTIM)
    shim.sched = build_lr_scheduler(shim.optim, cfg.OPTIM)
    shim.register_model("linear_head", head, shim.optim, shim.sched)
    shim.num_batches = STEPS_PER_EPOCH
    shim.epoch = 0

    init_w = head.weight.detach().numpy().copy()
    init_b = head.bias.detach().numpy().copy()

    ref_losses, ref_w = [], []
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
            ref_w.append(
                (
                    head.weight.detach().numpy().copy(),
                    head.bias.detach().numpy().copy(),
                )
            )

    # ---- fsvlm side
    import jax.numpy as jnp

    import fsvlm_tpu.trainers.linear_probe as our_lp

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_lp)
    assert set(trainer.params) == {"w", "b"}
    trainer.params["w"] = jnp.asarray(init_w.T)
    trainer.params["b"] = jnp.asarray(init_b)

    our_losses, our_w = [], []

    def record(ep, bi, loss, params):
        our_losses.append(loss)
        our_w.append((np.asarray(params["w"]).T, np.asarray(params["b"])))

    _run_fsvlm_steps(trainer, batches, record)

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 5e-4 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        np.testing.assert_allclose(
            our_w[k][0], ref_w[k][0], rtol=2e-3, atol=2e-5,
            err_msg=f"head W diverged at step {k}",
        )
        np.testing.assert_allclose(
            our_w[k][1], ref_w[k][1], rtol=2e-3, atol=2e-5,
            err_msg=f"head b diverged at step {k}",
        )


def test_ivlp_trajectory_parity(tmp_path, monkeypatch):
    """N-step IVLP (non-KD, plain CE) trajectory vs the REAL reference
    trainer (independentVL.py:436-560 forward_backward, else-branch).

    Exercises the independent V-L prompt set end-to-end: first-layer text
    ctx splice + per-layer text VPT replacement (prefix/suffix re-cat,
    clip/model.py:243-252), first-layer vision tokens (visual.VPT,
    model.py:386,413-418) + per-layer vision VPT replacement — all four
    prompt leaves updating jointly under SGD+momentum+wd+staircase.
    (IVLP-KD stays non-comparable: its timm teacher head is randomly
    re-initialized — documented divergence.)"""
    import sys
    import types

    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    # the reference module imports timm at top-level for its (unused here)
    # KD teacher; stub it so the non-KD path stays importable offline
    monkeypatch.setitem(sys.modules, "timm", types.ModuleType("timm"))
    import trainers.independentVL as ref_ivlp

    # fp32-on-CPU oracle drive: no-op the reference's unconditional .half()
    # casts in the VPT splice paths (clip/model.py:238,249,414)
    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "half", lambda self, *a, **k: self, raising=True
    )
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=True
    )

    N_CTX_T, N_CTX_V, DEPTH = 4, 2, 2
    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "IVLP"
    cfg.TRAINER.IVLP.N_CTX_TEXT = N_CTX_T
    cfg.TRAINER.IVLP.N_CTX_VISION = N_CTX_V
    cfg.TRAINER.IVLP.CTX_INIT = "a photo of a"
    cfg.TRAINER.IVLP.PROMPT_DEPTH_TEXT = DEPTH
    cfg.TRAINER.IVLP.PROMPT_DEPTH_VISION = DEPTH
    cfg.TRAINER.IVLP.PREC = "fp32"
    # plain-CE mode: the trainer defaults (mirroring the reference's
    # train.py:154-156 extend_cfg) turn mixup+KD on; the reference side
    # here feeds plain batches, so test the else-branch both sides
    cfg.TRAINER.IVLP.USE_MIXUP = False
    cfg.TRAINER.IVLP.USE_KD = False
    cfg.freeze()

    design = {
        "trainer": "IVLP",
        "vision_depth": DEPTH,
        "language_depth": DEPTH,
        "vision_ctx": N_CTX_V,
        "language_ctx": N_CTX_T,
    }
    torch_model = _tiny_torch_clip(design, seed=9)
    batches = _batches(seed=5)

    # ---- reference side
    model = ref_ivlp.CustomCLIP(cfg, CLASSNAMES, torch_model)
    # exact build_model freeze rule (independentVL.py:380-388)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_("VPT" in name)
    model.train()

    shim = _ref_trainer_shim(ref_ivlp.IVLP, cfg, model, model)
    shim.use_kd = False
    shim.teacher = None
    shim.scaler = None

    txt_vpt = model.text_encoder.transformer.resblocks[1].VPT_shallow
    vis_vpt = model.image_encoder.transformer.resblocks[1].VPT_shallow

    def ref_snap():
        return {
            "ctx": model.prompt_learner.ctx.detach().numpy().copy(),
            "vpt_shallow": model.image_encoder.VPT.detach().numpy().copy(),
            "text_deep": txt_vpt.detach().numpy().copy(),
            "vision_deep": vis_vpt.detach().numpy().copy(),
        }

    init = ref_snap()

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
            ref_snaps.append(ref_snap())

    # ---- fsvlm side
    import jax.numpy as jnp

    import fsvlm_tpu.trainers.ivlp as our_ivlp

    trainer = _build_fsvlm_trainer(cfg, torch_model, monkeypatch, our_ivlp)
    assert set(trainer.params) == {"ctx", "text_deep", "vpt_shallow",
                                   "vision_deep"}
    # ctx derives from the shared token embedding -> identical by
    # construction; the random-init VPT leaves copy from the reference
    np.testing.assert_allclose(
        np.asarray(trainer.params["ctx"]), init["ctx"], rtol=1e-6, atol=1e-6)
    trainer.params["vpt_shallow"] = jnp.asarray(init["vpt_shallow"])
    trainer.params["text_deep"] = jnp.asarray(init["text_deep"][None])
    trainer.params["vision_deep"] = jnp.asarray(init["vision_deep"][None])

    our_losses, our_snaps = [], []

    def record(ep, bi, loss, params):
        our_losses.append(loss)
        our_snaps.append({
            "ctx": np.asarray(params["ctx"]),
            "vpt_shallow": np.asarray(params["vpt_shallow"]),
            "text_deep": np.asarray(params["text_deep"][0]),
            "vision_deep": np.asarray(params["vision_deep"][0]),
        })

    _run_fsvlm_steps(trainer, batches, record)

    for k in range(N_EPOCHS * STEPS_PER_EPOCH):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        for key in ("ctx", "vpt_shallow", "text_deep", "vision_deep"):
            np.testing.assert_allclose(
                our_snaps[k][key], ref_snaps[k][key], rtol=2e-3, atol=3e-5,
                err_msg=f"{key} diverged at step {k}")


def test_ivlp_partial_depth_forward_parity(monkeypatch):
    """Deep-splice FLAG PADDING: with prompt depth 2 over 4-layer towers,
    layers 2-3 must pass through un-spliced (_pad_deep's zero-pad rows +
    False flags, ivlp_family.py:58-67).  The trajectory test runs depth ==
    layers where the pad region is empty; this pins the partial-depth
    case the production configs use (depth 9 over 12 layers) against the
    reference's prompts_needed>i block construction (clip/model.py:345-352)."""
    import torch

    trainers_pkg = import_reference_trainers()  # noqa: F401
    import sys
    import types

    monkeypatch.setitem(sys.modules, "timm", types.ModuleType("timm"))
    import trainers.independentVL as ref_ivlp

    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "half", lambda self, *a, **k: self, raising=True
    )

    N_CTX_T, N_CTX_V, DEPTH, LAYERS = 4, 2, 2, 4
    cfg = _shared_cfg()
    cfg.TRAINER.NAME = "IVLP"
    cfg.TRAINER.IVLP.N_CTX_TEXT = N_CTX_T
    cfg.TRAINER.IVLP.N_CTX_VISION = N_CTX_V
    cfg.TRAINER.IVLP.CTX_INIT = "a photo of a"
    cfg.TRAINER.IVLP.PROMPT_DEPTH_TEXT = DEPTH
    cfg.TRAINER.IVLP.PROMPT_DEPTH_VISION = DEPTH
    cfg.TRAINER.IVLP.PREC = "fp32"
    cfg.freeze()

    import_reference_clip()
    from clip.model import CLIP

    design = {
        "trainer": "IVLP",
        "vision_depth": DEPTH,
        "language_depth": DEPTH,
        "vision_ctx": N_CTX_V,
        "language_ctx": N_CTX_T,
    }
    torch.manual_seed(17)
    tm = CLIP(64, 32, LAYERS, 128, 16, 77, 49408, 128, 2, LAYERS,
              design).float()
    tm.transformer.init = False
    tm.visual.transformer.init = False
    model = ref_ivlp.CustomCLIP(cfg, CLASSNAMES, tm)
    model.eval()

    rng = np.random.RandomState(19)
    imgs = rng.randn(4, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        prompts = model.prompt_learner()
        ref_txt = model.text_encoder(prompts, model.tokenized_prompts).numpy()
        ref_img = model.image_encoder(
            torch.from_numpy(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
        ).numpy()

    import jax.numpy as jnp

    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    from fsvlm_tpu.trainers.ivlp_family import (
        build_vlp_frozen,
        init_vlp_params,
        vlp_image_features,
        vlp_text_features,
    )

    params_clip, clip_cfg = clip_params_from_state_dict(dict(tm.state_dict()))
    assert clip_cfg.transformer_layers == LAYERS
    node = cfg.TRAINER.IVLP
    frozen, pc = build_vlp_frozen(
        cfg, node, params_clip, clip_cfg, CLASSNAMES, cfg.SEED)
    p = init_vlp_params(node, clip_cfg, pc, np.random.RandomState(1))
    p["ctx"] = jnp.asarray(model.prompt_learner.ctx.detach().numpy().copy())
    p["vpt_shallow"] = jnp.asarray(tm.visual.VPT.detach().numpy().copy())
    p["text_deep"] = jnp.asarray(
        tm.transformer.resblocks[1].VPT_shallow.detach().numpy().copy()[None])
    p["vision_deep"] = jnp.asarray(
        tm.visual.transformer.resblocks[1]
        .VPT_shallow.detach().numpy().copy()[None])
    # depth 2 of 4: only layer 1 carries a prompt on either side
    assert not hasattr(tm.transformer.resblocks[2], "VPT_shallow")
    assert not hasattr(tm.transformer.resblocks[3], "VPT_shallow")

    our_txt = np.asarray(vlp_text_features(p, frozen, clip_cfg, jnp.float32))
    our_img = np.asarray(
        vlp_image_features(p, frozen, clip_cfg, jnp.asarray(imgs), jnp.float32))
    np.testing.assert_allclose(our_txt, ref_txt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(our_img, ref_img, rtol=1e-4, atol=1e-5)

#!/usr/bin/env python
"""Generate the committed golden pack (tests/golden_pack/*.npz).

Parity evidence otherwise requires the read-only reference checkout + torch
at test time (tests/reference_oracle.py).  This tool — run once on a box
that HAS the checkout — freezes the oracle surfaces listed below into small
committed artifacts so the proof survives the reference's removal
(tests/test_golden_pack.py replays them with zero reference dependency):

  tokenizer.npz          ids from the reference SimpleTokenizer/clip.tokenize
                         for the shared TEXTS list
  text_tower_blocks.npz  per-block activations of a seeded tiny reference
                         CLIP text tower (saved_features, clip/model.py:340)
                         + the torch state dict that produced them
  vision_tower_blocks.npz per-block activations + final image features of a
                         seeded tiny reference ViT tower (encode_image,
                         clip/model.py:401-431) + the converted params
  coop_trajectory.npz    10-step CoOp trace driven through the REAL reference
                         forward_backward (coop.py:437-459) + dassl optim:
                         losses, ctx trajectory, and the shared weights
  promptsrc_trajectory.npz 10-step PromptSRC trace through the REAL reference
                         forward_backward + GPA aggregation
                         (promptsrc.py:285-353): losses, ctx trajectory,
                         final GPA aggregate, gauss weights, shared weights
  rn_tower.npz           stem/stage activations + attention-pooled features
                         of a seeded tiny reference ModifiedResNet
                         (clip/model.py:56-150) + the converted params
  cocoop_trajectory.npz  8-step CoCoOp trace through the REAL reference
                         forward_backward (cocoop.py:247-255 per-image
                         loops): losses, ctx + meta-net trajectories,
                         meta-net init, shared weights — the replay pins
                         the batched fsvlm reformulation
  dann_trajectory.npz    8-step DANN trace through the REAL Dassl
                         forward_backward (dassl/engine/da/dann.py): losses,
                         net/critic weight + critic-BN-state trajectories
  vit_full_shape.npz     FULL-SHAPE ViT-B/16 @ 224^2 per-block goldens
                         (sub-sampled fp16 + moments; weights regenerated
                         from seeds via golden_pack_common +
                         export_openai_state_dict) + dense features/logits
  rn50_full_shape.npz    FULL-SHAPE RN50 @ 224^2 per-stage goldens + the
                         7x7 attention-pooled features, same compression
  zoo/<trainer>.npz      EVERY zoo trainer's reference trajectory (inits,
                         per-step metrics, fp16 weight snapshots), staged
                         by the live parity suite itself (ZOO_PACK_STAGE)

Usage:  python tools/make_golden_pack.py   (writes tests/golden_pack/)
        python tools/make_golden_pack.py full_shape_vit full_shape_rn ...
                                           (regenerate selected packs)
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402

OUT_DIR = os.path.join(ROOT, "tests", "golden_pack")


def make_tokenizer_pack():
    from reference_oracle import import_reference_clip
    from test_tokenizer import TEXTS

    clip = import_reference_clip()
    from clip.simple_tokenizer import SimpleTokenizer

    ref = SimpleTokenizer()
    texts = [t for t in TEXTS if t]
    arrays = {"tokenize_ids": clip.tokenize(texts).numpy().astype(np.int32)}
    for i, t in enumerate(texts):
        arrays[f"encode_{i}"] = np.asarray(ref.encode(t), np.int32)
    arrays["n_texts"] = np.asarray(len(texts), np.int32)
    np.savez_compressed(os.path.join(OUT_DIR, "tokenizer.npz"), **arrays)
    print(f"tokenizer.npz: {len(texts)} texts")


def make_text_tower_pack():
    """Same construction as test_per_block_goldens.py (torch seed 3)."""
    import torch

    from reference_oracle import import_reference_clip

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip.tokenizer import tokenize

    torch.manual_seed(3)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = CLIP(64, 32, 4, 128, 16, 77, 49408, 128, 2, 4, design).eval()

    ids = tokenize(["a photo of a cat.", "itap of a dog."])
    with torch.no_grad():
        x = model.token_embedding(torch.from_numpy(ids).long())
        emb = x.numpy()
        x = (x + model.positional_embedding).permute(1, 0, 2)
        model.transformer(x)
    goldens = np.stack(
        [f.permute(1, 0, 2).numpy() for f in model.transformer.saved_features]
    )

    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))
    arrays = {
        "ids": ids,
        "emb": emb,
        "block_outputs": goldens,
        "positional_embedding": params["text"]["positional_embedding"],
        "n_heads": np.asarray(cfg.transformer_heads, np.int32),
    }
    # only the converted text blocks (the test replays from `emb`; the
    # visual tower and 49408-row token embedding would 5x the artifact)
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(
        params["text"]["blocks"])
    for path, leaf in flat:
        key = "/".join(p.key for p in path)
        arrays[f"blk.{key}"] = np.asarray(leaf)
    np.savez_compressed(
        os.path.join(OUT_DIR, "text_tower_blocks.npz"), **arrays)
    print(f"text_tower_blocks.npz: {goldens.shape[0]} blocks")


def make_vision_tower_pack():
    """Tiny reference ViT tower (clip/model.py:401-431): per-block
    activations via the saved_features hook + final encode_image features,
    with the CONVERTED visual params committed alongside so the replay has
    zero reference/torch dependency."""
    import torch

    from reference_oracle import import_reference_clip

    import_reference_clip()
    from clip.model import CLIP

    torch.manual_seed(5)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = CLIP(64, 32, 4, 128, 16, 77, 49408, 128, 2, 4, design).eval()

    rng = np.random.RandomState(13)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        feats = model.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    goldens = np.stack(
        [f.permute(1, 0, 2).numpy()
         for f in model.visual.transformer.saved_features])

    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))
    arrays = {
        "images": imgs,
        "block_outputs": goldens,
        "image_features": feats,
        "n_heads": np.asarray(cfg.vision_heads, np.int32),
    }
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params["visual"])
    for path, leaf in flat:
        key = "/".join(p.key for p in path)
        arrays[f"vis.{key}"] = np.asarray(leaf)
    np.savez_compressed(
        os.path.join(OUT_DIR, "vision_tower_blocks.npz"), **arrays)
    print(f"vision_tower_blocks.npz: {goldens.shape[0]} blocks")


def make_rn_tower_pack():
    """Tiny reference ModifiedResNet tower (clip/model.py:93-150) incl. the
    QKV attention pool (:56-92): stem/stage activations + final pooled
    features, with the converted visual params committed alongside.  96²
    input -> 3×3 attnpool grid (10 positions with CLS)."""
    import torch

    from reference_oracle import import_reference_clip

    import_reference_clip()
    from clip.model import CLIP

    torch.manual_seed(7)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = CLIP(64, 96, (1, 1, 1, 1), 16, None, 77, 49408, 64, 2, 2,
                 design).eval()

    rng = np.random.RandomState(17)
    imgs = rng.randn(2, 96, 96, 3).astype(np.float32)

    acts = {}

    def hook(name):
        def fn(mod, inp, out):
            acts[name] = out.detach().numpy()
        return fn

    for name in ["avgpool", "layer1", "layer2", "layer3", "layer4"]:
        getattr(model.visual, name).register_forward_hook(hook(name))
    with torch.no_grad():
        feats = model.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()

    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    params, cfg = clip_params_from_state_dict(dict(model.state_dict()))
    assert not cfg.is_vit

    arrays = {"images": imgs, "image_features": feats,
              "n_heads": np.asarray(cfg.vision_heads, np.int32)}
    for name, a in acts.items():
        # NCHW -> NHWC to match our layout
        arrays[f"act.{name}"] = a.transpose(0, 2, 3, 1)
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params["visual"])
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path)
        arrays[f"vis.{key}"] = np.asarray(leaf)
    np.savez_compressed(os.path.join(OUT_DIR, "rn_tower.npz"), **arrays)
    print(f"rn_tower.npz: {len(acts)} stage activations")


def make_coop_trajectory_pack():
    """The ce variant of test_coop_trajectory_parity's reference side."""
    import torch

    from reference_oracle import import_reference_trainers
    from test_trajectory_parity import (
        CLASSNAMES,
        N_EPOCHS,
        STEPS_PER_EPOCH,
        _batches,
        _ref_trainer_shim,
        _shared_cfg,
        _tiny_torch_clip,
    )

    import_reference_trainers()
    import trainers.coop as ref_coop

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = "/tmp/golden_pack_coop"
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 4
    cfg.TRAINER.COOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.TRAINER.COOP.CSC = False
    cfg.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    cfg.TRAINER.COOP.LOSS_TYPE = "ce"
    cfg.freeze()

    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    torch_model = _tiny_torch_clip(design)
    batches = _batches()

    model = ref_coop.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_(False)
    model.train()
    shim = _ref_trainer_shim(ref_coop.CoOp, cfg, model, model.prompt_learner)

    losses, ctxs = [], []
    for ep in range(N_EPOCHS):
        for bi in range(STEPS_PER_EPOCH):
            imgs, labels = batches[ep * STEPS_PER_EPOCH + bi]
            shim.batch_idx = bi
            summary = shim.forward_backward({
                "img": torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                "label": torch.from_numpy(labels),
            })
            losses.append(summary["loss"])
            ctxs.append(model.prompt_learner.ctx.detach().numpy().copy())

    arrays = {
        "losses": np.asarray(losses, np.float64),
        "ctx": np.stack(ctxs),
    }
    for k, v in torch_model.state_dict().items():
        arrays[f"sd.{k}"] = v.numpy()
    # sparsify the 49408-row token embedding: the replay only reads the
    # rows of the prompt/classname tokens (build_prompt_context), so every
    # other row compresses to nothing as zeros
    from fsvlm_tpu.models.clip.tokenizer import tokenize as our_tokenize

    used = np.unique(our_tokenize(
        [f"a photo of a {c}." for c in CLASSNAMES] + ["a photo of a"]))
    emb = arrays["sd.token_embedding.weight"]
    sparse = np.zeros_like(emb)
    sparse[used] = emb[used]
    arrays["sd.token_embedding.weight"] = sparse
    np.savez_compressed(
        os.path.join(OUT_DIR, "coop_trajectory.npz"), **arrays)
    print(f"coop_trajectory.npz: {len(losses)} steps, "
          f"{used.size} token rows kept")


def make_promptsrc_trajectory_pack():
    """The reference side of test_trajectory_parity.py::
    test_promptsrc_trajectory_and_gpa_parity, frozen: 10 steps / 5 epochs of
    the REAL PromptSRC.forward_backward (CE + 3 SCL losses -> SGD -> lr
    staircase -> per-epoch GPA accumulation -> final GPA swap-in,
    promptsrc.py:285-353)."""
    import torch

    from reference_oracle import (
        import_reference_clip,
        import_reference_trainers,
    )
    from test_trajectory_parity import (
        CLASSNAMES,
        N_EPOCHS,
        STEPS_PER_EPOCH,
        _batches,
        _ref_trainer_shim,
        _shared_cfg,
        _tiny_torch_clip,
    )

    import_reference_trainers()
    import trainers.promptsrc as ref_psrc

    # CPU-compat no-ops: promptsrc.py calls .cuda()/.half() unconditionally
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.half = lambda self, *a, **k: self

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = "/tmp/golden_pack_promptsrc"
    cfg.TRAINER.NAME = "PromptSRC"
    node = cfg.TRAINER.PROMPTSRC
    node.N_CTX_TEXT = 4
    node.N_CTX_VISION = 0
    node.CTX_INIT = "a picture of a"  # breaks the SCL L1 tie (see the test)
    node.PREC = "fp32"
    node.PROMPT_DEPTH_TEXT = 1
    node.PROMPT_DEPTH_VISION = 0
    node.TEXT_LOSS_WEIGHT = 25.0
    node.IMAGE_LOSS_WEIGHT = 10.0
    node.GPA_MEAN = 3
    node.GPA_STD = 1
    node.USE_GPA = True
    cfg.TRAIN.CHECKPOINT_FREQ = 0
    cfg.freeze()

    design = {"trainer": "IVLP", "vision_depth": 0, "language_depth": 1,
              "vision_ctx": 0, "language_ctx": 4}
    torch_model = _tiny_torch_clip(design, seed=21)
    batches = _batches(seed=7)
    sd0 = {k: v.numpy().copy() for k, v in torch_model.state_dict().items()}

    def fake_load_clip(cfg_, zero_shot_model=False):
        import_reference_clip()
        from clip.model import CLIP

        plain = CLIP(
            64, 32, 2, 128, 16, 77, 49408, 128, 2, 2,
            {"trainer": "IVLP", "vision_depth": 0, "language_depth": 0,
             "vision_ctx": 0, "language_ctx": 0})
        plain.load_state_dict(torch_model.state_dict(), strict=False)
        return plain.float()

    ref_psrc.load_clip_to_cpu = fake_load_clip

    model = ref_psrc.CustomCLIP(cfg, CLASSNAMES, torch_model)
    for name, p in model.named_parameters():
        if "prompt_learner" not in name:
            p.requires_grad_("VPT" in name)
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

    losses, ctxs = [], []
    for ep in range(N_EPOCHS):
        for bi in range(STEPS_PER_EPOCH):
            imgs, labels = batches[ep * STEPS_PER_EPOCH + bi]
            shim.batch_idx = bi
            summary = shim.forward_backward({
                "img": torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                "label": torch.from_numpy(labels),
            })
            losses.append(summary["loss"])
            ctxs.append(model.prompt_learner.ctx.detach().numpy().copy())
    final_ctx = model.prompt_learner.ctx.detach().numpy().copy()

    arrays = {
        "losses": np.asarray(losses, np.float64),
        "ctx": np.stack(ctxs),
        "final_ctx": final_ctx,
        "gauss": np.asarray(shim.gauss, np.float64),
    }
    for k, v in sd0.items():
        arrays[f"sd.{k}"] = v
    # sparsify the 49408-row token embedding to the rows the replay reads:
    # the learner's "a picture of a {name}." prompts + ctx init, and the
    # frozen teacher's "a photo of a {name}." template (promptsrc.py:115-127)
    from fsvlm_tpu.models.clip.tokenizer import tokenize as our_tokenize

    used = np.unique(our_tokenize(
        [f"a picture of a {c}." for c in CLASSNAMES]
        + [f"a photo of a {c}." for c in CLASSNAMES]
        + ["a picture of a", "a photo of a"]))
    emb = arrays["sd.token_embedding.weight"]
    sparse = np.zeros_like(emb)
    sparse[used] = emb[used]
    arrays["sd.token_embedding.weight"] = sparse
    np.savez_compressed(
        os.path.join(OUT_DIR, "promptsrc_trajectory.npz"), **arrays)
    print(f"promptsrc_trajectory.npz: {len(losses)} steps, "
          f"{used.size} token rows kept")


def make_cocoop_trajectory_pack():
    """The reference side of test_cocoop_trajectory_parity.py, frozen:
    8 steps / 4 epochs of the REAL reference CoCoOp.forward_backward
    (PromptSRC/trainers/cocoop.py:247-255 per-image text-encoder loop)
    + dassl SGD/cosine stack — losses, ctx AND meta-net weight
    trajectories, the random meta-net init, and the shared tiny CLIP
    weights.  The replay proves the batched fsvlm reformulation (one
    meta-net matmul + vmapped text forward) stays step-for-step identical
    to the reference's loop formulation with zero reference dependency."""
    from test_cocoop_trajectory_parity import (
        CLASSNAMES,
        _cocoop_cfg,
        _ref_cocoop_drive,
        _tiny_cocoop_torch_clip,
    )

    torch_model = _tiny_cocoop_torch_clip()
    sd0 = {k: v.numpy().copy() for k, v in torch_model.state_dict().items()}
    cfg = _cocoop_cfg("/tmp/golden_pack_cocoop")

    init, losses, snaps = _ref_cocoop_drive(cfg, torch_model)

    arrays = {
        "losses": np.asarray(losses, np.float64),
        "ctx": np.stack([s["ctx"] for s in snaps]),
        "w1": np.stack([s["w1"] for s in snaps]),
        "w2": np.stack([s["w2"] for s in snaps]),
        "init_ctx": init["ctx"],
        "init_w1": init["w1"],
        "init_b1": init["b1"],
        "init_w2": init["w2"],
        "init_b2": init["b2"],
    }
    for k, v in sd0.items():
        arrays[f"sd.{k}"] = v
    # sparsify the 49408-row token embedding to the rows the replay reads
    # (the learner's prompts + ctx init)
    from fsvlm_tpu.models.clip.tokenizer import tokenize as our_tokenize

    used = np.unique(our_tokenize(
        [f"a photo of a {c}." for c in CLASSNAMES] + ["a photo of a"]))
    emb = arrays["sd.token_embedding.weight"]
    sparse = np.zeros_like(emb)
    sparse[used] = emb[used]
    arrays["sd.token_embedding.weight"] = sparse
    np.savez_compressed(
        os.path.join(OUT_DIR, "cocoop_trajectory.npz"), **arrays)
    print(f"cocoop_trajectory.npz: {len(losses)} steps, "
          f"{used.size} token rows kept")


def _flatten_into(arrays, prefix, tree):
    for k, v in tree.items():
        if isinstance(v, dict):
            _flatten_into(arrays, f"{prefix}{k}/", v)
        else:
            arrays[f"{prefix}{k}"] = np.asarray(v)


def make_dann_trajectory_pack():
    """The reference side of test_zoo_trajectory_parity.py::
    test_dann_trajectory_parity, frozen: 8 steps / 4 epochs of the REAL
    Dassl DANN.forward_backward (dassl/engine/da/dann.py: CE + BCE domain
    loss on gradient-reversed features with the lambda ramp, net + critic
    optimizers, critic BatchNorm batch stats) — extends the standalone pack
    to the Dassl zoo half of the framework."""
    import torch
    import torch.nn as nn

    from reference_oracle import import_reference_trainers
    from test_zoo_trajectory_parity import (
        BU,
        BX,
        FDIM,
        N_CLS,
        N_EPOCHS,
        STEPS_PER_EPOCH,
        _base_shim,
        _batches,
        _convert_critic,
        _convert_net,
        _ref_simplenet,
        _torch_batch,
        _zoo_cfg,
    )

    import_reference_trainers()
    from dassl.engine.da.dann import DANN as RefDANN
    from dassl.modeling import build_head
    from dassl.modeling.ops import ReverseGrad
    from dassl.optim import build_lr_scheduler, build_optimizer

    import pathlib

    cfg = _zoo_cfg(pathlib.Path("/tmp/golden_pack_dann"),
                   **{"DATASET.TARGET_DOMAINS": ["d2"],
                      "DATALOADER.TRAIN_U.SAME_AS_X": False})
    cfg.TRAINER.NAME = "DANN"
    cfg.freeze()

    model = _ref_simplenet(cfg, N_CLS)
    torch.manual_seed(17)
    critic_body = build_head(
        "mlp", verbose=False, in_features=FDIM,
        hidden_layers=[FDIM, FDIM], activation="leaky_relu",
    )
    critic = nn.Sequential(critic_body, nn.Linear(FDIM, 1)).float()
    init_net = _convert_net(model, N_CLS)
    init_critic, init_cstate = _convert_critic(critic)

    n_steps = N_EPOCHS * STEPS_PER_EPOCH
    bx_batches = _batches(n_steps, BX, seed=5)
    bu_batches = _batches(n_steps, BU, seed=6)

    shim = _base_shim(RefDANN, cfg, model)
    shim.critic = critic
    shim.optim_c = build_optimizer(critic, cfg.OPTIM)
    shim.sched_c = build_lr_scheduler(shim.optim_c, cfg.OPTIM)
    shim.register_model("critic", critic, shim.optim_c, shim.sched_c)
    shim.revgrad = ReverseGrad()
    shim.ce = nn.CrossEntropyLoss()
    shim.bce = nn.BCEWithLogitsLoss()

    loss_x, loss_d = [], []
    snaps = {k: [] for k in ("conv0", "cls_w", "critic_fc0", "critic_bn0_scale",
                             "critic_out", "bn0_mean", "bn0_var")}
    for ep in range(N_EPOCHS):
        shim.epoch = ep
        for bi in range(STEPS_PER_EPOCH):
            k = ep * STEPS_PER_EPOCH + bi
            shim.batch_idx = bi
            out = shim.forward_backward(
                _torch_batch(*bx_batches[k]), _torch_batch(*bu_batches[k]))
            loss_x.append(out["loss_x"])
            loss_d.append(out["loss_d"])
            net = _convert_net(model, N_CLS)
            cp, cs = _convert_critic(critic)
            snaps["conv0"].append(net["backbone"]["conv0"]["w"])
            snaps["cls_w"].append(net["classifier"]["w"])
            snaps["critic_fc0"].append(cp["fc0"]["w"])
            snaps["critic_bn0_scale"].append(cp["bn0"]["scale"])
            snaps["critic_out"].append(cp["out"]["w"])
            snaps["bn0_mean"].append(cs["bn0"]["mean"])
            snaps["bn0_var"].append(cs["bn0"]["var"])

    arrays = {
        "loss_x": np.asarray(loss_x, np.float64),
        "loss_d": np.asarray(loss_d, np.float64),
    }
    for k, v in snaps.items():
        arrays[f"ref.{k}"] = np.stack(v)
    _flatten_into(arrays, "init_net.", init_net)
    _flatten_into(arrays, "init_critic.", init_critic)
    _flatten_into(arrays, "init_cstate.", init_cstate)
    np.savez_compressed(
        os.path.join(OUT_DIR, "dann_trajectory.npz"), **arrays)
    print(f"dann_trajectory.npz: {n_steps} steps")


def _reference_clip_from_params(params, cfg):
    """Instantiate the reference torch CLIP at cfg's shape and load OUR
    deterministically-regenerable weights into it (export_openai_state_dict
    -> load_state_dict(strict=True)) — full-shape goldens without
    committing the weights (golden_pack_common: seeds are the source)."""
    import torch

    from reference_oracle import import_reference_clip

    import_reference_clip()
    from clip.model import CLIP

    from fsvlm_tpu.models.clip.convert import export_openai_state_dict

    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = CLIP(
        embed_dim=cfg.embed_dim,
        image_resolution=cfg.image_resolution,
        vision_layers=cfg.vision_layers,
        vision_width=cfg.vision_width,
        vision_patch_size=cfg.vision_patch_size,
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        transformer_width=cfg.transformer_width,
        transformer_heads=cfg.transformer_heads,
        transformer_layers=cfg.transformer_layers,
        design_details=design,
    ).float().eval()
    sd = export_openai_state_dict(params, cfg)
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    return model


def make_full_shape_vit_pack():
    """ViT-B/16 @ 224^2 per-block goldens, compressed (sub-sampled fp16 +
    moments, golden_pack_common.subsample) — the full-shape machinery the
    tiny packs don't reach: 14x14 patch grid, 197-token pos-emb
    (reference clip/model.py:370-431)."""
    import torch

    import golden_pack_common as C

    from fsvlm_tpu.models.clip.tokenizer import tokenize

    params, cfg = C.full_shape_vit_params()
    model = _reference_clip_from_params(params, cfg)

    imgs = C.golden_images(2, C.IMAGES_SEED_VIT)
    ids = tokenize(C.PROMPTS)
    with torch.no_grad():
        imf = model.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    vis_blocks = [f.permute(1, 0, 2).numpy()
                  for f in model.visual.transformer.saved_features]
    assert len(vis_blocks) == 12 and vis_blocks[0].shape == (2, 197, 768)

    with torch.no_grad():
        txf = model.encode_text(torch.from_numpy(ids).long()).numpy()
        logits, _ = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(ids).long(),
        )
    text_blocks = [f.permute(1, 0, 2).numpy()
                   for f in model.transformer.saved_features]
    assert len(text_blocks) == 12 and text_blocks[0].shape == (3, 77, 512)

    rng = np.random.RandomState(0)
    arrays = {"ids": ids.astype(np.int32)}
    for i, blk in enumerate(vis_blocks):
        arrays.update(C.subsample(f"vis_block_{i}", blk, rng))
    for i, blk in enumerate(text_blocks):
        arrays.update(C.subsample(f"text_block_{i}", blk, rng))
    # the final surfaces are small — store dense
    arrays["image_features"] = imf.astype(np.float32)
    arrays["text_features"] = txf.astype(np.float32)
    arrays["logits_per_image"] = logits.numpy().astype(np.float32)
    np.savez_compressed(
        os.path.join(OUT_DIR, "vit_full_shape.npz"), **arrays)
    print(f"vit_full_shape.npz: 24 sub-sampled blocks "
          f"(k={C.SUBSAMPLE_K}) + dense features/logits")


def make_full_shape_rn_pack():
    """RN50 @ 224^2 goldens: per-stage outputs (forward hooks on
    layer1..4) + the 7x7 attention pool's pooled features (reference
    clip/model.py:56-150), compressed like the ViT pack.  Weights are the
    BN-perturbed non-degenerate construction (golden_pack_common)."""
    import torch

    import golden_pack_common as C

    params, cfg = C.full_shape_rn50_params()
    model = _reference_clip_from_params(params, cfg)

    imgs = C.golden_images(2, C.IMAGES_SEED_RN)
    stages = {}
    hooks = [
        getattr(model.visual, f"layer{i}").register_forward_hook(
            lambda m, inp, out, i=i: stages.__setitem__(
                f"stage{i}", out.detach().numpy()))
        for i in (1, 2, 3, 4)
    ]
    with torch.no_grad():
        feat = model.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    for h in hooks:
        h.remove()
    assert stages["stage4"].shape == (2, 2048, 7, 7), stages["stage4"].shape

    rng = np.random.RandomState(0)
    arrays = {}
    for i in (1, 2, 3, 4):
        # torch NCHW -> our NHWC layout for comparison
        arrays.update(C.subsample(
            f"stage{i}", stages[f"stage{i}"].transpose(0, 2, 3, 1), rng))
    arrays["image_features"] = feat.astype(np.float32)
    np.savez_compressed(
        os.path.join(OUT_DIR, "rn50_full_shape.npz"), **arrays)
    print(f"rn50_full_shape.npz: 4 sub-sampled stages (k={C.SUBSAMPLE_K})"
          f" + dense pooled features")


def make_zoo_trajectory_packs():
    """Freeze ALL zoo trainers' reference trajectories (inits + per-step
    metrics + weight snapshots) into tests/golden_pack/zoo/*.npz by
    running the live parity suite with ZOO_PACK_STAGE set — the tests'
    own builders ARE the generators (test_zoo_trajectory_parity.ref_trace),
    so the pack can never drift from what the tests assert."""
    import subprocess

    stage = os.path.join(OUT_DIR, "zoo")
    env = dict(os.environ)
    env["ZOO_PACK_STAGE"] = stage
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(ROOT, "tests", "test_zoo_trajectory_parity.py"),
         "-q", "-p", "no:cacheprovider"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"zoo trajectory suite failed during staging:\n"
            f"{proc.stdout[-3000:]}")
    n = len([f for f in os.listdir(stage) if f.endswith(".npz")])
    print(f"zoo/: {n} trajectory traces staged via the live suite")


MAKERS = {
    "tokenizer": make_tokenizer_pack,
    "text_tower": make_text_tower_pack,
    "vision_tower": make_vision_tower_pack,
    "rn_tower": make_rn_tower_pack,
    "coop": make_coop_trajectory_pack,
    "promptsrc": make_promptsrc_trajectory_pack,
    "cocoop": make_cocoop_trajectory_pack,
    "dann": make_dann_trajectory_pack,
    "full_shape_vit": make_full_shape_vit_pack,
    "full_shape_rn": make_full_shape_rn_pack,
    "zoo": make_zoo_trajectory_packs,
}


def main():
    from reference_oracle import reference_available

    if not reference_available():
        raise SystemExit("reference checkout not available; nothing to do")
    os.makedirs(OUT_DIR, exist_ok=True)
    selected = sys.argv[1:] or list(MAKERS)
    unknown = [s for s in selected if s not in MAKERS]
    if unknown:
        raise SystemExit(f"unknown packs {unknown}; choose from {list(MAKERS)}")
    for name in selected:
        MAKERS[name]()
    for f in sorted(os.listdir(OUT_DIR)):
        p = os.path.join(OUT_DIR, f)
        print(f"  {f}: {os.path.getsize(p) / 1e3:.1f} kB")


if __name__ == "__main__":
    main()

"""Importing reference-trained torch prompt checkpoints.

Drives the REAL reference modules to produce dassl-format checkpoints
(``{"state_dict", "epoch", "val_result"}`` torch pickles, exactly what
`save_checkpoint` writes — torchtools.py:27-74 — and what the published
PromptSRC/MaPLe model zoos ship), then proves the importer maps every prompt
leaf onto the fsvlm pytree: by tensor equality for every family, and for
MaPLe end-to-end — imported checkpoint -> trainer.load_model -> eval logits
matching the reference model's own eval forward.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from reference_oracle import (
    import_reference_clip,
    import_reference_trainers,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CLS = 8  # the Synthetic dataset's class count (classnames must line up)
CLASSNAMES = [f"synthetic class {i}" for i in range(N_CLS)]


def _base_cfg(tmp_path, trainer):
    from fsvlm_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.MODEL.BACKBONE.NAME = "test-tiny"
    cfg.MODEL.TEXT_TRUNCATE = False
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.DATALOADER.DEVICE_AUG = False
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TEST.NO_TEST = True
    cfg.TRAIN.PRINT_FREQ = 1000
    cfg.TRAINER.NAME = trainer
    return cfg


def _no_half_cuda(monkeypatch):
    import torch

    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "half", lambda self, *a, **k: self,
                        raising=True)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self,
                        raising=True)


def test_import_maple_full_chain(tmp_path, monkeypatch):
    """Reference MaPLe checkpoint -> tools/import_torch_prompts.py ->
    trainer.load_model -> eval logits match the reference model."""
    import torch

    import_reference_trainers()
    import trainers.maple as ref_maple

    _no_half_cuda(monkeypatch)

    cfg = _base_cfg(tmp_path, "MaPLe")
    cfg.TRAINER.MAPLE.N_CTX = 2
    cfg.TRAINER.MAPLE.CTX_INIT = "a photo of a"
    cfg.TRAINER.MAPLE.PREC = "fp32"
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 2
    cfg.freeze()

    import_reference_clip()
    from clip.model import CLIP

    # the reference learner hardcodes 512/768 widths (maple.py:144-156)
    design = {"trainer": "MaPLe", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0, "maple_length": 2}
    torch.manual_seed(23)
    torch_model = CLIP(64, 32, 2, 768, 16, 77, 49408, 512, 8, 2, design).float()
    torch_model.transformer.init = False
    torch_model.visual.transformer.init = False

    model = ref_maple.CustomCLIP(cfg, CLASSNAMES, torch_model).eval()

    # dassl checkpoint format: the WHOLE CustomCLIP state dict (maple.py:301)
    ckpt_path = tmp_path / "model.pth.tar-5"
    torch.save(
        {"state_dict": model.state_dict(), "epoch": 5, "val_result": 88.8},
        ckpt_path,
    )

    out_dir = tmp_path / "imported"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "import_torch_prompts.py"),
         str(ckpt_path), "--trainer", "MaPLe", "--output-dir", str(out_dir),
         "--best"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert os.path.exists(out_dir / "MultiModalPromptLearner" / "model.pkl-5")
    assert os.path.exists(out_dir / "MultiModalPromptLearner" / "model-best.pkl")

    # leaf-level mapping
    from fsvlm_tpu.trainers.import_torch import import_torch_checkpoint

    params, epoch, val = import_torch_checkpoint(str(ckpt_path), "MaPLe")
    assert epoch == 5 and val == 88.8
    learner = model.prompt_learner
    np.testing.assert_array_equal(params["ctx"], learner.ctx.detach().numpy())
    np.testing.assert_array_equal(
        params["proj"]["w"], learner.proj.weight.detach().numpy().T
    )
    np.testing.assert_array_equal(
        params["compound_text"][0],
        learner.compound_prompts_text[0].detach().numpy(),
    )
    np.testing.assert_array_equal(
        params["compound_proj"]["w"][0],
        learner.compound_prompt_projections[0].weight.detach().numpy().T,
    )

    # full chain: our trainer loads the imported checkpoint and reproduces
    # the reference model's eval logits on the same pixels
    from fsvlm_tpu.engine import build_trainer
    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    import fsvlm_tpu.trainers  # noqa: F401
    import fsvlm_tpu.trainers.maple as our_maple

    clip_params, clip_cfg = clip_params_from_state_dict(
        dict(torch_model.state_dict())
    )
    monkeypatch.setattr(
        our_maple, "load_clip_backbone", lambda cfg: (clip_params, clip_cfg)
    )
    trainer = build_trainer(cfg)
    trainer.load_model(str(out_dir), epoch=5)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours = np.asarray(trainer.model_inference(imgs))
    with torch.no_grad():
        ref = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)

    # reverse direction: perturb our params, export to the reference key
    # layout, load into the reference model exactly like its own load_model
    # (strict=False, maple.py:342-367), and the reference must now produce
    # OUR logits
    import jax

    trainer.params = jax.tree.map(lambda x: x * 1.5, trainer.params)
    trainer.save_model(6, str(tmp_path / "ours"))
    our_ckpt = tmp_path / "ours" / "MultiModalPromptLearner" / "model.pkl-7"
    exported = tmp_path / "exported.pth.tar-7"
    r2 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "import_torch_prompts.py"),
         str(our_ckpt), "--trainer", "MaPLe", "--export", str(exported)],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r2.returncode == 0, r2.stderr[-1500:]
    sd = torch.load(exported, weights_only=False)["state_dict"]
    missing = model.load_state_dict(sd, strict=False).unexpected_keys
    assert not missing, missing
    ours2 = np.asarray(trainer.model_inference(imgs))
    with torch.no_grad():
        ref2 = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours2, ref2, rtol=2e-3, atol=2e-4)
    assert not np.allclose(ours2, ours, atol=1e-3)  # perturbation took effect


def test_import_coop_and_cocoop_learner_relative(tmp_path, monkeypatch):
    """CoOp/CoCoOp checkpoints hold the learner-relative state dict
    (coop.py:431, cocoop.py:304) incl. token_prefix/suffix buffers the
    importer must skip like the reference's own load_model."""
    import torch

    import_reference_trainers()
    import trainers.cocoop as ref_cocoop

    _no_half_cuda(monkeypatch)

    cfg = _base_cfg(tmp_path, "CoCoOp")
    cfg.TRAINER.COCOOP.N_CTX = 2
    cfg.TRAINER.COCOOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COCOOP.PREC = "fp32"
    cfg.freeze()

    import_reference_clip()
    from clip.model import CLIP

    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    torch.manual_seed(31)
    torch_model = CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).float()
    model = ref_cocoop.CustomCLIP(cfg, CLASSNAMES, torch_model)
    learner_sd = model.prompt_learner.state_dict()
    assert "token_prefix" in learner_sd  # buffers present, must be ignored

    ckpt_path = tmp_path / "model.pth.tar-10"
    torch.save({"state_dict": learner_sd, "epoch": 10}, ckpt_path)

    from fsvlm_tpu.trainers.import_torch import import_torch_checkpoint

    params, epoch, _ = import_torch_checkpoint(str(ckpt_path), "CoCoOp")
    assert epoch == 10
    assert set(params) == {"ctx", "meta_net"}
    np.testing.assert_array_equal(
        params["ctx"], model.prompt_learner.ctx.detach().numpy()
    )
    mn = model.prompt_learner.meta_net
    np.testing.assert_array_equal(
        params["meta_net"]["w1"], mn.linear1.weight.detach().numpy().T
    )
    np.testing.assert_array_equal(
        params["meta_net"]["b2"], mn.linear2.bias.detach().numpy()
    )

    # CoOp: same file shape minus the meta net
    params_coop, _, _ = import_torch_checkpoint(str(ckpt_path), "CoOp")
    assert set(params_coop) == {"ctx"}


def test_import_lora_checkpoint_full_chain(tmp_path, monkeypatch):
    """Reference LoRA best.pt ({'weights': {'layer_{i}': {'q_proj':
    {'w_lora_A','w_lora_B'}, ...}}, 'metadata'}, lora.py:467-491) -> our
    stacked-factor payload; x-side deltas match and our LoRA trainer loads
    the imported file through its strict metadata validation."""
    import torch

    import_reference_trainers()
    from utils.layers import PlainMultiheadAttentionLoRA

    _no_half_cuda(monkeypatch)
    torch.manual_seed(41)

    dim, r, alpha = 64, 2, 1
    lora_layers = []
    for _ in range(2):  # test-tiny: 2 text layers, position "all"
        base = torch.nn.MultiheadAttention(dim, 2)
        layer = PlainMultiheadAttentionLoRA(
            base, enable_lora=["q", "v"], r=r, lora_alpha=alpha, dropout_rate=0.0
        )
        # B inits to zero (delta would be trivially 0) — randomize both
        for proj in (layer.q_proj, layer.v_proj):
            torch.nn.init.normal_(proj.w_lora_A, std=0.1)
            torch.nn.init.normal_(proj.w_lora_B, std=0.1)
        lora_layers.append(layer)

    weights = {}
    for i, layer in enumerate(lora_layers):  # make_weight layout (lora.py:495)
        weights[f"layer_{i}"] = {
            "q_proj": {
                "w_lora_A": layer.q_proj.w_lora_A.data,
                "w_lora_B": layer.q_proj.w_lora_B.data,
            },
            "v_proj": {
                "w_lora_A": layer.v_proj.w_lora_A.data,
                "w_lora_B": layer.v_proj.w_lora_B.data,
            },
        }
    meta = {"r": r, "alpha": alpha, "encoder": "text",
            "params": ["q", "v"], "position": "all"}
    ckpt_path = tmp_path / "best.pt"
    torch.save({"weights": weights, "metadata": meta}, ckpt_path)

    out_dir = tmp_path / "imported"
    r_cli = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "import_torch_prompts.py"),
         str(ckpt_path), "--trainer", "LoRA", "--output-dir", str(out_dir),
         "--backbone", "test-tiny", "--dataset", "Synthetic"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r_cli.returncode == 0, r_cli.stderr[-1500:]
    out_file = out_dir / "Synthetic" / "test-tiny" / "lora" / "best.pkl"
    assert os.path.exists(out_file)

    # factor mapping: ours are x-side (a = A.T, b = B.T); the reference
    # merges scaling * B@A into the (out, in) weight (layers.py:121-135) —
    # x-side that is x @ A.T @ B.T
    from fsvlm_tpu.trainers.import_torch import import_lora_checkpoint

    payload = import_lora_checkpoint(str(ckpt_path), backbone="test-tiny")
    assert set(payload["weights"]) == {"text"}
    for li, layer in enumerate(lora_layers):
        for ours, theirs in [("q", layer.q_proj), ("v", layer.v_proj)]:
            a, b = payload["weights"]["text"][ours]
            A = theirs.w_lora_A.detach().numpy()
            B = theirs.w_lora_B.detach().numpy()
            np.testing.assert_array_equal(a[li], A.T)
            np.testing.assert_array_equal(b[li], B.T)
            np.testing.assert_allclose(a[li] @ b[li], (B @ A).T, rtol=1e-6)

    # full chain: our LoRA trainer's strict load accepts the imported file
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    cfg = _base_cfg(tmp_path, "LoRA")
    node = cfg.TRAINER.LORA
    node.ENCODER = "text"
    node.POSITION = "all"
    node.PARAMS = ["q", "v"]
    node.R = r
    node.ALPHA = alpha
    node.PREC = "fp32"
    cfg.freeze()
    trainer = build_trainer(cfg)
    trainer.load_model(str(out_dir))
    a_loaded, _ = trainer.params["text"]["q"]
    np.testing.assert_allclose(
        np.asarray(a_loaded[0]),
        lora_layers[0].q_proj.w_lora_A.detach().numpy().T,
        rtol=1e-6,
    )


def test_import_promptsrc_vpt_layer_mapping(tmp_path, monkeypatch):
    """IVLP/PromptSRC full-model checkpoints: prompt_learner.ctx + the
    encoder-resident VPT leaves (image_encoder.VPT first layer,
    resblocks.{i}.VPT_shallow for 1 <= i < depth, clip/model.py:211-221,386)
    map onto {ctx, vpt_shallow, vision_deep, text_deep}."""
    import torch

    import_reference_trainers()
    import trainers.promptsrc as ref_psrc

    _no_half_cuda(monkeypatch)

    cfg = _base_cfg(tmp_path, "PromptSRC")
    node = cfg.TRAINER.PROMPTSRC
    node.N_CTX_TEXT = 3
    node.N_CTX_VISION = 3
    node.CTX_INIT = "a photo of a"
    node.PREC = "fp32"
    node.PROMPT_DEPTH_TEXT = 2
    node.PROMPT_DEPTH_VISION = 2
    cfg.freeze()

    import_reference_clip()
    from clip.model import CLIP

    design = {"trainer": "IVLP", "vision_depth": 2, "language_depth": 2,
              "vision_ctx": 3, "language_ctx": 3}
    torch.manual_seed(37)
    torch_model = CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2, design).float()

    def fake_load_clip(cfg_, zero_shot_model=False):
        plain = CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2,
                     {"trainer": "IVLP", "vision_depth": 0,
                      "language_depth": 0, "vision_ctx": 0, "language_ctx": 0})
        plain.load_state_dict(torch_model.state_dict(), strict=False)
        return plain.float()

    monkeypatch.setattr(ref_psrc, "load_clip_to_cpu", fake_load_clip)
    model = ref_psrc.CustomCLIP(cfg, CLASSNAMES, torch_model)

    sd = model.state_dict()
    ckpt_path = tmp_path / "model.pth.tar-20"
    torch.save({"state_dict": sd, "epoch": 20}, ckpt_path)

    from fsvlm_tpu.trainers.import_torch import import_torch_checkpoint

    params, epoch, _ = import_torch_checkpoint(str(ckpt_path), "PromptSRC")
    assert epoch == 20
    assert set(params) == {"ctx", "vpt_shallow", "vision_deep", "text_deep"}
    np.testing.assert_array_equal(
        params["ctx"], sd["prompt_learner.ctx"].numpy()
    )
    np.testing.assert_array_equal(
        params["vpt_shallow"], sd["image_encoder.VPT"].numpy()
    )
    assert params["vision_deep"].shape == (1, 3, 128)
    np.testing.assert_array_equal(
        params["vision_deep"][0],
        sd["image_encoder.transformer.resblocks.1.VPT_shallow"].numpy(),
    )
    np.testing.assert_array_equal(
        params["text_deep"][0],
        sd["text_encoder.transformer.resblocks.1.VPT_shallow"].numpy(),
    )

"""Replay the committed golden pack (tests/golden_pack/) — ZERO reference
dependency.

The rest of the parity suite drives /root/reference live (and skips without
it).  These tests replay oracle outputs frozen by tools/make_golden_pack.py
into committed artifacts, so the core parity proof — tokenizer ids, per-block
tower activations, and the reference-optimizer training trajectories
(CoOp, PromptSRC+GPA, CoCoOp, DANN, 8-10 steps each) — survives the
reference checkout's removal.  They run on every box.
"""

import os

import numpy as np
import pytest

PACK_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_pack")


def _load(name):
    path = os.path.join(PACK_DIR, name)
    if not os.path.isfile(path):
        pytest.skip(f"golden pack artifact missing: {name}")
    return np.load(path)


def test_pack_tokenizer_ids():
    """Byte-identical ids vs the reference SimpleTokenizer/clip.tokenize
    (frozen).  Mirrors test_tokenizer.py's oracle cases."""
    from test_tokenizer import TEXTS

    from fsvlm_tpu.models.clip.tokenizer import get_tokenizer, tokenize

    z = _load("tokenizer.npz")
    texts = [t for t in TEXTS if t]
    assert int(z["n_texts"]) == len(texts), (
        "TEXTS changed since the pack was generated — re-run "
        "tools/make_golden_pack.py on a box with the reference checkout")

    np.testing.assert_array_equal(tokenize(texts), z["tokenize_ids"])
    tok = get_tokenizer()
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(
            np.asarray(tok.encode(t), np.int32), z[f"encode_{i}"], err_msg=t)


def test_pack_text_tower_per_block():
    """Per-block activations of the frozen tiny reference text tower
    (saved_features oracle, clip/model.py:340-366) vs our scan transformer
    with collect_activations."""
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip.transformer import transformer
    from fsvlm_tpu.ops.attention import causal_mask

    z = _load("text_tower_blocks.npz")
    blocks = {}
    for key in z.files:
        if not key.startswith("blk."):
            continue
        node = blocks
        parts = key[4:].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])

    inp = jnp.asarray(z["emb"]) + jnp.asarray(z["positional_embedding"])
    _, acts = transformer(
        blocks,
        inp,
        n_heads=int(z["n_heads"]),
        mask=causal_mask(inp.shape[1]),
        collect_activations=True,
    )
    acts = np.asarray(acts)
    goldens = z["block_outputs"]
    assert acts.shape == goldens.shape
    for layer in range(goldens.shape[0]):
        np.testing.assert_allclose(
            acts[layer], goldens[layer], rtol=2e-4, atol=2e-5,
            err_msg=f"block {layer} diverged from the frozen oracle",
        )


def test_pack_vision_tower_per_block():
    """Per-block activations + final features of the frozen tiny reference
    ViT tower (encode_image, clip/model.py:401-431) vs our unfold+matmul
    patch embed -> scan transformer -> ln_post/proj path."""
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip.model import patch_embed
    from fsvlm_tpu.models.clip.transformer import transformer
    from fsvlm_tpu.ops.layers import layer_norm

    z = _load("vision_tower_blocks.npz")
    vis = {}
    for key in z.files:
        if not key.startswith("vis."):
            continue
        node = vis
        parts = key[4:].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])

    imgs = jnp.asarray(z["images"])
    B = imgs.shape[0]
    W = vis["class_embedding"].shape[-1]
    x = patch_embed(imgs, vis["patch_embed"])
    cls = jnp.broadcast_to(vis["class_embedding"], (B, 1, W))
    x = jnp.concatenate([cls, x], axis=1) + vis["positional_embedding"]
    x = layer_norm(x, vis["ln_pre"]["scale"], vis["ln_pre"]["bias"])
    out, acts = transformer(
        vis["blocks"], x, n_heads=int(z["n_heads"]), collect_activations=True)
    acts = np.asarray(acts)
    goldens = z["block_outputs"]
    assert acts.shape == goldens.shape
    for layer in range(goldens.shape[0]):
        np.testing.assert_allclose(
            acts[layer], goldens[layer], rtol=2e-4, atol=2e-5,
            err_msg=f"vision block {layer} diverged from the frozen oracle",
        )
    feats = layer_norm(
        out[:, 0, :], vis["ln_post"]["scale"], vis["ln_post"]["bias"])
    feats = np.asarray(feats @ vis["proj"])
    np.testing.assert_allclose(
        feats, z["image_features"], rtol=2e-4, atol=2e-5,
        err_msg="final image features diverged from the frozen oracle",
    )


def _unflatten_pack_tree(z, prefix):
    """Rebuild a pytree from 'prefix.a/b/0/c' keys; all-digit levels become
    lists (the converter stores RN stages/blocks as lists)."""
    import jax.numpy as jnp

    tree = {}
    for key in z.files:
        if not key.startswith(prefix):
            continue
        node = tree
        parts = key[len(prefix):].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(tree)


def test_pack_rn_tower_stages():
    """Stem/stage activations + attention-pooled features of the frozen
    tiny reference ModifiedResNet (clip/model.py:93-150, attnpool :56-92)
    vs our NHWC conv/BN/bottleneck path."""
    import jax
    import jax.numpy as jnp

    from fsvlm_tpu.models.clip.resnet import (
        _attention_pool,
        _avg_pool,
        _bn,
        _bottleneck,
        _conv,
    )

    z = _load("rn_tower.npz")
    vis = _unflatten_pack_tree(z, "vis.")

    x = jnp.asarray(z["images"])
    s = vis["stem"]
    x = jax.nn.relu(_bn(_conv(x, s["conv1"], stride=2, padding=((1, 1), (1, 1))), s["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, s["conv2"], padding=((1, 1), (1, 1))), s["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, s["conv3"], padding=((1, 1), (1, 1))), s["bn3"]))
    x = _avg_pool(x, 2)
    np.testing.assert_allclose(
        np.asarray(x), z["act.avgpool"], rtol=2e-4, atol=2e-5,
        err_msg="stem diverged from the frozen oracle")

    for li, stage in enumerate(vis["layers"]):
        stride = 1 if li == 0 else 2
        for bi, block in enumerate(stage):
            x = _bottleneck(x, block, stride if bi == 0 else 1)
        np.testing.assert_allclose(
            np.asarray(x), z[f"act.layer{li + 1}"], rtol=5e-4, atol=5e-5,
            err_msg=f"stage {li + 1} diverged from the frozen oracle")

    feats = _attention_pool(x, vis["attnpool"], int(z["n_heads"]))
    np.testing.assert_allclose(
        np.asarray(feats), z["image_features"], rtol=5e-4, atol=5e-5,
        err_msg="attention-pooled features diverged from the frozen oracle")


def test_pack_coop_trajectory(tmp_path, monkeypatch):
    """10 steps / 5 epochs vs the FROZEN trace of the real reference
    CoOp.forward_backward + dassl SGD/cosine stack: losses and ctx must
    match step-for-step.  Same assertions as
    test_trajectory_parity.py::test_coop_trajectory_parity[ce], with the
    reference side replaced by the committed artifact."""
    from test_trajectory_parity import (
        N_EPOCHS,
        STEPS_PER_EPOCH,
        _batches,
        _run_fsvlm_steps,
        _shared_cfg,
    )

    from fsvlm_tpu.engine import build_trainer
    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    import fsvlm_tpu.trainers  # noqa: F401
    import fsvlm_tpu.trainers.coop as our_coop

    z = _load("coop_trajectory.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    params, clip_cfg = clip_params_from_state_dict(sd)

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 4
    cfg.TRAINER.COOP.CTX_INIT = "a photo of a"
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.TRAINER.COOP.CSC = False
    cfg.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    cfg.TRAINER.COOP.LOSS_TYPE = "ce"
    cfg.freeze()

    monkeypatch.setattr(
        our_coop, "load_clip_backbone", lambda cfg: (params, clip_cfg))
    trainer = build_trainer(cfg)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH

    our_losses, our_ctx = [], []

    def record(ep, bi, loss, p):
        our_losses.append(loss)
        our_ctx.append(np.asarray(p["ctx"]))

    _run_fsvlm_steps(trainer, _batches(), record)

    ref_losses, ref_ctx = z["losses"], z["ctx"]
    assert len(our_losses) == N_EPOCHS * STEPS_PER_EPOCH == len(ref_losses)
    for k in range(len(ref_losses)):
        assert abs(our_losses[k] - ref_losses[k]) < 5e-4 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        np.testing.assert_allclose(
            our_ctx[k], ref_ctx[k], rtol=2e-3, atol=2e-5,
            err_msg=f"ctx diverged at step {k}",
        )


def test_pack_promptsrc_trajectory_and_gpa(tmp_path, monkeypatch):
    """10 steps / 5 epochs vs the FROZEN trace of the real reference
    PromptSRC.forward_backward (CE + 3 SCL losses -> SGD -> lr staircase ->
    GPA accumulation -> final GPA swap-in, promptsrc.py:285-353): losses,
    ctx trajectory, and the final Gaussian aggregate must match.  Same
    assertions as test_trajectory_parity.py::
    test_promptsrc_trajectory_and_gpa_parity with the reference side
    replaced by the committed artifact."""
    from test_trajectory_parity import (
        N_EPOCHS,
        STEPS_PER_EPOCH,
        _batches,
        _shared_cfg,
    )

    from fsvlm_tpu.engine import build_trainer
    from fsvlm_tpu.models.clip import clip_params_from_state_dict
    import fsvlm_tpu.trainers  # noqa: F401
    import fsvlm_tpu.trainers.ivlp as our_ivlp

    z = _load("promptsrc_trajectory.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    params, clip_cfg = clip_params_from_state_dict(sd)

    cfg = _shared_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TRAINER.NAME = "PromptSRC"
    node = cfg.TRAINER.PROMPTSRC
    node.N_CTX_TEXT = 4
    node.N_CTX_VISION = 0
    node.CTX_INIT = "a picture of a"
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

    monkeypatch.setattr(
        our_ivlp, "load_clip_backbone", lambda cfg: (params, clip_cfg))
    trainer = build_trainer(cfg)
    assert trainer.steps_per_epoch == STEPS_PER_EPOCH
    assert set(trainer.params) == {"ctx"}
    np.testing.assert_allclose(np.asarray(trainer.gauss), z["gauss"], rtol=1e-6)

    batches = _batches(seed=7)
    our_losses, our_ctx = [], []
    for ep in range(N_EPOCHS):
        trainer.epoch = ep
        for bi in range(STEPS_PER_EPOCH):
            imgs, labels = batches[ep * STEPS_PER_EPOCH + bi]
            batch = {
                "img": imgs,
                "label": labels.astype(np.int32),
                "domain": np.zeros(len(labels), np.int32),
                "index": np.arange(len(labels), dtype=np.int32),
                "valid": np.ones(len(labels), bool),
            }
            trainer.batch_idx = bi
            metrics = trainer.forward_backward(batch)
            our_losses.append(float(metrics["loss"]))
            our_ctx.append(np.asarray(trainer.params["ctx"]))
        trainer.after_epoch()  # GPA accumulation (+ final swap-in)

    ref_losses, ref_ctx = z["losses"], z["ctx"]
    assert len(our_losses) == N_EPOCHS * STEPS_PER_EPOCH == len(ref_losses)
    last = N_EPOCHS * STEPS_PER_EPOCH - 1
    for k in range(len(ref_losses)):
        assert abs(our_losses[k] - ref_losses[k]) < 1e-3 * (
            1 + abs(ref_losses[k])
        ), f"loss diverged at step {k}: {our_losses[k]} vs {ref_losses[k]}"
        if k == last:
            continue  # ref_ctx[-1] is the GPA aggregate (swapped in INSIDE
            # the reference's final forward_backward), compared below
        np.testing.assert_allclose(
            our_ctx[k], ref_ctx[k], rtol=2e-3, atol=2e-5,
            err_msg=f"ctx diverged at step {k}",
        )
    np.testing.assert_allclose(
        np.asarray(trainer.params["ctx"]), z["final_ctx"],
        rtol=2e-3, atol=2e-5, err_msg="GPA aggregate diverged",
    )


def test_pack_cocoop_trajectory(tmp_path, monkeypatch):
    """8 steps / 4 epochs vs the FROZEN trace of the real reference
    CoCoOp.forward_backward (PromptSRC/trainers/cocoop.py:247-255 per-image
    text-encoder loops): losses, ctx AND meta-net weight trajectories must
    match step-for-step.  Same assertions as test_cocoop_trajectory_parity
    with the reference side replaced by the committed artifact — this pins
    the batched fsvlm reformulation (one meta-net matmul + vmapped text
    forward) against the reference's loop formulation with zero reference
    dependency."""
    from test_cocoop_trajectory_parity import (
        _assert_cocoop_match,
        _cocoop_cfg,
        _our_cocoop_drive,
    )

    from fsvlm_tpu.models.clip import clip_params_from_state_dict

    z = _load("cocoop_trajectory.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    params, clip_cfg = clip_params_from_state_dict(sd)

    cfg = _cocoop_cfg(tmp_path / "out")
    init = {"ctx": z["init_ctx"], "w1": z["init_w1"], "b1": z["init_b1"],
            "w2": z["init_w2"], "b2": z["init_b2"]}
    our_losses, our_snaps = _our_cocoop_drive(
        cfg, params, clip_cfg, init, monkeypatch)

    ref_snaps = [
        {"ctx": z["ctx"][k], "w1": z["w1"][k], "w2": z["w2"][k]}
        for k in range(len(z["losses"]))
    ]
    _assert_cocoop_match(our_losses, our_snaps, z["losses"], ref_snaps)


def test_pack_dann_trajectory(tmp_path):
    """8 steps / 4 epochs vs the FROZEN trace of the real Dassl
    DANN.forward_backward (dassl/engine/da/dann.py: CE + BCE domain loss on
    gradient-reversed features, lambda ramp, net + critic optimizers,
    critic BatchNorm batch statistics): losses, both weight trajectories,
    and the critic BN running stats must match step-for-step.  Same
    assertions as test_zoo_trajectory_parity.py::test_dann_trajectory_parity
    with the reference side replaced by the committed artifact — the
    standalone pack now covers the Dassl zoo half of the framework."""
    from test_zoo_trajectory_parity import (
        BU,
        BX,
        N_EPOCHS,
        STEPS_PER_EPOCH,
        _batches,
        _build_our_trainer,
        _drive_ours,
        _our_batch,
        _zoo_cfg,
    )

    z = _load("dann_trajectory.npz")
    init_net = _unflatten_pack_tree(z, "init_net.")
    init_critic = _unflatten_pack_tree(z, "init_critic.")
    init_cstate = _unflatten_pack_tree(z, "init_cstate.")

    cfg = _zoo_cfg(tmp_path, **{"DATASET.TARGET_DOMAINS": ["d2"],
                                "DATALOADER.TRAIN_U.SAME_AS_X": False})
    cfg.TRAINER.NAME = "DANN"
    cfg.freeze()

    ours = _build_our_trainer(cfg)
    assert set(ours.params) == {"net", "critic"}
    ours.params = {"net": init_net, "critic": init_critic}
    ours.model_state = {"net": ours.model_state["net"],
                        "critic": init_cstate}
    ours.opt_state = {g: ours.tx.init(ours.params[g])
                      for g in ("net", "critic")}

    n_steps = N_EPOCHS * STEPS_PER_EPOCH
    bx_batches = _batches(n_steps, BX, seed=5)
    bu_batches = _batches(n_steps, BU, seed=6)

    our_out, our_snap = [], []

    def record(ep, bi, m):
        our_out.append(m)
        our_snap.append({
            "conv0": np.asarray(ours.params["net"]["backbone"]["conv0"]["w"]),
            "cls_w": np.asarray(ours.params["net"]["classifier"]["w"]),
            "critic_fc0": np.asarray(ours.params["critic"]["fc0"]["w"]),
            "critic_bn0_scale": np.asarray(
                ours.params["critic"]["bn0"]["scale"]),
            "critic_out": np.asarray(ours.params["critic"]["out"]["w"]),
            "bn0_mean": np.asarray(ours.model_state["critic"]["bn0"]["mean"]),
            "bn0_var": np.asarray(ours.model_state["critic"]["bn0"]["var"]),
        })

    def stepper(ep, bi):
        k = ep * STEPS_PER_EPOCH + bi
        return _our_batch(*bx_batches[k]), _our_batch(*bu_batches[k])

    _drive_ours(ours, stepper, record)

    for k in range(n_steps):
        for key, ref_l in (("loss_x", z["loss_x"]), ("loss_d", z["loss_d"])):
            assert abs(our_out[k][key] - ref_l[k]) < 1e-3 * (
                1 + abs(ref_l[k])
            ), f"{key} diverged at step {k}: {our_out[k][key]} vs {ref_l[k]}"
        for name in ("conv0", "cls_w", "critic_fc0", "critic_bn0_scale",
                     "critic_out", "bn0_mean", "bn0_var"):
            np.testing.assert_allclose(
                our_snap[k][name], z[f"ref.{name}"][k], rtol=2e-3, atol=3e-5,
                err_msg=f"{name} diverged at step {k}",
            )

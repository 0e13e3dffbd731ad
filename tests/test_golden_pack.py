"""Replay the committed golden pack (tests/golden_pack/) — ZERO reference
dependency.

The rest of the parity suite drives /root/reference live (and skips without
it).  These tests replay oracle outputs frozen by tools/make_golden_pack.py
into committed artifacts, so the core parity proof — tokenizer ids, per-block
tower activations, a 10-step reference-optimizer training trajectory —
survives the reference checkout's removal.  They run on every box.
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

"""Padded train batches must not bias the loss/gradient.

shard_batch pads batches that don't divide the mesh by repeating the last
row (e.g. the shipped batch-4 MaPLe/PLIP/PromptSRC configs on an 8-device
mesh).  Every loss masks by batch['valid'], so the padded step must produce
exactly the same update as the unpadded batch on one device.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from fsvlm_tpu.trainers.losses import (
    cross_entropy,
    focal_loss,
    kd_loss,
    kl_logits,
    l1_loss,
    masked_acc,
    nt_xent,
)
from test_coop_end2end import make_cfg


def _pad(x, n_pad):
    return np.concatenate([x, np.repeat(x[-1:], n_pad, axis=0)], axis=0)


@pytest.mark.parametrize(
    "fn",
    [
        lambda lg, lg2, y, v: cross_entropy(lg, y, valid=v),
        lambda lg, lg2, y, v: focal_loss(lg, y, alpha=jnp.ones(8), valid=v),
        lambda lg, lg2, y, v: kd_loss(lg, lg2, T=4.0, valid=v),
        lambda lg, lg2, y, v: kl_logits(lg, lg2, valid=v),
        lambda lg, lg2, y, v: l1_loss(lg, lg2 * 0.5, valid=v),
        lambda lg, lg2, y, v: masked_acc(lg, y, v),
    ],
)
def test_masked_losses_ignore_padding(fn):
    rng = np.random.RandomState(0)
    logits = rng.randn(5, 8).astype(np.float32)
    teacher = rng.randn(5, 8).astype(np.float32)
    labels = rng.randint(0, 8, 5).astype(np.int32)
    base = float(fn(jnp.asarray(logits), jnp.asarray(teacher), jnp.asarray(labels), None))

    lp = jnp.asarray(_pad(logits, 3))
    tp = jnp.asarray(_pad(teacher, 3))
    yp = jnp.asarray(_pad(labels, 3))
    v = jnp.asarray([True] * 5 + [False] * 3)
    padded = float(fn(lp, tp, yp, v))
    assert padded == pytest.approx(base, rel=1e-6)


def test_nt_xent_ignores_padding():
    rng = np.random.RandomState(1)
    z1 = rng.randn(5, 16).astype(np.float32)
    z2 = rng.randn(5, 16).astype(np.float32)
    base = float(nt_xent(jnp.asarray(z1), jnp.asarray(z2)))
    v = jnp.asarray([True] * 5 + [False] * 3)
    padded = float(
        nt_xent(jnp.asarray(_pad(z1, 3)), jnp.asarray(_pad(z2, 3)), valid=v)
    )
    assert padded == pytest.approx(base, rel=1e-6)


def _batch(n):
    return {
        "img": np.linspace(-1, 1, n * 32 * 32 * 3, dtype=np.float32).reshape(
            n, 32, 32, 3
        ),
        "label": np.arange(n, dtype=np.int32) % 8,
        "domain": np.zeros(n, np.int32),
        "index": np.arange(n, dtype=np.int32),
        "valid": np.ones(n, bool),
    }


def _one_step_params(tmp_path, devices, batch):
    cfg = make_cfg(
        tmp_path,
        **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True, "OPTIM.WARMUP_EPOCH": 0},
    )
    cfg.freeze()
    trainer = build_trainer(cfg)
    if devices is not None:
        from fsvlm_tpu.parallel import mesh as mesh_mod

        trainer.mesh = mesh_mod.get_mesh(devices)
        trainer._compile_steps()
    trainer.forward_backward(batch)
    return jax.tree.map(lambda x: np.asarray(x), trainer.params)


def test_indivisible_train_batch_matches_unpadded(tmp_path):
    """A 4-example batch stepped on the 8-device mesh (shard_batch pads to 8)
    must produce the same update as the raw 4-example batch on 1 device —
    the exact scenario of the shipped batch-4 configs."""
    p8 = _one_step_params(tmp_path / "a", jax.devices(), _batch(4))
    p1 = _one_step_params(tmp_path / "b", jax.devices()[:1], _batch(4))
    for a, b in zip(jax.tree.leaves(p8), jax.tree.leaves(p1)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_promptsrc_padded_loss_matches_unpadded(tmp_path):
    """PromptSRC's composite loss (CE + SCL-L1 + SCL-KL) under padding."""
    cfg = make_cfg(
        tmp_path,
        **{
            "TRAINER.NAME": "PromptSRC",
            "OPTIM.MAX_EPOCH": 1,
            "TEST.NO_TEST": True,
            "TRAINER.PROMPTSRC.PREC": "fp32",
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT": 2,
            "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION": 2,
        },
    )
    cfg.freeze()
    trainer = build_trainer(cfg)
    b4 = _batch(4)
    b8 = {k: _pad(v, 4) for k, v in b4.items()}
    b8["valid"] = np.asarray([True] * 4 + [False] * 4)
    key = jax.random.PRNGKey(0)
    l4, aux4 = trainer.loss_fn(trainer.params, trainer.frozen, b4, key)
    l8, aux8 = trainer.loss_fn(trainer.params, trainer.frozen, b8, key)
    assert float(l8) == pytest.approx(float(l4), rel=1e-5)
    assert float(aux8["acc"]) == pytest.approx(float(aux4["acc"]), rel=1e-6)

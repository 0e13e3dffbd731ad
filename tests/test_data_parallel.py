"""Data-parallel SPMD correctness on the virtual 8-device CPU mesh.

The TPU analog of multi-node testing without a cluster (SURVEY.md §4): the
same jitted train step must produce identical parameter updates whether the
batch lives on 1 device or is sharded over 8, because XLA inserts the
gradient all-reduce.
"""

import jax
import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
from fsvlm_tpu.parallel.mesh import get_mesh
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = get_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def _one_step_params(tmp_path, devices):
    cfg = make_cfg(
        tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True, "OPTIM.WARMUP_EPOCH": 0}
    )
    cfg.freeze()
    trainer = build_trainer(cfg)
    if devices is not None:
        from fsvlm_tpu.parallel import mesh as mesh_mod

        trainer.mesh = mesh_mod.get_mesh(devices)
        trainer._compile_steps()
    batch = {
        "img": np.linspace(-1, 1, 16 * 32 * 32 * 3, dtype=np.float32).reshape(16, 32, 32, 3),
        "label": np.arange(16, dtype=np.int32) % 8,
        "domain": np.zeros(16, np.int32),
        "index": np.arange(16, dtype=np.int32),
        "valid": np.ones(16, bool),
    }
    trainer.forward_backward(batch)
    return jax.tree.map(lambda x: np.asarray(x), trainer.params)


def test_sharded_step_matches_single_device(tmp_path):
    p8 = _one_step_params(tmp_path / "a", jax.devices())
    p1 = _one_step_params(tmp_path / "b", jax.devices()[:1])
    flat8 = jax.tree.leaves(p8)
    flat1 = jax.tree.leaves(p1)
    for a, b in zip(flat8, flat1):
        # reduction order differs between the 8-way psum and the local sum
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_eval_sharded_matches_single(tmp_path):
    cfg = make_cfg(
        tmp_path, **{"OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True}
    )
    cfg.freeze()
    trainer = build_trainer(cfg)
    imgs = np.random.RandomState(0).randn(16, 32, 32, 3).astype(np.float32)
    from fsvlm_tpu.parallel.mesh import data_sharded

    sharded = jax.device_put(imgs, data_sharded(trainer.mesh))
    logits_sharded = np.asarray(trainer._eval_step(trainer.params, trainer.frozen, sharded))
    logits_local = np.asarray(trainer._eval_step(trainer.params, trainer.frozen, imgs))
    np.testing.assert_allclose(logits_sharded, logits_local, rtol=1e-5, atol=1e-5)

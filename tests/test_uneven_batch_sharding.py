"""Eval batches not divisible by the mesh size must pad + mask correctly."""

import numpy as np

from fsvlm_tpu.engine import build_trainer
from fsvlm_tpu.parallel.mesh import get_mesh, shard_batch
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def test_shard_batch_pads_to_mesh():
    mesh = get_mesh()  # 8 virtual devices
    batch = {
        "img": np.zeros((10, 4, 4, 3), np.float32),
        "label": np.arange(10, dtype=np.int32),
        "valid": np.ones(10, bool),
        "impath": ["x"] * 10,
    }
    out = shard_batch(batch, mesh)
    assert out["img"].shape[0] == 16
    v = np.asarray(out["valid"])
    assert v[:10].all() and not v[10:].any()
    assert int(np.asarray(out["label"])[10]) == 9  # padded with the last row


def test_eval_with_odd_test_batch(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{
            "DATALOADER.TEST.BATCH_SIZE": 10,  # not divisible by 8 devices
            "OPTIM.MAX_EPOCH": 1,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    acc = t.test()
    assert 0.0 <= acc <= 100.0
    # every real test item counted exactly once
    assert t.evaluator._total == len(t.dm.dataset.test)

"""Device-resident train-set tests: the HBM uint8 cache + on-device index
gather must be byte-equivalent to the host batch path (same images, same
training trajectory), and the eligibility gates must behave."""

import jax
import numpy as np
import pytest

from fsvlm_tpu.engine import build_trainer
import fsvlm_tpu.trainers  # noqa: F401
from test_coop_end2end import make_cfg


def run_trainer(tmp_path, name, resident, budget_mb=2048, epochs=3):
    cfg = make_cfg(
        tmp_path / name,
        **{
            "DATALOADER.DEVICE_AUG": True,
            "DATALOADER.PRE_SIZE": 48,
            "DATALOADER.DEVICE_RESIDENT": resident,
            "DATALOADER.DEVICE_RESIDENT_BUDGET_MB": budget_mb,
            "OPTIM.MAX_EPOCH": epochs,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()
    return t


def test_resident_matches_host_path(tmp_path):
    """Same seed, same config: training through the resident index-gather
    path must land on the same parameters as the per-batch H2D path."""
    t_host = run_trainer(tmp_path, "host", "off")
    t_res = run_trainer(tmp_path, "res", "auto")
    assert t_host._device_cache is None
    assert t_res._device_cache is not None

    flat_h = jax.tree.leaves(t_host.params)
    flat_r = jax.tree.leaves(t_res.params)
    assert len(flat_h) == len(flat_r)
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        )


def test_materialize_matches_getitem(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{"DATALOADER.DEVICE_AUG": True, "DATALOADER.PRE_SIZE": 48},
    )
    cfg.freeze()
    t = build_trainer(cfg)
    wrapper = t.train_loader_x.wrapper
    cache = wrapper.materialize()
    assert cache.dtype == np.uint8
    assert cache.shape == (len(wrapper), 48, 48, 3)
    for idx in [0, len(wrapper) // 2, len(wrapper) - 1]:
        np.testing.assert_array_equal(cache[idx], wrapper[idx]["img"])


def test_iter_index_batches_contract(tmp_path):
    """Index batches carry the same labels/valid/padding as the pixel
    batches for the same sampler order."""
    cfg = make_cfg(
        tmp_path,
        **{
            "DATALOADER.DEVICE_AUG": True,
            "DATALOADER.PRE_SIZE": 48,
            "DATALOADER.TRAIN_X.BATCH_SIZE": 16,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    loader = t.train_loader_x
    for batch in loader.iter_index_batches():
        assert set(batch) == {"label", "domain", "index", "valid"}
        assert batch["index"].shape == (16,)
        assert batch["valid"].all()  # drop_last pipeline: all rows real
        items = [loader.wrapper.data_source[i] for i in batch["index"]]
        np.testing.assert_array_equal(
            batch["label"], np.asarray([it.label for it in items], np.int32)
        )


def test_device_schedule_contract(tmp_path):
    """TRAIN.DEVICE_SCHEDULE=on: the on-device schedule must be a
    permutation of the dataset (per epoch, drop_last-truncated like the
    host path), with labels/domains gathered consistently and a different
    order each epoch."""
    cfg = make_cfg(
        tmp_path,
        **{
            "DATALOADER.DEVICE_AUG": True,
            "DATALOADER.PRE_SIZE": 48,
            "DATALOADER.TRAIN_X.BATCH_SIZE": 16,
            "TRAIN.DEVICE_SCHEDULE": True,
            "OPTIM.MAX_EPOCH": 2,
            "TEST.NO_TEST": True,
        },
    )
    cfg.freeze()
    t = build_trainer(cfg)
    assert t._maybe_device_cache() is not None
    assert t._resident_meta is not None
    num_batches = len(t.train_loader_x)
    n_items = len(t.train_loader_x.wrapper)
    data = t.train_loader_x.wrapper.data_source

    orders = []
    for epoch in (0, 1):
        t.epoch = epoch
        sched = t._maybe_device_schedule(num_batches)
        assert sched is not None
        idx = np.asarray(sched["index"])
        assert idx.shape == (num_batches, 16)
        flat = idx.reshape(-1)
        # drop_last semantics: a subset of a permutation, no duplicates
        assert len(set(flat.tolist())) == len(flat) <= n_items
        assert np.asarray(sched["valid"]).all()
        labels = np.asarray(sched["label"]).reshape(-1)
        np.testing.assert_array_equal(
            labels, np.asarray([data[i].label for i in flat], np.int32)
        )
        orders.append(flat.tolist())
    assert orders[0] != orders[1], "epoch shuffles must differ"

    # and the trainer actually runs through it
    t.train()


def test_budget_gate_falls_back_to_host_path(tmp_path):
    t = run_trainer(tmp_path, "tiny_budget", "auto", budget_mb=0, epochs=1)
    assert t._device_cache is None  # over budget -> host path
    assert str(t.cfg.DATALOADER.DEVICE_RESIDENT) == "off"  # not retried


def test_forced_on_requires_device_aug(tmp_path):
    cfg = make_cfg(
        tmp_path,
        **{"DATALOADER.DEVICE_AUG": False, "DATALOADER.DEVICE_RESIDENT": "on",
           "OPTIM.MAX_EPOCH": 1, "TEST.NO_TEST": True},
    )
    cfg.freeze()
    t = build_trainer(cfg)
    with pytest.raises(ValueError, match="DEVICE_RESIDENT"):
        t.train()

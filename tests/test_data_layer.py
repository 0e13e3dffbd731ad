"""Data layer semantics tests: few-shot sampling, base/new subsample,
class-balanced sampler, fixed-shape batches."""

import collections

import numpy as np
import pytest

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.data import (
    DataManager,
    Datum,
    generate_fewshot,
    generate_per_class_fewshot,
    subsample_classes,
)
from fsvlm_tpu.data.samplers import WeightedClassSampler, build_sampler


def make_items(counts):
    items = []
    for label, n in enumerate(counts):
        for j in range(n):
            items.append(
                Datum(impath=f"synthetic://x-{label}-{j}", label=label, classname=f"c{label}")
            )
    return items


def test_uniform_fewshot():
    import random

    items = make_items([10, 10, 3])
    out = generate_fewshot(items, 5, random.Random(0))
    counts = collections.Counter(it.label for it in out)
    assert counts[0] == 5 and counts[1] == 5
    assert counts[2] == 3  # fewer available than shots -> keep all


def test_per_class_fewshot():
    import random

    items = make_items([16, 16, 16, 16])
    out = generate_per_class_fewshot(items, [16, 8, 2, 1], random.Random(0))
    counts = collections.Counter(it.label for it in out)
    assert [counts[i] for i in range(4)] == [16, 8, 2, 1]
    # deterministic under the same seed
    out2 = generate_per_class_fewshot(items, [16, 8, 2, 1], random.Random(0))
    assert [it.impath for it in out] == [it.impath for it in out2]


def test_subsample_base_new():
    items = make_items([4] * 7)  # 7 classes -> base: 0..3, new: 4..6
    (base,) = subsample_classes(items, subsample="base")
    (new,) = subsample_classes(items, subsample="new")
    assert sorted({it.label for it in base}) == [0, 1, 2, 3]
    assert sorted({it.label for it in new}) == [0, 1, 2]  # relabeled
    assert sorted({it.classname for it in new}) == ["c4", "c5", "c6"]
    assert len(base) == 16 and len(new) == 12


def test_weighted_class_sampler_balances():
    items = make_items([160, 16, 4])
    sampler = WeightedClassSampler(items, seed=0, num_samples=18000)
    labels = np.asarray([items[i].label for i in iter(sampler)])
    freqs = np.bincount(labels) / len(labels)
    # inverse-frequency sampling should equalize class frequency
    assert np.all(np.abs(freqs - 1 / 3) < 0.02), freqs


def test_datamanager_synthetic_batches():
    cfg = get_cfg_default()
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 4
    cfg.SEED = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_resized_crop", "random_flip", "normalize"]
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 10
    cfg.VERBOSE = False
    dm = DataManager(cfg)
    assert dm.num_classes == 8
    batch = next(iter(dm.train_loader_x))
    assert batch["img"].shape == (8, 32, 32, 3)
    assert batch["img"].dtype == np.float32
    assert batch["valid"].all()

    # test loader pads the ragged last batch and masks it
    batches = list(iter(dm.test_loader))
    total_valid = sum(b["valid"].sum() for b in batches)
    assert total_valid == len(dm.dataset.test) == 32
    for b in batches:
        assert b["img"].shape[0] == 10


def test_per_class_shots_via_cfg():
    cfg = get_cfg_default()
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = -1
    cfg.DATASET.PER_CLASS_SHOTS = [16, 16, 16, 16, 1, 1, 1, 1]
    cfg.SEED = 0
    cfg.VERBOSE = False
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["normalize"]
    dm = DataManager(cfg)
    counts = collections.Counter(it.label for it in dm.dataset.train_x)
    assert [counts[i] for i in range(8)] == [16, 16, 16, 16, 1, 1, 1, 1]


def test_base_to_new_protocol_on_synthetic():
    cfg = get_cfg_default()
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 2
    cfg.DATASET.SUBSAMPLE_CLASSES = "new"
    cfg.SEED = 0
    cfg.VERBOSE = False
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["normalize"]
    dm = DataManager(cfg)
    assert dm.num_classes == 4
    assert all(it.classname.endswith(("4", "5", "6", "7")) for it in dm.dataset.test)


def test_random_class_sampler_batches():
    from fsvlm_tpu.data.samplers import RandomClassSampler

    items = make_items([12, 12, 12, 12])
    sampler = RandomClassSampler(items, batch_size=8, n_ins=4, seed=0)
    idxs = list(iter(sampler))
    assert len(idxs) % 8 == 0 and len(idxs) > 0
    # every batch holds n_cls=2 classes x n_ins=4 instances
    for start in range(0, len(idxs), 8):
        chunk = [items[i].label for i in idxs[start : start + 8]]
        labels, counts = np.unique(chunk, return_counts=True)
        assert len(labels) == 2 and all(c == 4 for c in counts), chunk


def test_loader_propagates_decode_errors():
    from fsvlm_tpu.data.loader import BatchLoader, DatasetWrapper
    from fsvlm_tpu.data.samplers import SequentialSampler
    from fsvlm_tpu.data.transforms import TestTransform
    from fsvlm_tpu.config import get_cfg_default

    items = [Datum(impath="/nonexistent/file.jpg", label=0, classname="x")]
    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (16, 16)
    wrapper = DatasetWrapper(items, TestTransform(cfg))
    loader = BatchLoader(wrapper, SequentialSampler(items), batch_size=1)
    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        list(iter(loader))


def _domain_items(per_domain):
    items = []
    for d, n in enumerate(per_domain):
        for j in range(n):
            items.append(
                Datum(
                    impath=f"synthetic://d-{d}-{j}",
                    label=j % 3,
                    domain=d,
                    classname=f"c{j % 3}",
                )
            )
    return items


def test_random_domain_sampler():
    """N domains x K images per batch (dassl samplers.py:9-62)."""
    items = _domain_items([12, 12, 12])
    s = build_sampler("RandomDomainSampler", items, batch_size=6, n_domain=2, seed=0)
    idxs = list(iter(s))
    assert len(idxs) % 6 == 0 and len(idxs) > 0
    domains = [items[i].domain for i in idxs]
    for b in range(len(idxs) // 6):
        chunk = domains[b * 6 : (b + 1) * 6]
        # 2 domains, 3 consecutive images each
        assert chunk[0] == chunk[1] == chunk[2]
        assert chunk[3] == chunk[4] == chunk[5]
        assert chunk[0] != chunk[3]
    assert len(set(idxs)) == len(idxs)  # within-epoch no replacement


def test_seq_domain_sampler():
    """Sorted domain order, K per domain (dassl samplers.py:65-116)."""
    items = _domain_items([8, 8])
    s = build_sampler("SeqDomainSampler", items, batch_size=4, seed=0)
    idxs = list(iter(s))
    domains = [items[i].domain for i in idxs]
    for b in range(len(idxs) // 4):
        chunk = domains[b * 4 : (b + 1) * 4]
        assert chunk == [0, 0, 1, 1]
    assert len(set(idxs)) == len(idxs)


def test_domain_sampler_rejects_indivisible_batch():
    items = _domain_items([8, 8, 8])
    with pytest.raises(ValueError):
        build_sampler("RandomDomainSampler", items, batch_size=4, n_domain=3)


def test_random_translation_moves_pixels():
    """Reference Random2DTranslation (dassl transforms.py:43-86): upscale to
    1.125x then random-crop — output pixels must actually shift."""
    import random

    from PIL import Image

    from fsvlm_tpu.data.transforms import _random_translation

    # horizontal gradient so any x-shift changes pixel values
    base = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    img = Image.fromarray(np.stack([base] * 3, -1))

    plain = np.asarray(img.resize((32, 32), Image.BILINEAR), np.float32)
    moved = 0
    for seed in range(20):
        rng = random.Random(seed)
        out = _random_translation(img, 32, 32, rng)
        assert out.size == (32, 32)
        if not np.allclose(np.asarray(out, np.float32), plain):
            moved += 1
    assert moved > 0  # the p=0.5 translate branch fires and shifts content


def test_random_translation_in_pipeline():
    from PIL import Image

    from fsvlm_tpu.data.transforms import TrainTransform

    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_translation", "normalize"]
    t = TrainTransform(cfg)
    rng_img = np.random.RandomState(0).randint(0, 255, (48, 48, 3), np.uint8)
    x = t(Image.fromarray(rng_img))
    assert x.shape == (32, 32, 3)

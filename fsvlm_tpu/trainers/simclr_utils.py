"""SimCLR two-view pipeline (parity: trainers/simclr_utils.py:18-86 +
train.py:296-321 loader override).

The reference builds a separate torchvision pipeline (RandomResizedCrop,
flip, color jitter, grayscale, Gaussian blur) and a collate producing
{"img1","img2","label"}.  Here the two views ride the standard BatchLoader:
a TwoViewTransform emits a stacked pair which the wrapper splits into
img/img2 keys via k_transforms=2 handling in make_simclr_loader.
"""

import random

import numpy as np

from ..data.loader import BatchLoader, DatasetWrapper
from ..data.samplers import RandomSampler
from ..data.transforms import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD, TrainTransform


def simclr_transform_cfg(cfg):
    """Derive a SimCLR-style aug config from the experiment cfg."""
    sim = cfg.clone()
    sim.defrost()
    sim.INPUT.TRANSFORMS = [
        "random_resized_crop",
        "random_flip",
        "colorjitter",
        "randomgrayscale",
        "gaussian_blur",
        "normalize",
    ]
    sim.INPUT.PIXEL_MEAN = list(CLIP_PIXEL_MEAN)
    sim.INPUT.PIXEL_STD = list(CLIP_PIXEL_STD)
    return sim


class _TwoViewWrapper(DatasetWrapper):
    """Yields both views: img (view 1) and img2 (view 2)."""

    def __getitem__(self, idx):
        item = self.data_source[idx]
        img = self._get_image(idx)
        out = {
            "img": self.transform(img),
            "img2": self.transform(img),
            "label": item.label,
            "domain": item.domain,
            "index": idx,
            "impath": item.impath,
        }
        return out


def make_simclr_loader(cfg, data_source):
    sim_cfg = simclr_transform_cfg(cfg)
    tfm = TrainTransform(sim_cfg, rng=random.Random(max(cfg.SEED, 0)))
    wrapper = _TwoViewWrapper(data_source, tfm)
    sampler = RandomSampler(data_source, seed=cfg.SEED if cfg.SEED >= 0 else None)
    # drop_last only when the few-shot set can fill a batch — otherwise the
    # loader would yield zero batches and every epoch silently runs 0 steps
    # (same guard as DataManager.make_loader)
    return BatchLoader(
        wrapper,
        sampler,
        batch_size=cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
        drop_last=len(data_source) >= cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
        num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
        extra_keys=("img2",),
    )

"""Eval-preprocess parity: TestTransform must reproduce the reference's
CLIP ``_transform`` geometry exactly (clip/clip.py:71-78 =
Resize(224, BICUBIC) -> CenterCrop(224) -> ToTensor -> Normalize).

torchvision is not installed here, so the oracle reimplements torchvision's
*documented integer arithmetic* (the part where parity can silently break):
- Resize(int): short edge -> size, long edge TRUNCATED:
  ``new_long = int(size * long / short)``
  (torchvision/transforms/functional.py _compute_resized_output_size)
- CenterCrop: ``crop_top = int(round((height - crop_height) / 2.0))``
The pixel resampling itself is PIL in both stacks, so matching geometry
implies matching pixels.
"""

import numpy as np
import pytest
from PIL import Image

from fsvlm_tpu.config.defaults import get_cfg_default
from fsvlm_tpu.data.transforms import TestTransform


def torchvision_oracle(img, size, interp=Image.BICUBIC):
    w, h = img.size
    if w <= h:
        ow, oh = size, int(size * h / w)
    else:
        ow, oh = int(size * w / h), size
    if (ow, oh) != (w, h):
        img = img.resize((ow, oh), interp)
    top = int(round((oh - size) / 2.0))
    left = int(round((ow - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def make_cfg(size=224):
    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (size, size)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.TRANSFORMS = ["normalize"]
    # CLIP's normalization constants (clip/clip.py:78)
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    return cfg


# shapes chosen so the long-edge truncation and the odd-difference crop
# offset both matter: 500x375 -> long edge 298.67 (trunc vs round differ),
# 375x500 transposed, 333x500 -> 336.3, 399x400 near-square odd, upscales.
SHAPES = [(500, 375), (375, 500), (640, 480), (333, 500), (399, 400),
          (100, 80), (80, 100), (224, 224), (225, 224)]


@pytest.mark.parametrize("w,h", SHAPES)
def test_resize_center_crop_geometry(w, h):
    rng = np.random.RandomState(hash((w, h)) % (2**31))
    img = Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8))
    size = 224

    want = np.asarray(torchvision_oracle(img, size), np.float32) / 255.0
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    want = (want - mean) / std

    got = TestTransform(make_cfg(size))(img)
    assert got.shape == (size, size, 3)
    np.testing.assert_array_equal(got, want.astype(np.float32), str((w, h)))


def test_bilinear_and_small_sizes():
    cfg = make_cfg(32)
    cfg.INPUT.INTERPOLATION = "bilinear"
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 256, (45, 67, 3), np.uint8))
    want = np.asarray(
        torchvision_oracle(img, 32, Image.BILINEAR), np.float32) / 255.0
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
    got = TestTransform(cfg)(img)
    np.testing.assert_array_equal(got, ((want - mean) / std).astype(np.float32))

"""Image transform pipelines.

Parity targets: dassl/data/transforms/transforms.py —
- train (:206-323): random_resized_crop (scale cfg.INPUT.RRCROP_SCALE, torch
  default ratio 3/4..4/3), random_flip, colorjitter, grayscale, gaussian
  blur, cutout, gaussian noise, normalize.
- test (:326-354): resize shorter edge to max(SIZE) -> center crop -> normalize.

torchvision is unavailable; these are PIL+numpy implementations with the same
sampling semantics.  The hot path on TPU uses the device-side fused pipeline
in fsvlm_tpu.ops.preprocess instead; this module is the reference-compatible
host path and the one used for deterministic eval preprocessing.
"""

import math
import random

import numpy as np
from PIL import Image, ImageFilter

CLIP_PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
CLIP_PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]

_PIL_INTERP = {
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "nearest": Image.NEAREST,
}

AVAI_CHOICES = [
    "random_flip",
    "random_resized_crop",
    "normalize",
    "instance_norm",
    "random_crop",
    "random_translation",
    "center_crop",
    "cutout",
    "imagenet_policy",
    "cifar10_policy",
    "svhn_policy",
    "randaugment",
    "randaugment_fixmatch",
    "randaugment2",
    "gaussian_noise",
    "colorjitter",
    "randomgrayscale",
    "gaussian_blur",
]


def random_resized_crop_params(rng, width, height, scale, ratio=(3 / 4, 4 / 3)):
    """Sample crop box (i, j, h, w) with torchvision semantics."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = rng.randint(0, height - h)
            j = rng.randint(0, width - w)
            return i, j, h, w
    # fallback: center crop of clamped aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    i = (height - h) // 2
    j = (width - w) // 2
    return i, j, h, w


class TrainTransform:
    """Config-driven stochastic train pipeline producing float32 HWC arrays."""

    def __init__(self, cfg, rng=None):
        self.size = tuple(cfg.INPUT.SIZE)
        self.interp = _PIL_INTERP[cfg.INPUT.INTERPOLATION]
        self.choices = list(cfg.INPUT.TRANSFORMS)
        self.scale = tuple(cfg.INPUT.RRCROP_SCALE)
        self.mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        self.std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
        self.normalize = "normalize" in self.choices
        self.gb_p = cfg.INPUT.GB_P
        self.gb_k = cfg.INPUT.GB_K
        self.cj = (
            cfg.INPUT.COLORJITTER_B,
            cfg.INPUT.COLORJITTER_C,
            cfg.INPUT.COLORJITTER_S,
            cfg.INPUT.COLORJITTER_H,
        )
        self.ra_n = cfg.INPUT.RANDAUGMENT_N
        self.ra_m = cfg.INPUT.RANDAUGMENT_M
        self.rgs_p = cfg.INPUT.RGS_P
        self.crop_padding = cfg.INPUT.CROP_PADDING
        self.cutout_n = cfg.INPUT.CUTOUT_N
        self.cutout_len = cfg.INPUT.CUTOUT_LEN
        self.gn_mean = cfg.INPUT.GN_MEAN
        self.gn_std = cfg.INPUT.GN_STD
        self.rng = rng or random.Random()

        unknown = [c for c in self.choices if c not in AVAI_CHOICES]
        if unknown:
            raise ValueError(f"Unknown INPUT.TRANSFORMS entries: {unknown}")

    def __call__(self, img: Image.Image, rng=None) -> np.ndarray:
        # per-call rng (when given) keeps the augmentation stream independent
        # of loader thread interleaving — see DatasetWrapper
        rng = rng or self.rng
        out_w, out_h = self.size[1], self.size[0]

        # reference order (transforms.py:221-236): translation runs BEFORE the
        # crops and produces a target-size image itself
        translated = False
        if "random_translation" in self.choices:
            img = _random_translation(img, out_h, out_w, rng)
            translated = True

        if "random_resized_crop" in self.choices:
            i, j, h, w = random_resized_crop_params(rng, img.width, img.height, self.scale)
            img = img.resize((out_w, out_h), self.interp, box=(j, i, j + w, i + h))
        elif "random_crop" in self.choices:
            img = _pad_and_random_crop(img, (out_h, out_w), self.crop_padding, rng)
        elif not translated and ("center_crop" in self.choices or img.size != (out_w, out_h)):
            img = _resize_center_crop(img, (out_h, out_w), self.interp)

        if "random_flip" in self.choices and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)

        if any(p in self.choices for p in ("imagenet_policy", "cifar10_policy", "svhn_policy")):
            from .autoaugment import auto_augment

            policy = next(
                p for p in ("imagenet_policy", "cifar10_policy", "svhn_policy")
                if p in self.choices
            )
            img = auto_augment(img, policy, rng)

        if "randaugment" in self.choices:
            from .autoaugment import rand_augment

            img = rand_augment(img, self.ra_n, self.ra_m, rng)
        if "randaugment2" in self.choices:
            from .autoaugment import rand_augment2

            img = rand_augment2(img, self.ra_n, rng)
        if "randaugment_fixmatch" in self.choices:
            from .autoaugment import rand_augment_fixmatch

            img = rand_augment_fixmatch(img, self.ra_n, rng)

        if "colorjitter" in self.choices:
            img = _color_jitter(img, self.cj, rng)

        if "randomgrayscale" in self.choices and rng.random() < self.rgs_p:
            img = img.convert("L").convert("RGB")

        if "gaussian_blur" in self.choices and rng.random() < self.gb_p:
            sigma = rng.uniform(0.1, 2.0)
            img = img.filter(ImageFilter.GaussianBlur(radius=sigma))

        x = np.asarray(img, np.float32) / 255.0

        if "cutout" in self.choices:
            x = _cutout(x, self.cutout_n, self.cutout_len, rng)

        if self.normalize:
            x = (x - self.mean) / self.std

        if "gaussian_noise" in self.choices:
            # draw from the per-call rng, not the process-global np.random:
            # loader threads mutate the global state concurrently, which
            # would break the seeded per-(item, visit) determinism contract
            noise_rng = np.random.RandomState(rng.randrange(2**31))
            x = x + noise_rng.normal(
                self.gn_mean, self.gn_std, x.shape).astype(np.float32)

        if "instance_norm" in self.choices:
            x = (x - x.mean((0, 1))) / (x.std((0, 1)) + 1e-8)

        return x.astype(np.float32)


class TestTransform:
    """Deterministic eval pipeline: resize shorter edge -> center crop ->
    normalize (transforms.py:326-354 + CLIP's _transform, clip/clip.py:71-78)."""

    def __init__(self, cfg):
        self.size = tuple(cfg.INPUT.SIZE)
        self.interp = _PIL_INTERP[cfg.INPUT.INTERPOLATION]
        self.mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        self.std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
        self.normalize = "normalize" in cfg.INPUT.TRANSFORMS

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = _resize_center_crop(img, self.size, self.interp)
        x = np.asarray(img, np.float32) / 255.0
        if self.normalize:
            x = (x - self.mean) / self.std
        return x.astype(np.float32)


def _resize_center_crop(img, size, interp):
    th, tw = size
    # resize so the shorter edge equals max(size), like Resize(max(size)).
    # Rounding must match torchvision exactly (clip/clip.py:71-78 pipes PIL
    # images through torchvision Resize+CenterCrop): the long edge is
    # TRUNCATED (torchvision _compute_resized_output_size uses int()), and
    # the crop offset is ROUNDED (crop_top = int(round((h - th) / 2.0))).
    target = max(th, tw)
    if img.width <= img.height:
        nw, nh = target, int(target * img.height / img.width)
    else:
        nw, nh = int(target * img.width / img.height), target
    img = img.resize((nw, nh), interp)
    left = int(round((nw - tw) / 2.0))
    top = int(round((nh - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def _random_translation(img, th, tw, rng, p=0.5):
    """Random2DTranslation (dassl transforms.py:43-86): with prob p, resize
    to 1.125x target then random-crop to target; else plain resize.  The
    reference always uses BILINEAR here (the cfg interpolation is not passed
    through, transforms.py:222-223)."""
    if rng.random() > p:
        return img.resize((tw, th), Image.BILINEAR)
    nw = int(round(tw * 1.125))
    nh = int(round(th * 1.125))
    img = img.resize((nw, nh), Image.BILINEAR)
    x1 = int(round(rng.uniform(0, nw - tw)))
    y1 = int(round(rng.uniform(0, nh - th)))
    return img.crop((x1, y1, x1 + tw, y1 + th))


def _pad_and_random_crop(img, size, padding, rng):
    th, tw = size
    arr = np.asarray(img)
    arr = np.pad(arr, ((padding, padding), (padding, padding), (0, 0)), mode="constant")
    h, w = arr.shape[:2]
    i = rng.randint(0, h - th)
    j = rng.randint(0, w - tw)
    return Image.fromarray(arr[i : i + th, j : j + tw])


def _color_jitter(img, cj, rng):
    """Documented divergence: torchvision ColorJitter shuffles all four ops
    (incl. hue) into one random order; here hue applies last (PIL has no
    composable hue enhancer) and uses integer HSV arithmetic.  Brightness/
    contrast/saturation factors and ranges match torchvision."""
    from PIL import ImageEnhance

    b, c, s, h = cj
    ops = []
    if b > 0:
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(rng.uniform(max(0, 1 - b), 1 + b)))
    if c > 0:
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(rng.uniform(max(0, 1 - c), 1 + c)))
    if s > 0:
        ops.append(lambda im: ImageEnhance.Color(im).enhance(rng.uniform(max(0, 1 - s), 1 + s)))
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    if h > 0:
        hsv = np.asarray(img.convert("HSV"), np.uint8).copy()
        shift = int(rng.uniform(-h, h) * 255)
        hsv[..., 0] = (hsv[..., 0].astype(int) + shift) % 256
        img = Image.fromarray(hsv, "HSV").convert("RGB")
    return img


def _cutout(x, n_holes, length, rng):
    h, w = x.shape[:2]
    for _ in range(n_holes):
        y = rng.randint(0, h - 1)
        xx = rng.randint(0, w - 1)
        y1, y2 = max(0, y - length // 2), min(h, y + length // 2)
        x1, x2 = max(0, xx - length // 2), min(w, xx + length // 2)
        x[y1:y2, x1:x2] = 0.0
    return x


def build_transform(cfg, is_train=True):
    """Factory mirroring dassl build_transform (transforms.py:176-203)."""
    if cfg.INPUT.NO_TRANSFORM:
        return TestTransform(cfg)
    return TrainTransform(cfg) if is_train else TestTransform(cfg)

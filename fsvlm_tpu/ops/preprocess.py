"""Device-side fused image preprocessing.

The reference decodes + augments on CPU worker processes per item
(dassl data_manager.py:244-256, transforms.py:326-354) and ships float32
tensors over H2D every step.  The TPU-native pipeline (BASELINE.json north
star) ships compact uint8 once and fuses random-resized-crop + flip +
CLIP-normalize into the jitted train step:

- host: decode each image once, resize shorter edge to a fixed pre-size,
  center-crop to (P, P, 3) uint8, cache in RAM (RawDatasetWrapper);
- device: per-step crop-box sampling (torchvision semantics: 10 area/ratio
  tries, first valid wins — vectorized, no data-dependent control flow),
  bilinear gather resample to the model resolution, horizontal flip,
  (x/255 - mean)/std — all inside the step, fused by XLA with the
  patch-embed matmul that consumes it.

H2D traffic drops 4x (uint8 vs f32) * (pre/out)^2, and zero host CPU is
spent on per-epoch augmentation.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD


def _sample_crop_box(key, height, width, scale, ratio=(3 / 4, 4 / 3), tries=10):
    """torchvision RandomResizedCrop box sampling, vectorized over tries.

    Returns (i, j, h, w) float32 scalars; falls back to a clamped-aspect
    center crop when no try is valid (transforms.py semantics).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = height * width
    target_area = area * jax.random.uniform(
        k1, (tries,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k2, (tries,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= width) & (h > 0) & (h <= height)
    idx = jnp.argmax(valid)  # first valid try
    any_valid = valid.any()

    w_sel = w[idx]
    h_sel = h[idx]
    u1 = jax.random.uniform(k3)
    u2 = jax.random.uniform(k4)
    i_sel = jnp.floor(u1 * (height - h_sel + 1))
    j_sel = jnp.floor(u2 * (width - w_sel + 1))

    # fallback: center crop with aspect clamped to the ratio range
    in_ratio = width / height
    fb_w = jnp.where(
        in_ratio < ratio[0],
        width,
        jnp.where(in_ratio > ratio[1], jnp.round(height * ratio[1]), width),
    )
    fb_h = jnp.where(
        in_ratio < ratio[0],
        jnp.round(width / ratio[0]),
        jnp.where(in_ratio > ratio[1], height, height),
    )
    fb_i = jnp.round((height - fb_h) / 2.0)
    fb_j = jnp.round((width - fb_w) / 2.0)

    i = jnp.where(any_valid, i_sel, fb_i)
    j = jnp.where(any_valid, j_sel, fb_j)
    h = jnp.where(any_valid, h_sel, fb_h)
    w = jnp.where(any_valid, w_sel, fb_w)
    return i, j, h, w


def _bilinear_crop_resize(img, i, j, h, w, out_size, flip):
    """Sample an (out, out) bilinear resize of img[i:i+h, j:j+w]."""
    out = out_size
    ys = i + (jnp.arange(out, dtype=jnp.float32) + 0.5) * h / out - 0.5
    xs = j + (jnp.arange(out, dtype=jnp.float32) + 0.5) * w / out - 0.5
    xs = jnp.where(flip, j + w - 1 - (xs - j), xs)

    H, W = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)

    y0, y1, x0, x1 = y0.astype(jnp.int32), y1.astype(jnp.int32), x0.astype(jnp.int32), x1.astype(jnp.int32)

    imgf = img.astype(jnp.float32)
    top = imgf[y0][:, x0] * (1 - wx)[None, :, None] + imgf[y0][:, x1] * wx[None, :, None]
    bot = imgf[y1][:, x0] * (1 - wx)[None, :, None] + imgf[y1][:, x1] * wx[None, :, None]
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


@functools.partial(jax.jit, static_argnames=("out_size", "scale"))
def random_resized_crop_flip_normalize(
    images, key, out_size=224, scale=(0.08, 1.0), mean=None, std=None
):
    """images: (B, P, P, 3) uint8 -> (B, out, out, 3) float32 normalized."""
    B, H, W, _ = images.shape
    mean = jnp.asarray(mean if mean is not None else CLIP_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else CLIP_PIXEL_STD, jnp.float32)

    keys = jax.random.split(key, B + 1)
    flip_bits = jax.random.bernoulli(keys[0], 0.5, (B,))

    def one(img, k, flip):
        i, j, h, w = _sample_crop_box(k, H, W, scale)
        x = _bilinear_crop_resize(img, i, j, h, w, out_size, flip)
        return ((x / 255.0) - mean) / std

    return jax.vmap(one)(images, keys[1:], flip_bits)


@functools.partial(jax.jit, static_argnames=("out_size",))
def normalize_only(images, out_size=None, mean=None, std=None):
    """uint8 (B, S, S, 3) -> normalized float32 (deterministic eval path)."""
    mean = jnp.asarray(mean if mean is not None else CLIP_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else CLIP_PIXEL_STD, jnp.float32)
    return ((images.astype(jnp.float32) / 255.0) - mean) / std

"""Functional CLIP forward passes (ViT + text transformer).

Parity targets (reference, PromptSRC/clip/model.py):
- VisionTransformer.forward        :401-431  (+ VPT shallow append :413-415)
- CLIP.encode_text                 :604-619  (EOT gather @ text_projection)
- CLIP.forward                     :621-636  (normalized cosine logits)

Design departures (TPU-first, SURVEY.md §7.1):
- Batch-major (B, L, D) everywhere; no NLD<->LND permutes.
- Patch embedding is an explicit unfold+matmul, guaranteed to hit the MXU.
- Activations run in a configurable compute dtype (bf16 on TPU); LayerNorm,
  softmax and the final logit math stay fp32.
- Prompts are pure function arguments, never module state.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ...ops.attention import causal_mask
from ...ops.layers import layer_norm
from .transformer import transformer


class VisionPrompts(NamedTuple):
    """Vision-side prompt bundle.

    shallow: (n_ctx, W) tokens appended after patch+cls tokens (VPT shallow,
      clip/model.py:413-415).
    deep: optional (n_layers, n_ctx, W) per-layer replacement tokens, row i
      consumed at layer i when flags[i] (IVLP/MaPLe deep prompting).
    flags: (n_layers,) bool.
    """

    shallow: jnp.ndarray
    deep: Optional[jnp.ndarray] = None
    flags: Optional[jnp.ndarray] = None


def patch_embed(images, kernel):
    """Non-overlapping conv as unfold + matmul.

    images: (B, H, W, 3) NHWC. kernel: (P, P, 3, width) HWIO.
    Returns (B, grid*grid, width).
    """
    B, H, W, C = images.shape
    P = kernel.shape[0]
    gh, gw = H // P, W // P
    x = images.reshape(B, gh, P, gw, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * C)
    k = kernel.reshape(P * P * C, -1).astype(x.dtype)
    return jnp.dot(x, k, preferred_element_type=x.dtype)


def encode_image_vit(
    params,
    cfg,
    images,
    prompts: Optional[VisionPrompts] = None,
    compute_dtype=jnp.float32,
    lora=None,
    remat=False,
    collect_gemm_amax=False,
):
    """ViT image tower. images: (B, H, W, 3) already CLIP-normalized.

    collect_gemm_amax=True returns (features, (n_layers, 4) amax of the
    four per-block GEMM inputs) — the int8 static-scale calibration hook
    (ops.quant.calibrate_visual_amax)."""
    v = params["visual"]
    x = patch_embed(images.astype(compute_dtype), v["patch_embed"])
    B = x.shape[0]
    W = x.shape[-1]

    cls = jnp.broadcast_to(v["class_embedding"].astype(compute_dtype), (B, 1, W))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"].astype(compute_dtype)

    deep = flags = None
    if prompts is not None:
        shallow = jnp.broadcast_to(
            prompts.shallow.astype(compute_dtype),
            (B, prompts.shallow.shape[0], W),
        )
        x = jnp.concatenate([x, shallow], axis=1)
        deep, flags = prompts.deep, prompts.flags

    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])
    x = transformer(
        v["blocks"],
        x,
        n_heads=cfg.vision_heads,
        deep_prompts=None if deep is None else deep.astype(compute_dtype),
        splice_flags=flags,
        splice_kind="vision",
        lora=lora,
        remat=remat,
        collect_gemm_amax=collect_gemm_amax,
    )
    amax = None
    if collect_gemm_amax:
        x, amax = x
    x = layer_norm(x[:, 0, :], v["ln_post"]["scale"], v["ln_post"]["bias"])
    feats = x.astype(jnp.float32) @ v["proj"].astype(jnp.float32)
    return (feats, amax) if collect_gemm_amax else feats


def embed_tokens(params, token_ids, compute_dtype=jnp.float32):
    """token ids (B, L) -> embeddings (B, L, D)."""
    return params["text"]["token_embedding"][token_ids].astype(compute_dtype)


def encode_text_embeds(
    params,
    cfg,
    embeds,
    eot_idx,
    deep_prompts=None,
    splice_flags=None,
    compute_dtype=jnp.float32,
    lora=None,
    remat=False,
):
    """Text tower over pre-built embeddings (prompt-learner path).

    embeds: (B, 77, D) token embeddings (prefix ‖ learned ctx ‖ suffix).
    eot_idx: (B,) position of the EOT token (= tokenized.argmax(-1) in the
      reference, trainers/coop.py:186-205).
    """
    t = params["text"]
    # embeds may be EOT-truncated (< context_length): with the causal mask,
    # positions past the last EOT cannot influence any gathered feature, so
    # dropping them is exact (see trainers/prompts.py truncation)
    L = embeds.shape[1]
    x = embeds.astype(compute_dtype) + t["positional_embedding"][:L].astype(compute_dtype)
    mask = causal_mask(L)
    x = transformer(
        t["blocks"],
        x,
        n_heads=cfg.transformer_heads,
        mask=mask,
        deep_prompts=None if deep_prompts is None else deep_prompts.astype(compute_dtype),
        splice_flags=splice_flags,
        splice_kind="text",
        lora=lora,
        remat=remat,
    )
    x = layer_norm(x, t["ln_final"]["scale"], t["ln_final"]["bias"])
    x = x[jnp.arange(x.shape[0]), eot_idx]
    return x.astype(jnp.float32) @ t["text_projection"].astype(jnp.float32)


def encode_text_ids(params, cfg, token_ids, compute_dtype=jnp.float32, **kw):
    """Text tower from raw token ids (zero-shot path; clip/model.py:604-619)."""
    embeds = embed_tokens(params, token_ids, compute_dtype)
    eot_idx = jnp.argmax(token_ids, axis=-1)
    return encode_text_embeds(params, cfg, embeds, eot_idx, compute_dtype=compute_dtype, **kw)


def encode_image(params, cfg, images, **kw):
    if cfg.is_vit:
        return encode_image_vit(params, cfg, images, **kw)
    from .resnet import encode_image_resnet

    kw.pop("prompts", None)  # prompting is ViT-only, as in the reference
    kw.pop("lora", None)
    kw.pop("remat", None)
    kw.pop("collect_gemm_amax", None)  # int8 calibration is ViT-only
    return encode_image_resnet(params, cfg, images, **kw)


def l2_normalize(x, axis=-1, eps=0.0):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def clip_logits(image_features, text_features, logit_scale):
    """Cosine-similarity logits (clip/model.py:621-636).

    Inputs are unnormalized feature matrices; returns logits_per_image.
    """
    imf = l2_normalize(image_features.astype(jnp.float32))
    txf = l2_normalize(text_features.astype(jnp.float32))
    return jnp.exp(logit_scale.astype(jnp.float32)) * imf @ txf.T

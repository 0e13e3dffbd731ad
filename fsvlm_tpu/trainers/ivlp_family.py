"""Shared machinery for the independent V-L prompting family
(IVLP, PromptSRC, PLIP, LoRA's prompt side).

Reference: VLPromptLearner (trainers/independentVL.py:194-256,
promptsrc.py:73-171) + the learnable VPT/VPT_shallow parameters the reference
buries inside encoder blocks (clip/model.py:191-258, 370-433).  Here every
prompt is an explicit leaf of the trainable pytree:

  params = {
    "ctx":          (n_ctx_text, D)        first-layer text context
    "text_deep":    (depth_t-1, n_ctx_text, D)   layers 1..depth_t-1
    "vpt_shallow":  (n_ctx_vis, W)         first-layer vision tokens
    "vision_deep":  (depth_v-1, n_ctx_vis, W)    layers 1..depth_v-1
  }
(entries absent when the corresponding depth/length is 0.)
"""

import jax.numpy as jnp
import numpy as np

from ..models.clip import VisionPrompts, encode_image, encode_text_embeds
from .prompts import assemble_prompts, build_prompt_context


def init_vlp_params(cfg_node, clip_cfg, prompt_ctx, rng):
    """Build the trainable pytree for an IVLP-style trainer config node
    (TRAINER.IVLP / TRAINER.PROMPTSRC / TRAINER.PLIP / TRAINER.LORA)."""
    assert cfg_node.PROMPT_DEPTH_TEXT >= 1 or cfg_node.N_CTX_TEXT == 0, (
        "In Independent VL prompting, language prompt depth should be >= 1"
    )
    D = clip_cfg.transformer_width
    W = clip_cfg.vision_width
    params = {}
    if cfg_node.N_CTX_TEXT > 0:
        params["ctx"] = jnp.asarray(prompt_ctx["init_ctx"])
        depth_t = min(cfg_node.PROMPT_DEPTH_TEXT, clip_cfg.transformer_layers)
        if depth_t > 1:
            params["text_deep"] = jnp.asarray(
                rng.normal(0, 0.02, (depth_t - 1, cfg_node.N_CTX_TEXT, D)).astype(
                    np.float32
                )
            )
    if cfg_node.N_CTX_VISION > 0 and cfg_node.PROMPT_DEPTH_VISION > 0:
        params["vpt_shallow"] = jnp.asarray(
            rng.normal(0, 0.02, (cfg_node.N_CTX_VISION, W)).astype(np.float32)
        )
        depth_v = min(cfg_node.PROMPT_DEPTH_VISION, clip_cfg.vision_layers)
        if depth_v > 1:
            params["vision_deep"] = jnp.asarray(
                rng.normal(0, 0.02, (depth_v - 1, cfg_node.N_CTX_VISION, W)).astype(
                    np.float32
                )
            )
    return params


def _pad_deep(deep, n_layers):
    """(depth-1, n, d) -> ((n_layers, n, d), flags) with rows 1..depth-1 active."""
    depth_minus1 = deep.shape[0]
    pad = jnp.zeros((n_layers - 1 - depth_minus1,) + deep.shape[1:], deep.dtype)
    full = jnp.concatenate(
        [jnp.zeros((1,) + deep.shape[1:], deep.dtype), deep, pad], axis=0
    )
    flags = np.zeros(n_layers, bool)
    flags[1 : 1 + depth_minus1] = True
    return full, jnp.asarray(flags)


def vlp_text_features(params, frozen, clip_cfg, compute_dtype, lora=None, remat=False):
    """Text tower with first-layer ctx splice + deep prompt replacement."""
    prompts = assemble_prompts(
        params["ctx"], frozen["base_embed"], frozen["ctx_scatter"]
    )
    deep = flags = None
    if "text_deep" in params:
        deep, flags = _pad_deep(params["text_deep"], clip_cfg.transformer_layers)
    return encode_text_embeds(
        frozen["clip"],
        clip_cfg,
        prompts,
        frozen["eot_idx"],
        deep_prompts=deep,
        splice_flags=flags,
        compute_dtype=compute_dtype,
        lora=lora,
        remat=remat,
    )


def vlp_image_features(params, frozen, clip_cfg, images, compute_dtype, lora=None, remat=False):
    """Image tower with optional shallow + deep vision prompts."""
    vision_prompts = None
    if "vpt_shallow" in params:
        deep = flags = None
        if "vision_deep" in params:
            deep, flags = _pad_deep(params["vision_deep"], clip_cfg.vision_layers)
        vision_prompts = VisionPrompts(
            shallow=params["vpt_shallow"], deep=deep, flags=flags
        )
    return encode_image(
        frozen["clip"],
        clip_cfg,
        images,
        prompts=vision_prompts,
        compute_dtype=compute_dtype,
        lora=lora,
        remat=remat,
    )


def build_vlp_frozen(cfg, cfg_node, clip_params, clip_cfg, classnames, seed):
    """Frozen pytree shared by the family: towers + text prompt assembly."""
    # phrase-init only when n_ctx <= 4, as in the reference (promptsrc.py:90)
    pc = build_prompt_context(
        clip_params,
        classnames,
        n_ctx=cfg_node.N_CTX_TEXT,
        ctx_init=cfg_node.CTX_INIT if cfg_node.N_CTX_TEXT <= 4 else "",
        class_token_position="end",
        rng=np.random.RandomState(max(seed, 0)),
        context_length=clip_cfg.context_length,
        init_keep_n_ctx=True,
        truncate=bool(cfg.MODEL.TEXT_TRUNCATE),
    )
    print("Independent V-L design")
    print(f'Initial text context: "{pc["prompt_prefix"]}"')
    print(f"Number of context words (tokens) for Language prompting: {pc['n_ctx']}")
    print(f"Number of context words (tokens) for Vision prompting: {cfg_node.N_CTX_VISION}")
    frozen = {
        "clip": clip_params,
        "base_embed": jnp.asarray(pc["base_embed"]),
        "ctx_scatter": jnp.asarray(pc["ctx_scatter"]),
        "eot_idx": jnp.asarray(pc["eot_idx"]),
    }
    return frozen, pc

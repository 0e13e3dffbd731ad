"""MaPLe: multi-modal prompt learning with coupled text->vision prompts.

Parity target: PromptSRC/trainers/maple.py — shared text ctx projected to
vision width by ``proj: Linear(ctx_dim, 768)`` (:145-147), per-depth compound
text prompts with per-depth Linear projections to vision prompts
(:150-157), the prompts threaded through both towers (clip/model.py:287-331,
454-485).

Trainable pytree: ctx, proj{w,b}, compound_text (depth-1, n_ctx, D),
compound_proj{w (depth-1, D, W), b (depth-1, W)}.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import (
    VisionPrompts,
    encode_image,
    encode_text_embeds,
    l2_normalize,
)
from .backbone import load_clip_backbone
from .cocoop import _init_linear
from .losses import cross_entropy, focal_alpha_from_shots, focal_loss, masked_acc
from .prompts import assemble_prompts, build_prompt_context


@TRAINER_REGISTRY.register()
class MaPLe(SimpleTrainer):
    model_name = "MultiModalPromptLearner"

    def check_cfg(self, cfg):
        assert cfg.TRAINER.MAPLE.PREC in ["fp16", "fp32", "amp", "bf16"]
        assert cfg.TRAINER.MAPLE.PROMPT_DEPTH >= 1

    def compute_dtype(self):
        if self.cfg.TRAINER.MAPLE.PREC == "fp32":
            return jnp.float32
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER.MAPLE
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg

        n_ctx = node.N_CTX
        depth = min(node.PROMPT_DEPTH, clip_cfg.transformer_layers)
        D = clip_cfg.transformer_width
        W = clip_cfg.vision_width
        rng = np.random.RandomState(max(cfg.SEED, 0))

        pc = build_prompt_context(
            clip_params,
            classnames,
            n_ctx=n_ctx,
            ctx_init=node.CTX_INIT if n_ctx <= 4 else "",
            class_token_position="end",
            rng=rng,
            context_length=clip_cfg.context_length,
            init_keep_n_ctx=True,
            truncate=bool(cfg.MODEL.TEXT_TRUNCATE),
        )
        print("MaPLe design: Multi-modal Prompt Learning")
        print(f'Initial context: "{pc["prompt_prefix"]}"')
        print(f"Number of MaPLe context words (tokens): {pc['n_ctx']}")

        proj_w, proj_b = _init_linear(rng, D, W)
        params = {"ctx": jnp.asarray(pc["init_ctx"]), "proj": {"w": proj_w, "b": proj_b}}
        if depth > 1:
            params["compound_text"] = jnp.asarray(
                rng.normal(0, 0.02, (depth - 1, n_ctx, D)).astype(np.float32)
            )
            ws, bs = [], []
            for _ in range(depth - 1):
                w, b = _init_linear(rng, D, W)
                ws.append(w)
                bs.append(b)
            params["compound_proj"] = {"w": jnp.stack(ws), "b": jnp.stack(bs)}
        self.params = params

        alpha = None
        if node.USE_FOCAL_LOSS and len(cfg.DATASET.PER_CLASS_SHOTS) > 0:
            alpha = focal_alpha_from_shots(cfg.DATASET.PER_CLASS_SHOTS)
        self.frozen = {
            "clip": clip_params,
            "base_embed": jnp.asarray(pc["base_embed"]),
            "ctx_scatter": jnp.asarray(pc["ctx_scatter"]),
            "eot_idx": jnp.asarray(pc["eot_idx"]),
            "alpha": alpha,
        }

        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg
        use_focal = bool(node.USE_FOCAL_LOSS)
        n_layers_t = clip_cfg.transformer_layers
        n_layers_v = clip_cfg.vision_layers

        def make_deep(rows, n_layers):
            """(depth-1, n, d) rows -> full (n_layers, n, d) + bool flags."""
            k = rows.shape[0]
            pad = jnp.zeros((n_layers - 1 - k,) + rows.shape[1:], rows.dtype)
            full = jnp.concatenate(
                [jnp.zeros((1,) + rows.shape[1:], rows.dtype), rows, pad], axis=0
            )
            flags = np.zeros(n_layers, bool)
            flags[1 : 1 + k] = True
            return full, jnp.asarray(flags)

        def text_features(params, frozen):
            prompts = assemble_prompts(
                params["ctx"], frozen["base_embed"], frozen["ctx_scatter"]
            )
            deep_t = flags_t = None
            if "compound_text" in params:
                deep_t, flags_t = make_deep(params["compound_text"], n_layers_t)
            return l2_normalize(
                encode_text_embeds(
                    frozen["clip"],
                    clip_cfg_,
                    prompts,
                    frozen["eot_idx"],
                    deep_prompts=deep_t,
                    splice_flags=flags_t,
                    compute_dtype=dtype,
                )
            )

        def image_features(params, frozen, images):
            deep_v = flags_v = None
            if "compound_text" in params:
                # per-depth linear projections of the text prompts
                proj_rows = (
                    jnp.einsum(
                        "knd,kdw->knw",
                        params["compound_text"],
                        params["compound_proj"]["w"],
                    )
                    + params["compound_proj"]["b"][:, None, :]
                )
                deep_v, flags_v = make_deep(proj_rows, n_layers_v)
            shared_vis_ctx = params["ctx"] @ params["proj"]["w"] + params["proj"]["b"]
            return l2_normalize(
                encode_image(
                    frozen["clip"],
                    clip_cfg_,
                    images,
                    prompts=VisionPrompts(
                        shallow=shared_vis_ctx, deep=deep_v, flags=flags_v
                    ),
                    compute_dtype=dtype,
                )
            )

        def towers(params, frozen, images):
            return image_features(params, frozen, images), text_features(params, frozen)

        def logits_of(params, frozen, images):
            imf, txf = towers(params, frozen, images)
            return jnp.exp(frozen["clip"]["logit_scale"]) * imf @ txf.T

        def loss_fn(params, frozen, batch, rng_key):
            logits = logits_of(params, frozen, batch["img"])
            if use_focal:
                loss = focal_loss(
                    logits, batch["label"], alpha=frozen["alpha"],
                    valid=batch.get("valid"),
                )
            else:
                loss = cross_entropy(logits, batch["label"], valid=batch.get("valid"))
            acc = masked_acc(logits, batch["label"], batch.get("valid"))
            return loss, {"acc": acc}

        self.loss_fn = loss_fn
        self.logits_fn = logits_of
        self.text_features_fn = text_features
        self.image_logits_fn = lambda p, f, images, txf: (
            jnp.exp(f["clip"]["logit_scale"]) * image_features(p, f, images) @ txf.T
        )

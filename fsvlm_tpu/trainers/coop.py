"""CoOp: Context Optimization prompt tuning.

Parity target: PromptSRC/trainers/coop.py — learnable text context vectors
(unified or class-specific; class token end/middle/front), frozen CLIP
towers, loss_type ∈ {ce, focal, simclr} with the fork's logit-space NT-Xent
(coop.py:66-128) and inverse-frequency focal alpha (coop.py:326-346).

Functional design: the trainable pytree is just {"ctx"}; everything else
(towers, prompt base embedding, scatter map, focal alpha) is frozen.  The
text encoder runs over all n_cls assembled prompts each step — identical to
the reference's CustomCLIP.forward_once (coop.py:362-374), but the backward
pass touches only the ctx path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import clip_logits, encode_image, encode_text_embeds, l2_normalize
from .backbone import load_clip_backbone
from .losses import (
    cross_entropy,
    focal_alpha_from_shots,
    focal_loss,
    masked_acc,
    nt_xent,
)
from .prompts import assemble_prompts, build_prompt_context


@TRAINER_REGISTRY.register()
class CoOp(SimpleTrainer):
    model_name = "prompt_learner"

    def check_cfg(self, cfg):
        assert cfg.TRAINER.COOP.PREC in ["fp16", "fp32", "amp", "bf16"]

    def compute_dtype(self):
        # bf16 activations on TPU replace the reference's fp16+AMP machinery;
        # fp32 on CPU test meshes
        prec = self.cfg.TRAINER.COOP.PREC
        if prec == "fp32":
            return jnp.float32
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg

        tc = cfg.TRAINER.COOP
        pc = build_prompt_context(
            clip_params,
            classnames,
            n_ctx=tc.N_CTX,
            ctx_init=tc.CTX_INIT,
            class_token_position=tc.CLASS_TOKEN_POSITION,
            csc=tc.CSC,
            rng=np.random.RandomState(max(cfg.SEED, 0)),
            context_length=clip_cfg.context_length,
            truncate=bool(cfg.MODEL.TEXT_TRUNCATE),
        )
        print(f'Initial context: "{pc["prompt_prefix"]}"')
        print(f'Number of context words (tokens): {pc["n_ctx"]}')

        self.loss_type = tc.LOSS_TYPE
        if tc.USE_FOCAL_LOSS and self.loss_type == "ce":
            self.loss_type = "focal"
        alpha = None
        if self.loss_type == "focal" and len(cfg.DATASET.PER_CLASS_SHOTS) > 0:
            alpha = focal_alpha_from_shots(cfg.DATASET.PER_CLASS_SHOTS)

        self.params = {"ctx": jnp.asarray(pc["init_ctx"])}
        self.frozen = {
            "clip": clip_params,
            "base_embed": jnp.asarray(pc["base_embed"]),
            "ctx_scatter": jnp.asarray(pc["ctx_scatter"]),
            "eot_idx": jnp.asarray(pc["eot_idx"]),
            "alpha": alpha,
        }

        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg
        loss_type = self.loss_type

        def text_features(params, frozen):
            prompts = assemble_prompts(
                params["ctx"], frozen["base_embed"], frozen["ctx_scatter"]
            )
            return encode_text_embeds(
                frozen["clip"],
                clip_cfg_,
                prompts,
                frozen["eot_idx"],
                compute_dtype=dtype,
            )

        def logits_of(params, frozen, images):
            imf = encode_image(
                jax.lax.stop_gradient(frozen["clip"]), clip_cfg_, images,
                compute_dtype=dtype,
            )
            txf = text_features(params, frozen)
            return clip_logits(imf, txf, frozen["clip"]["logit_scale"])

        def loss_fn(params, frozen, batch, rng):
            valid = batch.get("valid")
            if loss_type == "simclr":
                logits1 = logits_of(params, frozen, batch["img"])
                logits2 = logits_of(params, frozen, batch["img2"])
                loss = nt_xent(logits1, logits2, valid=valid)
                return loss, {}
            logits = logits_of(params, frozen, batch["img"])
            if loss_type == "focal":
                loss = focal_loss(
                    logits, batch["label"], alpha=frozen["alpha"], valid=valid
                )
            else:
                loss = cross_entropy(logits, batch["label"], valid=valid)
            acc = masked_acc(logits, batch["label"], valid)
            return loss, {"acc": acc}

        self.loss_fn = loss_fn
        self.logits_fn = logits_of
        # split eval: class text features computed once per test() call
        self.text_features_fn = lambda p, f: l2_normalize(text_features(p, f))
        self.image_logits_fn = lambda p, f, images, txf: (
            jnp.exp(f["clip"]["logit_scale"])
            * l2_normalize(encode_image(f["clip"], clip_cfg_, images, compute_dtype=dtype))
            @ txf.T
        )

"""PLIP: prompt tuning with Lipschitz-smoothness regularization.

Parity target: PromptSRC/trainers/plip.py — three regularization modes
(:186-310):
- "grad": double-backward penalty pulling the per-token L2 norm of
  d(CE)/d(ctx) toward K: mean((||g_i|| - K)^2) (plip.py:269-279) — expressed
  here as higher-order AD under one jit (SURVEY.md §7.3).
- "svd": ctx reparameterized as U diag(S) Vh with only the singular values S
  trainable (plip.py:102-109,139-141).
- "spectral_norm": 5-step power-iteration estimate of ||ctx||_2 as the
  penalty (plip.py:301-310); the start vector derives from the step rng.

Known reference quirk deliberately not replicated: the amp branch references
a nonexistent self.criterion (plip.py:258-259).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import clip_logits, encode_image, encode_text_embeds
from .backbone import load_clip_backbone
from .losses import cross_entropy, masked_acc
from .prompts import assemble_prompts, build_prompt_context


@TRAINER_REGISTRY.register()
class PLIP(SimpleTrainer):
    model_name = "prompt_learner"

    def check_cfg(self, cfg):
        assert cfg.TRAINER.PLIP.PREC in ["fp16", "fp32", "amp", "bf16"]
        assert cfg.TRAINER.PLIP.REG_TYPE in ["grad", "svd", "spectral_norm"]

    def compute_dtype(self):
        if self.cfg.TRAINER.PLIP.PREC == "fp32":
            return jnp.float32
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER.PLIP
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg

        rng = np.random.RandomState(max(cfg.SEED, 0))
        pc = build_prompt_context(
            clip_params,
            classnames,
            n_ctx=node.N_CTX_TEXT,
            ctx_init=node.CTX_INIT,
            class_token_position="end",
            rng=rng,
            context_length=clip_cfg.context_length,
            init_keep_n_ctx=True,
            truncate=bool(cfg.MODEL.TEXT_TRUNCATE),
        )
        print(f'Initial context: "{pc["prompt_prefix"]}"')
        print("K:", node.K)
        print("REG_COEFF:", node.REG_COEFF)

        reg_type = node.REG_TYPE
        self.reg_type = reg_type
        init_ctx = np.asarray(pc["init_ctx"], np.float32)

        frozen = {
            "clip": clip_params,
            "base_embed": jnp.asarray(pc["base_embed"]),
            "ctx_scatter": jnp.asarray(pc["ctx_scatter"]),
            "eot_idx": jnp.asarray(pc["eot_idx"]),
        }
        if reg_type == "svd":
            u, s, vh = np.linalg.svd(init_ctx, full_matrices=False)
            self.params = {"S": jnp.asarray(s)}
            frozen["U"] = jnp.asarray(u)
            frozen["Vh"] = jnp.asarray(vh)
        else:
            self.params = {"ctx": jnp.asarray(init_ctx)}
        self.frozen = frozen

        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg
        K = float(node.K)
        coeff = float(node.REG_COEFF)

        def get_ctx(params, frozen):
            if reg_type == "svd":
                return frozen["U"] @ jnp.diag(params["S"]) @ frozen["Vh"]
            return params["ctx"]

        def logits_from_ctx(ctx, frozen, images):
            prompts = assemble_prompts(ctx, frozen["base_embed"], frozen["ctx_scatter"])
            txf = encode_text_embeds(
                frozen["clip"], clip_cfg_, prompts, frozen["eot_idx"], compute_dtype=dtype
            )
            imf = encode_image(frozen["clip"], clip_cfg_, images, compute_dtype=dtype)
            return clip_logits(imf, txf, frozen["clip"]["logit_scale"])

        def logits_of(params, frozen, images):
            return logits_from_ctx(get_ctx(params, frozen), frozen, images)

        def loss_fn(params, frozen, batch, rng_key):
            ctx = get_ctx(params, frozen)
            images, labels = batch["img"], batch["label"]
            valid = batch.get("valid")

            def ce_of_ctx(c):
                logits = logits_from_ctx(c, frozen, images)
                return cross_entropy(logits, labels, valid=valid), logits

            if reg_type == "grad":
                (ce, logits), g = jax.value_and_grad(ce_of_ctx, has_aux=True)(ctx)
                norms = jnp.linalg.norm(g, axis=1)
                penalty = jnp.mean((norms - K) ** 2)
            elif reg_type == "spectral_norm":
                ce, logits = ce_of_ctx(ctx)
                v = jax.random.normal(rng_key, (ctx.shape[1],), jnp.float32)
                v = v / jnp.linalg.norm(v)
                gram = ctx.T @ ctx

                def body(_, v):
                    v = gram @ v
                    return v / jnp.linalg.norm(v)

                v = jax.lax.fori_loop(0, 5, body, v)
                penalty = jnp.linalg.norm(ctx @ v)
            else:  # svd: no extra penalty, constraint lives in the parameterization
                ce, logits = ce_of_ctx(ctx)
                penalty = 0.0

            loss = ce + coeff * penalty
            acc = masked_acc(logits, labels, valid)
            return loss, {"penalty": jnp.asarray(penalty, jnp.float32), "acc": acc}

        self.loss_fn = loss_fn
        self.logits_fn = logits_of

        def text_features(params, frozen):
            ctx = get_ctx(params, frozen)
            prompts = assemble_prompts(ctx, frozen["base_embed"], frozen["ctx_scatter"])
            txf = encode_text_embeds(
                frozen["clip"], clip_cfg_, prompts, frozen["eot_idx"], compute_dtype=dtype
            )
            return txf / jnp.linalg.norm(txf, axis=-1, keepdims=True)

        self.text_features_fn = text_features
        self.image_logits_fn = lambda p, f, images, txf: (
            jnp.exp(f["clip"]["logit_scale"])
            * (lambda v: v / jnp.linalg.norm(v, axis=-1, keepdims=True))(
                encode_image(f["clip"], clip_cfg_, images, compute_dtype=dtype)
            )
            @ txf.T
        )

"""CoCoOp: conditional context optimization.

Parity target: PromptSRC/trainers/cocoop.py — a meta-net MLP
(vis_dim -> vis_dim/16 -> ctx_dim, :139-143) produces a per-image bias added
to the shared context; each image then gets its own n_cls text-encoder pass.

TPU-first redesign (SURVEY.md §3.3/§7.1): the reference's Python loops over
the batch (cocoop.py:189-197 prompt build, :247-251 per-image text forward)
become one batched pass — prompts (B, n_cls, L, D) are assembled with a
single einsum and flattened to (B*n_cls, L, D) through the text tower.  This
is why the reference needs batch_size=1; here any batch size compiles to one
fused program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import encode_image, encode_text_embeds, l2_normalize
from .backbone import load_clip_backbone
from .losses import cross_entropy, focal_alpha_from_shots, focal_loss, masked_acc
from .prompts import build_prompt_context


# Above this batch*n_cls product the train/eval forward switches from the
# fully-batched text pass to the bounded-memory lax.map formulation (one
# image's n_cls text forwards live at a time).  Module-level so tests can
# force the lax.map branch at tiny scale.
BATCHED_TEXT_LIMIT = 4096


def _init_linear(rng, fan_in, fan_out):
    """torch nn.Linear default init (kaiming uniform, a=sqrt(5))."""
    bound = 1.0 / np.sqrt(fan_in)
    w = rng.uniform(-bound, bound, size=(fan_in, fan_out)).astype(np.float32)
    b = rng.uniform(-bound, bound, size=(fan_out,)).astype(np.float32)
    return jnp.asarray(w), jnp.asarray(b)


@TRAINER_REGISTRY.register()
class CoCoOp(SimpleTrainer):
    model_name = "prompt_learner"

    def check_cfg(self, cfg):
        assert cfg.TRAINER.COCOOP.PREC in ["fp16", "fp32", "amp", "bf16"]

    def compute_dtype(self):
        if self.cfg.TRAINER.COCOOP.PREC == "fp32":
            return jnp.float32
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER.COCOOP
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg

        rng = np.random.RandomState(max(cfg.SEED, 0))
        pc = build_prompt_context(
            clip_params,
            classnames,
            n_ctx=node.N_CTX,
            ctx_init=node.CTX_INIT,
            class_token_position="end",
            rng=rng,
            context_length=clip_cfg.context_length,
            truncate=bool(cfg.MODEL.TEXT_TRUNCATE),
        )
        print(f'Initial context: "{pc["prompt_prefix"]}"')

        vis_dim = clip_cfg.embed_dim
        ctx_dim = clip_cfg.transformer_width
        hidden = max(vis_dim // 16, 1)
        w1, b1 = _init_linear(rng, vis_dim, hidden)
        w2, b2 = _init_linear(rng, hidden, ctx_dim)

        self.params = {
            "ctx": jnp.asarray(pc["init_ctx"]),
            "meta_net": {"w1": w1, "b1": b1, "w2": w2, "b2": b2},
        }
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
        use_focal = bool(node.USE_FOCAL_LOSS)
        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg
        # TRAIN.REMAT matters here more than anywhere: the fully-batched
        # path differentiates B*n_cls text forwards in one graph (measured:
        # bs 32 x 100 classes overruns a v5e chip's HBM without it)
        remat = bool(cfg.TRAIN.REMAT)

        n_cls = len(classnames)

        def logits_of(params, frozen, images):
            imf = l2_normalize(
                encode_image(frozen["clip"], clip_cfg_, images, compute_dtype=dtype)
            )
            # meta-net bias per image
            h = jnp.maximum(imf @ params["meta_net"]["w1"] + params["meta_net"]["b1"], 0.0)
            bias = h @ params["meta_net"]["w2"] + params["meta_net"]["b2"]  # (B, D)
            ctx = params["ctx"][None] + bias[:, None, :]  # (B, n_ctx, D)
            scale = jnp.exp(frozen["clip"]["logit_scale"])

            def text_logits(args):
                """All n_cls conditioned prompts for one image -> (n_cls,)."""
                ctx_i, imf_i = args
                delta = jnp.einsum(
                    "cpj,jd->cpd", frozen["ctx_scatter"], ctx_i.astype(jnp.float32)
                )
                prompts = frozen["base_embed"] + delta
                txf = l2_normalize(
                    encode_text_embeds(
                        frozen["clip"],
                        clip_cfg_,
                        prompts,
                        frozen["eot_idx"],
                        compute_dtype=dtype,
                        remat=remat,
                    ),
                    axis=-1,
                )
                return scale * txf @ imf_i

            B = images.shape[0]
            if B * n_cls <= BATCHED_TEXT_LIMIT:
                # fully batched: one flattened pass through the text tower
                return scale * jnp.einsum(
                    "be,bce->bc", imf, _batched_text_features(params, frozen, ctx)
                )
            # bounded-memory path for large batch x class products: lax.map
            # keeps one image's n_cls text forwards live at a time (still no
            # python loops — contrast cocoop.py:247-251)
            return jax.lax.map(text_logits, (ctx, imf))

        def _batched_text_features(params, frozen, ctx):
            delta = jnp.einsum(
                "cpj,bjd->bcpd", frozen["ctx_scatter"], ctx.astype(jnp.float32)
            )
            prompts = frozen["base_embed"][None] + delta
            B, C, L, D = prompts.shape
            txf = encode_text_embeds(
                frozen["clip"],
                clip_cfg_,
                prompts.reshape(B * C, L, D),
                jnp.tile(frozen["eot_idx"], B),
                compute_dtype=dtype,
                remat=remat,
            ).reshape(B, C, -1)
            return l2_normalize(txf, axis=-1)

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

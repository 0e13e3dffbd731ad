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

At the reference's hard scale — ImageNet-base, 500 classes
(configs/trainers/CoCoOp/vit_b16_c4_ep10_batch1.yaml is batch_size=1 for
exactly this reason) — even the flattened pass overruns HBM, so past
BATCHED_TEXT_LIMIT the forward switches to a CLASS-CHUNKED lax.scan: class
blocks of size TRAINER.COCOOP.CLASS_CHUNK (auto-picked when 0) stream
through the text tower one at a time with rematerialization, each block a
full (B*chunk) MXU-sized text pass, and the per-block logits concatenate
into the (B, n_cls) table before the softmax.  Memory is O(B*chunk) text
forwards instead of O(B*n_cls); gradients recompute per block under
jax.checkpoint.
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
# fully-batched text pass to the bounded-memory class-chunked scan (one
# class block's B*chunk text forwards live at a time).  Module-level so
# tests can force the chunked branch at tiny scale.
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
        class_chunk = int(getattr(node, "CLASS_CHUNK", 0))

        # Hint for TRAIN.EPOCH_FUSE="auto": past the batched-text limit a
        # CoCoOp step is ~seconds of device time (chunked B*n_cls text
        # fwd+bwd), and fusing a whole epoch of those into ONE device
        # program exceeds what the TPU worker survives (observed at 500
        # classes x bs 32: worker crash).  Auto mode falls back to per-step
        # dispatch; an explicit EPOCH_FUSE="on" still forces fusion.
        train_bs = int(cfg.DATALOADER.TRAIN_X.BATCH_SIZE)
        if train_bs * n_cls > BATCHED_TEXT_LIMIT:
            self._epoch_fuse_auto_off = True
            print(
                "[CoCoOp] batch x classes = "
                f"{train_bs} x {n_cls} > {BATCHED_TEXT_LIMIT}: "
                "EPOCH_FUSE=auto selects per-step dispatch"
            )

        def logits_of(params, frozen, images):
            imf = l2_normalize(
                encode_image(frozen["clip"], clip_cfg_, images, compute_dtype=dtype)
            )
            # meta-net bias per image
            h = jnp.maximum(imf @ params["meta_net"]["w1"] + params["meta_net"]["b1"], 0.0)
            bias = h @ params["meta_net"]["w2"] + params["meta_net"]["b2"]  # (B, D)
            ctx = params["ctx"][None] + bias[:, None, :]  # (B, n_ctx, D)
            scale = jnp.exp(frozen["clip"]["logit_scale"])

            B = images.shape[0]
            chunk = class_chunk
            if chunk <= 0 and B * n_cls > BATCHED_TEXT_LIMIT:
                chunk = max(1, min(n_cls, BATCHED_TEXT_LIMIT // max(B, 1)))
            if chunk <= 0 or chunk >= n_cls:
                # fully batched: one flattened pass through the text tower
                return scale * jnp.einsum(
                    "be,bce->bc", imf, _batched_text_features(params, frozen, ctx)
                )
            # class-chunked scan: bounded memory at large batch x class
            # products (ImageNet-base = 500 classes — the reference's bs-1
            # worst case, cocoop.py:247-251).  Each scan step runs a full
            # (B*chunk) text pass; remat recomputes the block in backward.
            return _class_chunked_logits(params, frozen, imf, ctx, scale, chunk)

        def _class_chunked_logits(params, frozen, imf, ctx, scale, chunk):
            B = imf.shape[0]
            n_pad = (-n_cls) % chunk
            base = frozen["base_embed"]
            scat = frozen["ctx_scatter"]
            eot = frozen["eot_idx"]
            if n_pad:
                base = jnp.concatenate([base, base[:n_pad]], axis=0)
                scat = jnp.concatenate([scat, scat[:n_pad]], axis=0)
                eot = jnp.concatenate([eot, eot[:n_pad]], axis=0)
            n_blocks = base.shape[0] // chunk
            base = base.reshape(n_blocks, chunk, *base.shape[1:])
            scat = scat.reshape(n_blocks, chunk, *scat.shape[1:])
            eot = eot.reshape(n_blocks, chunk)

            def block(carry, blk):
                base_c, scat_c, eot_c = blk
                delta = jnp.einsum(
                    "cpj,bjd->bcpd", scat_c, ctx.astype(jnp.float32)
                )
                prompts = base_c[None] + delta  # (B, chunk, L, D)
                L, D = prompts.shape[-2:]
                txf = encode_text_embeds(
                    frozen["clip"],
                    clip_cfg_,
                    prompts.reshape(B * chunk, L, D),
                    jnp.tile(eot_c, B),
                    compute_dtype=dtype,
                    remat=remat,
                ).reshape(B, chunk, -1)
                txf = l2_normalize(txf, axis=-1)
                return carry, scale * jnp.einsum("be,bce->bc", imf, txf)

            body = jax.checkpoint(block) if remat else block
            _, logits = jax.lax.scan(body, None, (base, scat, eot))
            # (n_blocks, B, chunk) -> (B, n_blocks*chunk) -> trim padding
            logits = jnp.moveaxis(logits, 0, 1).reshape(B, -1)
            return logits[:, :n_cls]

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

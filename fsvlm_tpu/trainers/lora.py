"""CLIP-LoRA: low-rank adaptation of the attention projections.

Parity target: PromptSRC/trainers/lora.py + utils/layers.py —
- q/k/v/o LoRA factors on selected layers of the text and/or vision towers
  (INDEX_POSITIONS_TEXT/VISION, lora.py:25-58; ENCODER/POSITION/PARAMS/R/
  ALPHA config);
- scaling alpha/sqrt(r) (layers.py:90), A kaiming-uniform, B zeros
  (layers.py:115-116);
- fixed text prompts "a photo of a {}." (ctx frozen at its phrase init —
  the reference leaves prompt params out of the optimizer);
- optional SCL losses against a frozen zero-shot teacher with the
  TEXT/IMAGE/LOGITS weights (lora.py:358-387);
- a LoRA-only checkpoint format {weights, metadata{r, alpha, encoder,
  params, position}} with strict metadata validation (lora.py:405-492).

TPU-first: factors are stacked per layer and gated by a 0/1 layer mask, so
the whole adapted tower stays a single lax.scan — no module surgery
(reference re-wraps nn.MultiheadAttention per block, layers.py:416-608).
Gradients flow through the frozen towers to the factors; blocks are
rematerialized (jax.checkpoint) to keep HBM flat.

DROPOUT_RATE applies the reference's lora-dropout on the projection inputs
during training (per-layer PRNG keys threaded through the scan); evaluation
is deterministic.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import encode_image_vit, encode_text_embeds, l2_normalize
from ..utils import mkdir_if_missing
from .backbone import load_clip_backbone
from .ivlp_family import build_vlp_frozen
from .losses import cross_entropy, l1_loss, masked_acc, masked_mean
from .prompts import assemble_prompts

INDEX_POSITIONS_TEXT = {
    "top1": [11],
    "top2": [10, 11],
    "top3": [9, 10, 11],
    "bottom": [0, 1, 2, 3],
    "mid": [4, 5, 6, 7],
    "up": [8, 9, 10, 11],
    "half-up": [6, 7, 8, 9, 10, 11],
    "half-bottom": [0, 1, 2, 3, 4, 5],
    "all": list(range(12)),
}

INDEX_POSITIONS_VISION = {
    "top": [11],
    "top3": [9, 10, 11],
    "bottom": [0, 1, 2, 3],
    "mid": [4, 5, 6, 7],
    "up": [8, 9, 10, 11],
    "half-up": [6, 7, 8, 9, 10, 11],
    "half-bottom": [0, 1, 2, 3, 4, 5],
    "all": None,  # filled per-backbone (all layers)
}


def _layer_mask(position, table, n_layers):
    layers = table.get(position)
    if layers is None:
        layers = list(range(n_layers))
    mask = np.zeros(n_layers, np.float32)
    for l in layers:
        if l < n_layers:
            mask[l] = 1.0
    return jnp.asarray(mask)


def _init_factors(rng, n_layers, dim, r, proj_names):
    """A ~ kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(dim), 1/sqrt(dim)); B = 0."""
    bound = 1.0 / np.sqrt(dim)
    out = {}
    for name in proj_names:
        a = rng.uniform(-bound, bound, size=(n_layers, dim, r)).astype(np.float32)
        b = np.zeros((n_layers, r, dim), np.float32)
        out[name] = (jnp.asarray(a), jnp.asarray(b))
    return out


@TRAINER_REGISTRY.register()
class LoRA(SimpleTrainer):
    model_name = "lora"
    trainer_cfg_key = "LORA"

    def check_cfg(self, cfg):
        node = cfg.TRAINER.LORA
        assert node.PREC in ["fp16", "fp32", "amp", "bf16"]
        assert node.ENCODER in ["text", "vision", "both"]
        assert all(p in ("q", "k", "v", "o") for p in node.PARAMS)

    def compute_dtype(self):
        if self.cfg.TRAINER.LORA.PREC == "fp32":
            return jnp.float32
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER.LORA
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        if not clip_cfg.is_vit:
            raise NotImplementedError("LoRA targets the ViT backbones")
        self.clip_cfg = clip_cfg

        frozen, pc = build_vlp_frozen(cfg, node, clip_params, clip_cfg, classnames, cfg.SEED)
        self.frozen = frozen
        # fixed prompts: ctx frozen at its phrase init (reference keeps
        # prompt params out of the optimizer, lora.py:338-340)
        self.frozen["fixed_prompts"] = assemble_prompts(
            jnp.asarray(pc["init_ctx"]), frozen["base_embed"], frozen["ctx_scatter"]
        )

        rng = np.random.RandomState(max(cfg.SEED, 0))
        r, alpha = int(node.R), float(node.ALPHA)
        self.lora_meta = {
            "r": r,
            "alpha": alpha,
            "encoder": node.ENCODER,
            "params": list(node.PARAMS),
            "position": node.POSITION,
        }
        scale = alpha / np.sqrt(r)

        params = {}
        masks = {}
        if node.ENCODER in ("text", "both"):
            params["text"] = _init_factors(
                rng, clip_cfg.transformer_layers, clip_cfg.transformer_width, r, node.PARAMS
            )
            masks["text"] = _layer_mask(
                node.POSITION, INDEX_POSITIONS_TEXT, clip_cfg.transformer_layers
            )
        if node.ENCODER in ("vision", "both"):
            params["vision"] = _init_factors(
                rng, clip_cfg.vision_layers, clip_cfg.vision_width, r, node.PARAMS
            )
            masks["vision"] = _layer_mask(
                node.POSITION, INDEX_POSITIONS_VISION, clip_cfg.vision_layers
            )
        self.params = params
        self._masks = masks

        # frozen zero-shot teacher text features for the SCL options
        text_w = float(node.TEXT_LOSS_WEIGHT)
        image_w = float(node.IMAGE_LOSS_WEIGHT)
        logits_w = float(node.LOGITS_LOSS_WEIGHT)
        if text_w > 0 or logits_w > 0:
            from ..models.clip import encode_text_ids
            from ..models.clip.tokenizer import tokenize

            ids = tokenize([f"a photo of a {c.replace('_', ' ')}." for c in classnames])
            self.frozen["zs_text"] = l2_normalize(
                encode_text_ids(clip_params, clip_cfg, ids)
            )

        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg

        dropout_rate = float(node.DROPOUT_RATE)
        n_layers = {"text": clip_cfg.transformer_layers, "vision": clip_cfg.vision_layers}

        def lora_arg(params, which, rng=None):
            if which not in params:
                return None
            arg = {"proj": params[which], "scale": scale, "mask": masks[which]}
            if rng is not None and dropout_rate > 0:
                # per-layer dropout keys; train path only (reference applies
                # lora_dropout before each projection, utils/layers.py)
                base = jax.random.fold_in(rng, 0 if which == "text" else 1)
                arg["dropout_keys"] = jax.random.split(base, n_layers[which])
                arg["dropout_rate"] = dropout_rate
            return arg

        def towers(params, frozen, images, rng=None):
            txf = encode_text_embeds(
                frozen["clip"],
                clip_cfg_,
                frozen["fixed_prompts"],
                frozen["eot_idx"],
                compute_dtype=dtype,
                lora=lora_arg(params, "text", rng),
                remat=True,
            )
            imf = encode_image_vit(
                frozen["clip"],
                clip_cfg_,
                images,
                compute_dtype=dtype,
                lora=lora_arg(params, "vision", rng),
                remat=True,
            )
            return l2_normalize(imf), l2_normalize(txf)

        def logits_of(params, frozen, images):
            imf, txf = towers(params, frozen, images)
            return jnp.exp(frozen["clip"]["logit_scale"]) * imf @ txf.T

        def loss_fn(params, frozen, batch, rng_key):
            images, labels = batch["img"], batch["label"]
            valid = batch.get("valid")
            imf, txf = towers(params, frozen, images, rng_key)
            logit_scale = jnp.exp(frozen["clip"]["logit_scale"])
            logits = logit_scale * imf @ txf.T
            loss = cross_entropy(logits, labels, valid=valid)

            need_teacher = image_w > 0 or logits_w > 0
            if need_teacher:
                zs_img = jax.lax.stop_gradient(
                    l2_normalize(
                        encode_image_vit(
                            frozen["clip"], clip_cfg_, images, compute_dtype=dtype
                        )
                    )
                )
            if text_w > 0:
                loss = loss + text_w * l1_loss(txf, frozen["zs_text"])
            if image_w > 0:
                loss = loss + image_w * l1_loss(imf, zs_img, valid=valid)
            if logits_w > 0:
                zs_logits = logit_scale * zs_img @ frozen["zs_text"].T
                s = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
                t = jax.nn.log_softmax(zs_logits.astype(jnp.float32), axis=1)
                # sum-KL / numel over VALID rows (reference semantics on the
                # true batch size; padded rows would dilute the normalizer)
                per_row = (jnp.exp(t) * (t - s)).sum(axis=1)
                loss = loss + logits_w * masked_mean(per_row, valid) / logits.shape[1]

            acc = masked_acc(logits, labels, valid)
            return loss, {"acc": acc}

        self.loss_fn = loss_fn
        self.logits_fn = logits_of
        def text_features(p, f):
            return l2_normalize(
                encode_text_embeds(
                    f["clip"],
                    clip_cfg_,
                    f["fixed_prompts"],
                    f["eot_idx"],
                    compute_dtype=dtype,
                    lora=lora_arg(p, "text"),
                    remat=True,
                )
            )

        self.text_features_fn = text_features
        self.image_logits_fn = lambda p, f, images, txf: (
            jnp.exp(f["clip"]["logit_scale"])
            * l2_normalize(
                encode_image_vit(
                    f["clip"], clip_cfg_, images, compute_dtype=dtype,
                    lora=lora_arg(p, "vision"), remat=True,
                )
            )
            @ txf.T
        )

    # ------------------------------------------------------ LoRA checkpoints
    def _lora_dir(self, directory):
        backbone = self.cfg.MODEL.BACKBONE.NAME.replace("/", "-")
        return os.path.join(directory, self.cfg.DATASET.NAME, backbone, "lora")

    def save_model(self, epoch, directory, val_result=None, model_name=""):
        """LoRA-only checkpoint with metadata (lora.py:467-491).

        Documented divergence: the reference writes EVERY save to the same
        ``best.pt``, so under TEST.FINAL_MODEL=best_val the unconditional
        last-epoch save clobbers the best-val checkpoint and "deploy the
        best model" actually tests the final weights.  Here the best-val
        save owns ``best.pkl`` and periodic/final saves go to ``last.pkl``
        (when best-val tracking is on); ``load_model`` prefers best.pkl.
        """
        save_dir = self._lora_dir(directory)
        mkdir_if_missing(save_dir)
        payload = {
            "weights": jax.tree.map(lambda x: np.asarray(x), self.params),
            "metadata": dict(self.lora_meta),
            "epoch": epoch + 1,
            "val_result": val_result,
        }
        track_best = (
            self.cfg.TEST.FINAL_MODEL == "best_val" and not self.cfg.TEST.NO_TEST
        )
        is_best_save = "best" in (model_name or "")
        fname = "best.pkl" if (is_best_save or not track_best) else "last.pkl"
        path = os.path.join(save_dir, fname)
        with open(path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"LoRA checkpoint saved to {path}")

    def resume_model_if_exist(self, directory):
        return 0

    def load_model(self, directory, epoch=None):
        if not directory:
            print("Note that load_model() is skipped as no pretrained model is given")
            return
        path = os.path.join(self._lora_dir(directory), "best.pkl")
        if not os.path.exists(path):
            alt = os.path.join(self._lora_dir(directory), "last.pkl")
            if os.path.exists(alt):
                path = alt
            else:
                raise FileNotFoundError(f"LoRA checkpoint not found at {path}")
        with open(path, "rb") as f:
            payload = pickle.load(f)
        meta = payload["metadata"]
        for key, expected in self.lora_meta.items():
            if meta.get(key) != expected:
                raise ValueError(
                    f"LoRA metadata mismatch for '{key}': checkpoint has "
                    f"{meta.get(key)!r}, config expects {expected!r}"
                )
        from ..parallel.mesh import replicate

        self.params = replicate(
            jax.tree.map(jnp.asarray, payload["weights"]), self.mesh
        )
        print(f"Loaded LoRA weights from {path} (epoch {payload['epoch']})")

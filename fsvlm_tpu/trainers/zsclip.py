"""Zero-shot CLIP baselines.

Parity target: PromptSRC/trainers/zsclip.py —
- ZeroshotCLIP (:32-59): single hand-written template per dataset.
- ZeroshotCLIP2 (:62-99): prompt ensembling over IMAGENET_TEMPLATES_SELECT
  (+ the dataset's custom template except for ImageNet); the mean of the
  normalized per-template features is re-normalized.

No trainable parameters; train() degenerates to evaluation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import encode_image, encode_text_ids, l2_normalize
from ..models.clip.tokenizer import tokenize
from .backbone import load_clip_backbone
from .losses import cross_entropy, masked_acc
from .templates import CUSTOM_TEMPLATES, IMAGENET_TEMPLATES_SELECT


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(SimpleTrainer):
    model_name = "zsclip"

    def compute_dtype(self):
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def templates_for(self, cfg):
        return [CUSTOM_TEMPLATES.get(cfg.DATASET.NAME, "a photo of a {}.")]

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg
        dtype = self.compute_dtype()

        templates = self.templates_for(cfg)
        print(f"Prompt ensembling (n={len(templates)})" if len(templates) > 1 else
              f"Prompts: {[templates[0].format(c) for c in classnames[:3]]} ...")
        mean_feats = 0.0
        for temp in templates:
            ids = tokenize([temp.format(c.replace("_", " ")) for c in classnames])
            feats = encode_text_ids(clip_params, clip_cfg, ids, compute_dtype=dtype)
            mean_feats = mean_feats + l2_normalize(feats)
        text_features = l2_normalize(mean_feats / len(templates))

        # MODEL.QUANT_INT8 serving is applied uniformly by the engine's
        # eval path (SimpleTrainer._get_frozen_eval), not here — text
        # features above are always computed in full precision.
        self.params = {}
        self.frozen = {"clip": clip_params, "text_features": text_features}
        clip_cfg_ = clip_cfg

        def logits_of(params, frozen, images):
            imf = l2_normalize(
                encode_image(frozen["clip"], clip_cfg_, images, compute_dtype=dtype)
            )
            return jnp.exp(frozen["clip"]["logit_scale"]) * imf @ frozen["text_features"].T

        def loss_fn(params, frozen, batch, rng_key):
            logits = logits_of(params, frozen, batch["img"])
            loss = cross_entropy(logits, batch["label"], valid=batch.get("valid"))
            acc = masked_acc(logits, batch["label"], batch.get("valid"))
            return loss, {"acc": acc}

        self.loss_fn = loss_fn
        self.logits_fn = logits_of

    # nothing to persist / restore
    def save_model(self, *a, **k):
        pass

    def resume_model_if_exist(self, directory):
        return 0

    def load_model(self, directory, epoch=None):
        print("Note that load_model() is skipped for zero-shot CLIP")


@TRAINER_REGISTRY.register()
class ZeroshotCLIP2(ZeroshotCLIP):
    """Prompt ensembling variant."""

    def templates_for(self, cfg):
        templates = list(IMAGENET_TEMPLATES_SELECT)
        if cfg.DATASET.NAME != "ImageNet":
            templates.append(CUSTOM_TEMPLATES.get(cfg.DATASET.NAME, "a photo of a {}."))
        return templates

"""Linear probe on frozen CLIP image features.

Parity target: PromptSRC/trainers/linear_probe.py:75-204 — frozen image
encoder + trainable Linear(embed_dim, num_classes) head, CE or focal with
auto inverse-frequency alpha from PER_CLASS_SHOTS, inference returning
softmax probabilities.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import encode_image
from .backbone import load_clip_backbone
from .cocoop import _init_linear
from .losses import cross_entropy, focal_alpha_from_shots, focal_loss, masked_acc


@TRAINER_REGISTRY.register()
class LinearProbeCLIP(SimpleTrainer):
    model_name = "linear_head"

    def compute_dtype(self):
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER.LINEAR_PROBE
        num_classes = self.dm.num_classes
        print(f"[LinearProbeCLIP] Detected num_classes: {num_classes}")
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg

        rng = np.random.RandomState(max(cfg.SEED, 0))
        w, b = _init_linear(rng, clip_cfg.embed_dim, num_classes)
        use_bias = bool(node.USE_BIAS)
        self.params = {"w": w, "b": b} if use_bias else {"w": w}

        loss_type = node.LOSS_TYPE.lower()
        alpha = None
        if loss_type == "focal" and len(cfg.DATASET.PER_CLASS_SHOTS) > 0:
            alpha = focal_alpha_from_shots(cfg.DATASET.PER_CLASS_SHOTS)
        self.frozen = {"clip": clip_params, "alpha": alpha}

        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg

        def head_logits(params, frozen, images):
            feat = jax.lax.stop_gradient(
                encode_image(frozen["clip"], clip_cfg_, images, compute_dtype=dtype)
            )
            logits = feat @ params["w"]
            if use_bias:
                logits = logits + params["b"]
            return logits

        def logits_of(params, frozen, images):
            # inference returns softmax probs (linear_probe.py:178-183);
            # argmax-compatible with the evaluator either way
            return jax.nn.softmax(head_logits(params, frozen, images), axis=-1)

        def loss_fn(params, frozen, batch, rng_key):
            logits = head_logits(params, frozen, batch["img"])
            if loss_type == "focal":
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

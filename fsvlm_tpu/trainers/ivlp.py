"""IVLP: independent vision-language deep prompting.

Parity target: PromptSRC/trainers/independentVL.py — deep V+L prompts
(depths/lengths from cfg), CE/focal (inverse-frequency alpha), image-feature
SimCLR auxiliary (ImageNTXentLoss, :72-128), mixup (:12-29), and KD
(:32-69, :346-377).

Divergences (documented):
- mixup is applied in-step via the training rng when USE_MIXUP (the
  reference defines the mixup path but no code ever produces mixup batches —
  dead wiring, SURVEY.md §2.1/§7.3).
- the KD teacher: the reference loads a timm classifier whose head is
  freshly re-initialized (untrained logits, independentVL.py:366-371 —
  a known quirk).  timm isn't available offline; the teacher here is
  zero-shot CLIP logits from the frozen towers ("a photo of a {}."), a
  well-defined teacher with the same loss plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY, SimpleTrainer
from ..models.clip import clip_logits, encode_text_ids, l2_normalize
from ..models.clip.tokenizer import tokenize
from .backbone import load_clip_backbone
from .ivlp_family import (
    build_vlp_frozen,
    init_vlp_params,
    vlp_image_features,
    vlp_text_features,
)
from .losses import (
    cross_entropy,
    focal_alpha_from_shots,
    focal_loss,
    kd_loss,
    masked_acc,
    mixup_batch,
    mixup_criterion,
    nt_xent,
)
from .templates import CUSTOM_TEMPLATES


@TRAINER_REGISTRY.register()
class IVLP(SimpleTrainer):
    model_name = "VLPromptLearner"
    trainer_cfg_key = "IVLP"

    def check_cfg(self, cfg):
        node = cfg.TRAINER[self.trainer_cfg_key]
        assert node.PREC in ["fp16", "fp32", "amp", "bf16"]

    def compute_dtype(self):
        node = self.cfg.TRAINER[self.trainer_cfg_key]
        if node.PREC == "fp32":
            return jnp.float32
        return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER[self.trainer_cfg_key]
        classnames = self.dm.dataset.classnames
        clip_params, clip_cfg = load_clip_backbone(cfg)
        self.clip_cfg = clip_cfg

        rng = np.random.RandomState(max(cfg.SEED, 0))
        frozen, pc = build_vlp_frozen(cfg, node, clip_params, clip_cfg, classnames, cfg.SEED)
        self.params = init_vlp_params(node, clip_cfg, pc, rng)
        self.frozen = frozen

        # .get defaults allow subclasses (PromptSRC/PLIP/LoRA) whose config
        # nodes carry only a subset of the IVLP keys
        self.use_focal = bool(node.get("USE_FOCAL_LOSS", False))
        alpha = None
        if self.use_focal and len(cfg.DATASET.PER_CLASS_SHOTS) > 0:
            alpha = focal_alpha_from_shots(cfg.DATASET.PER_CLASS_SHOTS)
        self.frozen["alpha"] = alpha

        self.simclr_alpha = float(node.get("SIMCLR_ALPHA", 0.0))
        self.use_mixup = bool(node.get("USE_MIXUP", False))
        self.mixup_alpha = float(node.get("MIXUP_ALPHA", 1.0))
        self.use_kd = bool(node.get("USE_KD", False))
        self.kd_alpha = float(node.get("KD_ALPHA", 1.0))
        self.kd_T = float(node.get("KD_T", 4.0))

        if self.use_kd:
            # zero-shot CLIP teacher text features (see module docstring)
            template = CUSTOM_TEMPLATES.get(cfg.DATASET.NAME, "a photo of a {}.")
            ids = tokenize([template.format(c.replace("_", " ")) for c in classnames])
            teacher_txt = encode_text_ids(clip_params, clip_cfg, ids)
            self.frozen["teacher_text"] = l2_normalize(teacher_txt)

        int8_teacher = self.use_kd and bool(node.get("INT8_TEACHER", False))
        if int8_teacher:
            # int8 copy of the frozen visual tower for the stop-gradient KD
            # teacher pass (TPU extension; float leaves shared, ops/quant.py)
            from ..ops.quant import calibrate_visual_amax, quantize_clip_params

            static_amax = None
            if bool(getattr(cfg.MODEL, "QUANT_INT8_STATIC", False)):
                n_cal = int(getattr(cfg.MODEL, "QUANT_INT8_CALIB_BATCHES", 4))

                def _cal_batches():
                    for i, b in enumerate(self.train_loader_x):
                        if i >= n_cal:
                            break
                        yield self.parse_batch_train(b)["img"]

                static_amax = {"visual": calibrate_visual_amax(
                    clip_params, clip_cfg, _cal_batches())}
            print("[IVLP] int8 KD teacher image tower (INT8_TEACHER, "
                  f"act={'static' if static_amax else 'dynamic'})")
            self.frozen["clip_teacher"] = quantize_clip_params(
                clip_params, towers=("visual",), static_amax=static_amax)

        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg
        remat = bool(cfg.TRAIN.REMAT)
        use_focal = self.use_focal
        simclr_alpha = self.simclr_alpha
        use_mixup, mixup_alpha = self.use_mixup, self.mixup_alpha
        use_kd, kd_alpha, kd_T = self.use_kd, self.kd_alpha, self.kd_T

        def hard_loss(logits, labels, frozen, valid=None):
            if use_focal:
                return focal_loss(logits, labels, alpha=frozen["alpha"], valid=valid)
            return cross_entropy(logits, labels, valid=valid)

        def logits_of(params, frozen, images):
            imf = vlp_image_features(params, frozen, clip_cfg_, images, dtype)
            txf = vlp_text_features(params, frozen, clip_cfg_, dtype)
            return clip_logits(imf, txf, frozen["clip"]["logit_scale"])

        def loss_fn(params, frozen, batch, rng_key):
            images, labels = batch["img"], batch["label"]
            valid = batch.get("valid")
            aux = {}

            if use_mixup:
                images, perm, lam = mixup_batch(rng_key, images, mixup_alpha)
                labels_b = labels[perm]

            imf = vlp_image_features(params, frozen, clip_cfg_, images, dtype, remat=remat)
            txf = vlp_text_features(params, frozen, clip_cfg_, dtype, remat=remat)
            imf_n = l2_normalize(imf)
            logits = jnp.exp(frozen["clip"]["logit_scale"]) * imf_n @ l2_normalize(txf).T

            if use_mixup:
                loss = mixup_criterion(
                    lambda lg, y: hard_loss(lg, y, frozen, valid),
                    logits, labels, labels_b, lam,
                )
            else:
                loss = hard_loss(logits, labels, frozen, valid)

            if use_kd:
                if int8_teacher:
                    from ..models.clip import encode_image

                    zs_img = encode_image(
                        frozen["clip_teacher"], clip_cfg_, images,
                        compute_dtype=dtype)
                else:
                    zs_img = vlp_image_features({}, frozen, clip_cfg_, images, dtype)
                teacher_logits = (
                    jnp.exp(frozen["clip"]["logit_scale"])
                    * l2_normalize(zs_img)
                    @ frozen["teacher_text"].T
                )
                teacher_logits = jax.lax.stop_gradient(teacher_logits)
                loss = kd_alpha * loss + (1.0 - kd_alpha) * kd_loss(
                    logits, teacher_logits, T=kd_T, valid=valid
                )

            if simclr_alpha > 0.0 and "img2" in batch:
                imf2 = l2_normalize(
                    vlp_image_features(params, frozen, clip_cfg_, batch["img2"], dtype)
                )
                loss = loss + simclr_alpha * nt_xent(imf_n, imf2, valid=valid)

            aux["acc"] = masked_acc(logits, labels, valid)
            return loss, aux

        self.loss_fn = loss_fn
        self.logits_fn = logits_of
        # split eval: class text features computed once per test() call
        self.text_features_fn = lambda p, f: l2_normalize(
            vlp_text_features(p, f, clip_cfg_, dtype)
        )
        self.image_logits_fn = lambda p, f, images, txf: (
            jnp.exp(f["clip"]["logit_scale"])
            * l2_normalize(vlp_image_features(p, f, clip_cfg_, images, dtype))
            @ txf.T
        )

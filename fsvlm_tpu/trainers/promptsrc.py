"""PromptSRC: prompt learning with self-regulating constraints.

Parity target: PromptSRC/trainers/promptsrc.py —
- IVLP prompts (text ctx + deep, vision shallow + deep);
- frozen-CLIP teacher: precomputed "a photo of a {}." text embeddings
  (promptsrc.py:115-132) + a zero-shot image-tower pass per step;
- losses (forward_backward :285-331):
    CE + TEXT_W * L1(norm_text, norm_zs_text)
       + IMAGE_W * L1(norm_img, norm_zs_img)
       + LOGITS_W * KLdiv(log_softmax(logits), log_softmax(zs_logits)) / numel
- Gaussian Prompt Aggregation (:267-273, :335-353): per-epoch Gaussian
  weights over epochs 1..N (mean GPA_MEAN, std GPA_STD, normalized); the
  running weighted average replaces the live weights after the final epoch.
  In this functional engine GPA is a second pytree accumulated in
  after_epoch — no deepcopy of a live module (SURVEY.md §7.3).

The undefined-in-reference keys USE_GPA / LOGITS_LOSS_WEIGHT default to
True / 1.0 (SURVEY.md §5.6).
Fork extensions: LOSS_TYPE focal (per-class alpha), SIMCLR_ALPHA auxiliary.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.trainer import TRAINER_REGISTRY
from ..models.clip import encode_text_ids, l2_normalize
from ..models.clip.tokenizer import tokenize
from .ivlp import IVLP
from .ivlp_family import vlp_image_features, vlp_text_features
from .losses import (
    cross_entropy,
    focal_alpha_from_shots,
    focal_loss,
    l1_loss,
    masked_acc,
    masked_mean,
    nt_xent,
)


@TRAINER_REGISTRY.register()
class PromptSRC(IVLP):
    model_name = "VLPromptLearner"
    trainer_cfg_key = "PROMPTSRC"

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER.PROMPTSRC
        # reuse the IVLP prompt construction (same VLPromptLearner shape)
        super().build_model()

        classnames = self.dm.dataset.classnames
        clip_params = self.frozen["clip"]
        clip_cfg = self.clip_cfg

        # frozen teacher text features: single template "a photo of a {}."
        ids = tokenize([f"a photo of a {c.replace('_', ' ')}." for c in classnames])
        teacher_txt = encode_text_ids(clip_params, clip_cfg, ids)
        self.frozen["zs_text"] = l2_normalize(teacher_txt)

        cached_teacher = bool(node.get("CACHED_TEACHER", False))
        if cached_teacher:
            self.frozen["zs_img_cache"] = self._build_teacher_cache(clip_params, clip_cfg)

        int8_teacher = bool(node.get("INT8_TEACHER", False)) and not cached_teacher
        if int8_teacher:
            # int8 copy of the frozen visual tower for the stop-gradient
            # teacher pass only (float leaves are shared; ops/quant.py)
            from ..ops.quant import calibrate_visual_amax, quantize_clip_params

            static_amax = None
            if bool(getattr(cfg.MODEL, "QUANT_INT8_STATIC", False)):
                # static activation scales calibrated over a few train
                # batches: removes the per-row dynamic act-quant reductions
                # from every teacher step (the cost that capped the dynamic
                # int8 teacher at +5%, PERF.md)
                n_cal = int(getattr(cfg.MODEL, "QUANT_INT8_CALIB_BATCHES", 4))

                def _cal_batches():
                    for i, b in enumerate(self.train_loader_x):
                        if i >= n_cal:
                            break
                        yield self.parse_batch_train(b)["img"]

                static_amax = {"visual": calibrate_visual_amax(
                    clip_params, clip_cfg, _cal_batches())}
            print("[PromptSRC] int8 teacher image tower (INT8_TEACHER, "
                  f"act={'static' if static_amax else 'dynamic'})")
            self.frozen["clip_teacher"] = quantize_clip_params(
                clip_params, towers=("visual",), static_amax=static_amax)

        self.loss_type = node.LOSS_TYPE
        alpha = None
        if self.loss_type == "focal" and len(cfg.DATASET.PER_CLASS_SHOTS) > 0:
            alpha = focal_alpha_from_shots(cfg.DATASET.PER_CLASS_SHOTS)
        self.frozen["alpha"] = alpha

        text_w = float(node.TEXT_LOSS_WEIGHT)
        image_w = float(node.IMAGE_LOSS_WEIGHT)
        logits_w = float(node.LOGITS_LOSS_WEIGHT)
        simclr_alpha = float(node.SIMCLR_ALPHA)
        loss_type = self.loss_type
        dtype = self.compute_dtype()
        clip_cfg_ = clip_cfg
        remat = bool(cfg.TRAIN.REMAT)

        def loss_fn(params, frozen, batch, rng_key):
            images, labels = batch["img"], batch["label"]
            valid = batch.get("valid")
            logit_scale = jnp.exp(frozen["clip"]["logit_scale"])

            txf = l2_normalize(vlp_text_features(params, frozen, clip_cfg_, dtype, remat=remat))
            imf = l2_normalize(
                vlp_image_features(params, frozen, clip_cfg_, images, dtype, remat=remat)
            )
            logits = logit_scale * imf @ txf.T

            if cached_teacher:
                # "fast SCL": precomputed clean-image teacher features
                zs_img = frozen["zs_img_cache"][batch["index"]]
            elif int8_teacher:
                # reference semantics (augmented batch) at int8 teacher
                # precision; the tower is quantized once at build
                from ..models.clip import encode_image

                zs_img = jax.lax.stop_gradient(
                    l2_normalize(encode_image(
                        frozen["clip_teacher"], clip_cfg_, images,
                        compute_dtype=dtype))
                )
            else:
                # frozen-CLIP teacher pass on the augmented batch (reference
                # semantics, promptsrc.py:198-201)
                zs_img = jax.lax.stop_gradient(
                    l2_normalize(vlp_image_features({}, frozen, clip_cfg_, images, dtype))
                )
            zs_logits = logit_scale * zs_img @ frozen["zs_text"].T

            if loss_type == "focal":
                loss_ce = focal_loss(logits, labels, alpha=frozen["alpha"], valid=valid)
            else:
                loss_ce = cross_entropy(logits, labels, valid=valid)

            loss_scl_text = l1_loss(txf, frozen["zs_text"]) * text_w
            loss_scl_image = l1_loss(imf, zs_img, valid=valid) * image_w
            # KL(student ‖ teacher) summed over all elements / numel over
            # VALID rows (promptsrc.py:316-324: F.kl_div(reduction='sum') /
            # numel, where numel is the true batch's element count)
            s = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
            t = jax.nn.log_softmax(zs_logits.astype(jnp.float32), axis=1)
            per_row = (jnp.exp(t) * (t - s)).sum(axis=1)
            loss_scl_logits = (
                masked_mean(per_row, valid) / logits.shape[1]
            ) * logits_w

            loss = loss_ce + loss_scl_text + loss_scl_image + loss_scl_logits
            aux = {
                "loss_ce": loss_ce,
                "loss_scl_text": loss_scl_text,
                "loss_scl_image": loss_scl_image,
                "loss_scl_logits": loss_scl_logits,
                "acc": masked_acc(logits, labels, valid),
            }
            if simclr_alpha > 0.0 and "img2" in batch:
                imf2 = l2_normalize(
                    vlp_image_features(params, frozen, clip_cfg_, batch["img2"], dtype)
                )
                loss = loss + simclr_alpha * nt_xent(imf, imf2, valid=valid)
            return loss, aux

        self.loss_fn = loss_fn
        # logits_fn inherited from IVLP.build_model (same eval path)

        # -------- GPA setup (promptsrc.py:267-273)
        self.use_gpa = bool(node.USE_GPA)
        N = cfg.OPTIM.MAX_EPOCH
        mu, sigma = node.GPA_MEAN, node.GPA_STD
        gauss = np.exp(-0.5 * ((np.arange(1, N + 1) - mu) / sigma) ** 2) / (
            sigma * np.sqrt(2 * np.pi)
        )
        self.gauss = gauss / gauss.sum()
        self.gpa_params = None

    def _build_teacher_cache(self, clip_params, clip_cfg):
        """Frozen-teacher image features over the deterministic eval-transform
        view of every train item, indexed by dataset position."""
        import jax as _jax

        from ..data.loader import BatchLoader, DatasetWrapper
        from ..data.samplers import SequentialSampler
        from ..data.transforms import TestTransform

        data = self.dm.dataset.train_x
        wrapper = DatasetWrapper(data, TestTransform(self.cfg), cache_decoded=False)
        loader = BatchLoader(
            wrapper,
            SequentialSampler(data),
            batch_size=min(64, max(1, len(data))),
            num_threads=max(1, self.cfg.DATALOADER.NUM_WORKERS),
        )
        dtype = self.compute_dtype()
        # params go in as a jit ARGUMENT — capturing them in the closure bakes
        # the full tower into the HLO as constants (observed: the axon remote
        # compiler rejects the oversized program with HTTP 413).
        feats_fn = _jax.jit(
            lambda frozen, imgs: l2_normalize(
                vlp_image_features({}, frozen, clip_cfg, imgs, dtype)
            )
        )
        import numpy as np

        frozen = {"clip": clip_params}
        cache = np.zeros((len(data), clip_cfg.embed_dim), np.float32)
        for batch in loader:
            f = np.asarray(feats_fn(frozen, batch["img"]))
            idx = batch["index"][batch["valid"]]
            cache[idx] = f[batch["valid"]]
        print(f"[PromptSRC] cached teacher image features: {cache.shape}")
        return jnp.asarray(cache)

    def extra_state(self):
        st = super().extra_state()
        if self.gpa_params is not None:
            st["gpa_params"] = jax.tree.map(np.asarray, self.gpa_params)
        return st

    def load_extra_state(self, state):
        super().load_extra_state(state)
        if state.get("gpa_params") is not None:
            self.gpa_params = jax.tree.map(jnp.asarray, state["gpa_params"])
        elif self.use_gpa:
            # resuming without an accumulator would silently drop all
            # pre-resume epochs from the Gaussian aggregate (ADVICE r1)
            print(
                "WARNING: resuming PromptSRC from a checkpoint without "
                "gpa_params — the GPA aggregate will exclude pre-resume epochs"
            )

    def after_epoch(self):
        if self.use_gpa:
            w = float(self.gauss[self.epoch])
            weighted = jax.tree.map(lambda x: x * w, self.params)
            if self.gpa_params is None:
                self.gpa_params = weighted
            else:
                self.gpa_params = jax.tree.map(
                    lambda a, b: a + b, weighted, self.gpa_params
                )
            if (self.epoch + 1) == self.max_epoch:
                print("Using GPA model for final inference...")
                self.params = jax.tree.map(lambda x: x, self.gpa_params)
        super().after_epoch()

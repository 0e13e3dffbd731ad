"""SSL trainer family: SupBaseline, EntMin, MeanTeacher, MixMatch, FixMatch.

TPU-native rebuilds of Dassl.pytorch/dassl/engine/ssl/*.py — each method
is ONE pure jitted step over (params, opt_state, bn_state, extra); EMA
teachers live in ``extra`` as a second parameter pytree, schedule ramps
take the traced global step.
"""

import random

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ...data.loader import BatchLoader, DatasetWrapper
from ...data.samplers import build_sampler
from ...data.transforms import TrainTransform
from ...engine.trainer import TRAINER_REGISTRY
from .base import NetTrainerXU, accuracy, cross_entropy_logits, masked_mean
from .ops import (
    create_onehot,
    ema_update,
    linear_rampup,
    fwd_keys,
    mixup_pair,
    sharpen_prob,
    sigmoid_rampup,
)


def _sgd_like_update(tx, grads, opt_state, params):
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


@TRAINER_REGISTRY.register()
class SupBaseline(NetTrainerXU):
    """Supervised baseline: CE on the labeled batch only
    (ssl/sup_baseline.py)."""

    def build_method(self):
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            (k0,) = fwd_keys(rng, 1)

            def loss_fn(p):
                logits, ns = net_apply(p, state, bx["img"], train=True, rng=k0)
                loss = cross_entropy_logits(logits, bx["label"], bx.get("valid"))
                return loss, (logits, ns)

            (loss, (logits, ns)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            params, opt_state = _sgd_like_update(self.tx, grads, opt_state, params)
            metrics = {
                "loss": loss,
                "acc": accuracy(logits, bx["label"], bx.get("valid")),
            }
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class EntMin(NetTrainerXU):
    """Entropy minimization (ssl/entmin.py): CE(x) + lmda * H(p_u)."""

    def build_method(self):
        lmda = float(self.cfg.TRAINER.ENTMIN.LMDA)
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            k0, k1 = fwd_keys(rng, 2)

            def loss_fn(p):
                logits_x, ns = net_apply(p, state, bx["img"], train=True, rng=k0)
                loss_x = cross_entropy_logits(logits_x, bx["label"], bx.get("valid"))
                logits_u, ns = net_apply(p, ns, bu["img"], train=True, rng=k1)
                prob_u = jax.nn.softmax(logits_u.astype(jnp.float32), axis=1)
                ent = -(prob_u * jnp.log(prob_u + 1e-5)).sum(1)
                loss_u = masked_mean(ent, bu.get("valid"))
                return loss_x + lmda * loss_u, (logits_x, loss_x, loss_u, ns)

            (loss, (logits_x, loss_x, loss_u, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            params, opt_state = _sgd_like_update(self.tx, grads, opt_state, params)
            metrics = {
                "loss": loss,
                "loss_x": loss_x,
                "acc_x": accuracy(logits_x, bx["label"], bx.get("valid")),
                "loss_u": loss_u,
            }
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class MeanTeacher(NetTrainerXU):
    """Mean Teacher (ssl/mean_teacher.py): consistency MSE against an EMA
    teacher (its own parameter AND BN-state pytrees, updated in-step)."""

    def build_method(self):
        node = self.cfg.TRAINER.MEANTEACHER
        weight_u = float(node.WEIGHT_U)
        ema_alpha = float(node.EMA_ALPHA)
        rampup = int(node.RAMPUP)
        spe = max(self._num_batches(), 1)  # steps_per_epoch (pre-optimizer)
        net = self.net
        net_apply = self.net_apply

        self.extra = {
            "teacher": jax.tree.map(
                lambda x: jnp.array(x, copy=True), self.params["net"]),
            "teacher_state": jax.tree.map(
                lambda x: jnp.array(x, copy=True), self.model_state["net"]),
        }

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            k0, k1, k2 = fwd_keys(rng, 3)
            # teacher forward in train mode (reference keeps teacher.train())
            t_logits, t_ns = net.apply(
                extra["teacher"], extra["teacher_state"], bu["img"], train=True,
                rng=k0,
            )
            target_u = jax.nn.softmax(t_logits.astype(jnp.float32), axis=1)
            target_u = jax.lax.stop_gradient(target_u)

            def loss_fn(p):
                logits_x, ns = net_apply(p, state, bx["img"], train=True, rng=k1)
                loss_x = cross_entropy_logits(logits_x, bx["label"], bx.get("valid"))
                logits_u, ns = net_apply(p, ns, bu["img"], train=True, rng=k2)
                prob_u = jax.nn.softmax(logits_u.astype(jnp.float32), axis=1)
                mse = ((prob_u - target_u) ** 2).sum(1)
                loss_u = masked_mean(mse, bu.get("valid"))
                epoch = (step // spe).astype(jnp.float32)
                w_u = weight_u * sigmoid_rampup(epoch, rampup)
                return loss_x + loss_u * w_u, (logits_x, loss_x, loss_u, ns)

            (loss, (logits_x, loss_x, loss_u, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            params, opt_state = _sgd_like_update(self.tx, grads, opt_state, params)

            alpha = jnp.minimum(
                1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), ema_alpha
            )
            extra = {
                "teacher": ema_update(params["net"], extra["teacher"], alpha),
                "teacher_state": t_ns,
            }
            metrics = {
                "loss": loss,
                "loss_x": loss_x,
                "acc_x": accuracy(logits_x, bx["label"], bx.get("valid")),
                "loss_u": loss_u,
            }
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class MixMatch(NetTrainerXU):
    """MixMatch (ssl/mixmatch.py): sharpened K-view pseudo-labels, global
    shuffle, mixup of labeled/unlabeled against the mixed pool."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.K_TRANSFORMS > 1

    def build_method(self):
        node = self.cfg.TRAINER.MIXMATCH
        weight_u = float(node.WEIGHT_U)
        temp = float(node.TEMP)
        beta = float(node.MIXUP_BETA)
        rampup = int(node.RAMPUP)
        n_cls = self.num_classes
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            # img arrives (B, K, H, W, C): labeled uses view 0, pseudo-labels
            # average over all K unlabeled views (mixmatch.py:38-46)
            input_x = bx["img"][:, 0]
            label_x = create_onehot(bx["label"], n_cls)
            K = bu["img"].shape[1]
            views_u = [bu["img"][:, k] for k in range(K)]

            keys = fwd_keys(rng, K + 2)
            prob_sum = 0.0
            ns0 = state
            for kv, v in enumerate(views_u):
                logits_v, ns0 = net_apply(params, ns0, v, train=True,
                                          rng=keys[kv])
                prob_sum = prob_sum + jax.nn.softmax(
                    logits_v.astype(jnp.float32), axis=1
                )
            label_u = jax.lax.stop_gradient(sharpen_prob(prob_sum / K, temp))
            input_u = jnp.concatenate(views_u, axis=0)
            label_u_all = jnp.tile(label_u, (K, 1))

            num_x = input_x.shape[0]
            input_xu = jnp.concatenate([input_x, input_u], axis=0)
            label_xu = jnp.concatenate([label_x, label_u_all], axis=0)
            k_perm, k_mix1, k_mix2 = jax.random.split(rng, 3)
            perm = jax.random.permutation(k_perm, input_xu.shape[0])
            input_xu, label_xu = input_xu[perm], label_xu[perm]

            mixed_x, mixed_lx = mixup_pair(
                k_mix1, input_x, input_xu[:num_x], label_x, label_xu[:num_x], beta
            )
            mixed_u, mixed_lu = mixup_pair(
                k_mix2, input_u, input_xu[num_x:], label_u_all, label_xu[num_x:], beta
            )

            def loss_fn(p):
                # ns0: the pseudo-label passes ran in train mode, so their
                # BN-stat updates flow into the training passes (the
                # reference's no_grad train-mode forwards do the same)
                logits_x, ns = net_apply(p, ns0, mixed_x, train=True,
                                         rng=keys[K])
                prob_x = jax.nn.softmax(logits_x.astype(jnp.float32), axis=1)
                loss_x = (-(mixed_lx * jnp.log(prob_x + 1e-5)).sum(1)).mean()
                logits_u, ns = net_apply(p, ns, mixed_u, train=True,
                                         rng=keys[K + 1])
                prob_u = jax.nn.softmax(logits_u.astype(jnp.float32), axis=1)
                loss_u = ((mixed_lu - prob_u) ** 2).mean()
                w_u = weight_u * linear_rampup(step, rampup)
                return loss_x + loss_u * w_u, (loss_x, loss_u, ns)

            (loss, (loss_x, loss_u, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            params, opt_state = _sgd_like_update(self.tx, grads, opt_state, params)
            metrics = {"loss": loss, "loss_x": loss_x, "loss_u": loss_u}
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


class _WeakStrongWrapper(DatasetWrapper):
    """img = weak view(s), img2 = strong view(s) (reference custom_tfm_train
    list, fixmatch.py:28-35; with k=2 this is CDAC's dual-K layout where
    both pipelines produce K stacked views, data_manager.py:265-275)."""

    def __init__(self, data_source, tfm_weak, tfm_strong, seed=None, k=1):
        super().__init__(data_source, tfm_weak, seed=seed)
        self.tfm_strong = tfm_strong
        self.k = k

    def __getitem__(self, idx):
        import numpy as np

        item = self.data_source[idx]
        img = self._get_image(idx)
        rng = self._item_rng(idx)
        kw = {"rng": rng} if rng is not None else {}
        if self.k > 1:
            weak = np.stack([self.transform(img, **kw) for _ in range(self.k)])
            strong = np.stack([self.tfm_strong(img, **kw) for _ in range(self.k)])
        else:
            weak = self.transform(img, **kw)
            strong = self.tfm_strong(img, **kw)
        return {
            "img": weak,
            "img2": strong,
            "label": item.label,
            "domain": item.domain,
            "index": idx,
            "impath": item.impath,
        }


@TRAINER_REGISTRY.register()
class FixMatch(NetTrainerXU):
    """FixMatch (ssl/fixmatch.py): confident weak-view pseudo-labels
    supervise the strong view; x and u are concatenated for pseudo-labeling
    exactly like the reference."""

    def check_cfg(self, cfg):
        assert len(cfg.TRAINER.FIXMATCH.STRONG_TRANSFORMS) > 0

    def build_data_loader(self):
        super().build_data_loader()
        cfg = self.cfg
        strong_cfg = cfg.clone()
        strong_cfg.defrost()
        strong_cfg.INPUT.TRANSFORMS = list(cfg.TRAINER.FIXMATCH.STRONG_TRANSFORMS)
        seed = cfg.SEED if cfg.SEED >= 0 else None
        tfm_weak = TrainTransform(cfg, rng=random.Random(seed or 0))
        tfm_strong = TrainTransform(strong_cfg, rng=random.Random((seed or 0) + 1))

        def two_view(data_source, bs):
            wrapper = _WeakStrongWrapper(data_source, tfm_weak, tfm_strong, seed=seed)
            sampler = build_sampler(
                cfg.DATALOADER.TRAIN_X.SAMPLER, data_source, batch_size=bs,
                seed=seed,
            )
            return BatchLoader(
                wrapper, sampler, batch_size=bs,
                drop_last=len(data_source) >= bs,
                num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
                extra_keys=("img2",),
            )

        self.train_loader_x = two_view(
            self.dm.dataset.train_x, cfg.DATALOADER.TRAIN_X.BATCH_SIZE
        )
        if self.dm.dataset.train_u:
            self.train_loader_u = two_view(
                self.dm.dataset.train_u, cfg.DATALOADER.TRAIN_U.BATCH_SIZE
            )

    def build_method(self):
        node = self.cfg.TRAINER.FIXMATCH
        weight_u = float(node.WEIGHT_U)
        conf_thre = float(node.CONF_THRE)
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            input_u = jnp.concatenate([bx["img"], bu["img"]], axis=0)
            input_u2 = jnp.concatenate([bx["img2"], bu["img2"]], axis=0)
            n_x = bx["img"].shape[0]
            vx, vu = bx.get("valid"), bu.get("valid")
            # row mask over the concatenated [x; u] batch (mesh-pad rows)
            valid_xu = None
            if vx is not None or vu is not None:
                def _v(b, ref):
                    return (ref.astype(jnp.float32) if ref is not None
                            else jnp.ones((b,), jnp.float32))

                valid_xu = jnp.concatenate(
                    [_v(n_x, vx), _v(bu["img"].shape[0], vu)], axis=0)

            k0, k1, k2 = fwd_keys(rng, 3)
            logits_w, ns_w = net_apply(params, state, input_u, train=True,
                                       rng=k0)
            prob_w = jax.nn.softmax(logits_w.astype(jnp.float32), axis=1)
            max_prob = prob_w.max(1)
            label_u_pred = prob_w.argmax(1)
            mask_u = (max_prob >= conf_thre).astype(jnp.float32)
            if valid_xu is not None:  # pad rows are never pseudo-labeled
                mask_u = mask_u * valid_xu
            label_u_pred = jax.lax.stop_gradient(label_u_pred)
            mask_u = jax.lax.stop_gradient(mask_u)

            # pseudo-label quality vs the (unused-for-training) true labels
            eq = (label_u_pred[n_x:] == bu["label"]).astype(jnp.float32)
            acc_thre = (eq * mask_u[n_x:]).sum() / (mask_u[n_x:].sum() + 1e-5)
            acc_raw = masked_mean(eq, vu)
            keep_rate = masked_mean(mask_u[n_x:], vu)

            def loss_fn(p):
                logits_x, ns = net_apply(p, ns_w, bx["img"], train=True,
                                         rng=k1)
                loss_x = cross_entropy_logits(logits_x, bx["label"], bx.get("valid"))
                logits_u2, ns = net_apply(p, ns, input_u2, train=True, rng=k2)
                logp = jax.nn.log_softmax(logits_u2.astype(jnp.float32), axis=1)
                nll = -jnp.take_along_axis(logp, label_u_pred[:, None], 1)[:, 0]
                loss_u = masked_mean(nll * mask_u, valid_xu)
                return loss_x + loss_u * weight_u, (logits_x, loss_x, loss_u, ns)

            (loss, (logits_x, loss_x, loss_u, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            params, opt_state = _sgd_like_update(self.tx, grads, opt_state, params)
            metrics = {
                "loss": loss,
                "loss_x": loss_x,
                "acc_x": accuracy(logits_x, bx["label"], bx.get("valid")),
                "loss_u": loss_u,
                "y_u_pred_acc_raw": acc_raw,
                "y_u_pred_acc_thre": acc_thre,
                "y_u_pred_keep": keep_rate,
            }
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core

"""DA trainer family: SourceOnly, DANN, ADDA, AdaBN, MCD, MME, SE, M3SDA,
CDAC, DAEL.

TPU-native rebuilds of Dassl.pytorch/dassl/engine/da/*.py.  Every method is
ONE pure jitted step; where the reference performs several optimizer steps
per batch (MCD's A/B/C, ADDA's critic-then-model, MME's two backwards),
the sequential updates happen inside the same compiled step with per-group
optimizer states — same math, one dispatch.  Stacked per-domain classifier
banks (M3SDA, DAEL) replace the reference's ModuleList-indexed-by-
``.item()`` pattern with one-hot gathers so the step stays shape-static.
"""

import random

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ...data.loader import BatchLoader
from ...data.samplers import build_sampler
from ...data.transforms import TrainTransform
from ...engine.trainer import TRAINER_REGISTRY
from ...models.backbones.common import linear_apply, linear_init
from .base import (NetTrainerXU, accuracy, cross_entropy_logits, masked_mean,
                   masked_moments, masked_pair_mean, masked_row_mean)
from .ops import (
    bce_logits,
    create_onehot,
    ema_update,
    fwd_keys,
    grad_reverse,
    mlp_head_apply,
    mlp_head_init,
    prototypes_apply,
    prototypes_init,
    sigmoid_rampup,
)
from .ssl import _WeakStrongWrapper


@TRAINER_REGISTRY.register()
class SourceOnly(NetTrainerXU):
    """CE on the labeled source batch only (da/source_only.py)."""

    def build_method(self):
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            (k0,) = fwd_keys(rng, 1)

            def loss_fn(p):
                logits, ns = net_apply(p, state, bx["img"], train=True, rng=k0)
                loss = cross_entropy_logits(logits, bx["label"], bx.get("valid"))
                return loss, (logits, ns)

            (loss, (logits, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {"loss": loss,
                       "acc": accuracy(logits, bx["label"], bx.get("valid"))}
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class DANN(NetTrainerXU):
    """Domain-adversarial training (da/dann.py): binary domain critic on
    gradient-reversed features, lambda ramped 2/(1+e^-10p)-1."""

    param_groups = ["net", "critic"]

    def build_method(self):
        fdim = self.net.fdim
        rng = np.random.RandomState(max(self.cfg.SEED, 0) + 7)
        cp, cs, cout = mlp_head_init(rng, fdim, [fdim, fdim])
        cp["out"] = linear_init(rng, cout, 1)
        self.params["critic"] = cp
        self.model_state["critic"] = cs
        spe = max(self._num_batches(), 1)
        total_steps = float(self.max_epoch * spe)
        net = self.net

        def critic_apply(p, s, f, train):
            h, ns = mlp_head_apply(f, p, s, train, n_layers=2)
            return linear_apply(h, p["out"]), ns

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            progress = step.astype(jnp.float32) / total_steps
            lmda = 2.0 / (1.0 + jnp.exp(-10.0 * progress)) - 1.0

            k0, k1 = fwd_keys(rng, 2)

            def loss_fn(p):
                (logit_x, feat_x), ns_net = net.apply(
                    p["net"], state["net"], bx["img"], train=True,
                    return_feature=True, rng=k0)
                (_, feat_u), ns_net = net.apply(
                    p["net"], ns_net, bu["img"], train=True,
                    return_feature=True, rng=k1)
                loss_x = cross_entropy_logits(
                    logit_x, bx["label"], bx.get("valid"))
                rx = grad_reverse(feat_x, lmda)
                ru = grad_reverse(feat_u, lmda)
                out_xd, ns_c = critic_apply(p["critic"], state["critic"], rx, True)
                out_ud, ns_c = critic_apply(p["critic"], ns_c, ru, True)
                loss_d = bce_logits(out_xd, jnp.ones_like(out_xd), bx.get("valid"))
                loss_d += bce_logits(out_ud, jnp.zeros_like(out_ud), bu.get("valid"))
                ns = dict(state, net=ns_net, critic=ns_c)
                return loss_x + loss_d, (logit_x, loss_x, loss_d, ns)

            (_, (logit_x, loss_x, loss_d, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            new_p, new_os = {}, {}
            for g in ("net", "critic"):
                new_p[g], new_os[g] = self.group_update(
                    grads[g], opt_state[g], params[g])
            metrics = {"loss": loss_x + loss_d, "loss_x": loss_x,
                       "acc_x": accuracy(logit_x, bx["label"], bx.get("valid")),
                       "loss_d": loss_d}
            return new_p, new_os, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class ADDA(NetTrainerXU):
    """Adversarial discriminative DA (da/adda.py): frozen source encoder,
    critic vs target encoder; only backbone(+head) of the target net move
    (the classifier stays at its source-trained weights)."""

    param_groups = ["net", "critic"]

    def check_cfg(self, cfg):
        assert cfg.MODEL.INIT_WEIGHTS, (
            "The weights of source model must be provided (MODEL.INIT_WEIGHTS)")

    def build_method(self):
        fdim = self.net.fdim
        rng = np.random.RandomState(max(self.cfg.SEED, 0) + 7)
        cp, cs, cout = mlp_head_init(rng, fdim, [fdim, fdim // 2])
        cp["out"] = linear_init(rng, cout, 1)
        self.params["critic"] = cp
        self.model_state["critic"] = cs
        net = self.net

        def critic_apply(p, s, f, train):
            h, ns = mlp_head_apply(f, p, s, train, n_layers=2)
            return linear_apply(h, p["out"]), ns

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            # frozen source encoder in eval mode (reference source_model.eval())
            (_, feat_x), _ = net.apply(
                extra["source"], extra["source_state"], bx["img"],
                train=False, return_feature=True)
            k0, k1 = fwd_keys(rng, 2)
            (_, feat_u), ns_net = net.apply(
                params["net"], state["net"], bu["img"], train=True,
                return_feature=True, rng=k0)

            def critic_loss(pc):
                lx, ns_c = critic_apply(pc, state["critic"], feat_x, True)
                lu, ns_c = critic_apply(pc, ns_c, jax.lax.stop_gradient(feat_u), True)
                loss = bce_logits(lx, jnp.ones_like(lx), bx.get("valid"))
                loss += bce_logits(lu, jnp.zeros_like(lu), bu.get("valid"))
                return loss, ns_c

            (loss_critic, ns_c), gc = jax.value_and_grad(
                critic_loss, has_aux=True)(params["critic"])
            new_critic, os_c = self.group_update(
                gc, opt_state["critic"], params["critic"])

            def model_loss(pn):
                (_, fu), ns_n = net.apply(
                    pn, state["net"], bu["img"], train=True,
                    return_feature=True, rng=k1)
                # the reference's third critic forward (adda.py:74) runs in
                # train mode too: its BN batch-stat pass also advances the
                # critic's running statistics — keep that state update
                lu, ns_c2 = critic_apply(new_critic, ns_c, fu, True)
                return bce_logits(lu, jnp.ones_like(lu), bu.get("valid")), (ns_n, ns_c2)

            (loss_model, (_, ns_c)), gn = jax.value_and_grad(
                model_loss, has_aux=True)(params["net"])
            new_net, os_n = self.group_update(gn, opt_state["net"], params["net"])
            # classifier is closed (reference open_specified_layers: only
            # backbone/head train) — restore it after the update
            if "classifier" in new_net:
                new_net = dict(new_net, classifier=params["net"]["classifier"])

            ns = dict(state, net=ns_net, critic=ns_c)
            metrics = {"loss": loss_critic + loss_model,
                       "loss_critic": loss_critic, "loss_model": loss_model}
            return ({"net": new_net, "critic": new_critic},
                    {"net": os_n, "critic": os_c}, ns, extra, metrics)

        self.step_core = step_core

    def finalize_method(self):
        # snapshot AFTER MODEL.INIT_WEIGHTS was applied in __init__; must be
        # a fresh buffer, not an alias of the live (donated) params
        self.extra["source"] = jax.tree.map(
            lambda x: jnp.array(x, copy=True), self.params["net"])
        self.extra["source_state"] = jax.tree.map(
            lambda x: jnp.array(x, copy=True), self.model_state["net"])


def _reset_bn_stats(state):
    def visit(node):
        if isinstance(node, dict):
            if set(node) == {"mean", "var"}:
                return {"mean": jnp.zeros_like(node["mean"]),
                        "var": jnp.ones_like(node["var"])}
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(state)


@TRAINER_REGISTRY.register()
class AdaBN(NetTrainerXU):
    """Adaptive BatchNorm (da/adabn.py): reset running BN statistics, then
    re-estimate them from target-domain forwards; no gradient updates."""

    param_groups = []

    def check_cfg(self, cfg):
        assert cfg.MODEL.INIT_WEIGHTS, (
            "The weights of source model must be provided (MODEL.INIT_WEIGHTS)")

    def finalize_method(self):
        self.model_state = _reset_bn_stats(self.model_state)

    def build_method(self):
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            (k0,) = fwd_keys(rng, 1)
            _, ns = net_apply(params, state, bu["img"], train=True, rng=k0)
            return params, opt_state, ns, extra, {"loss": jnp.float32(0.0)}

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class MCD(NetTrainerXU):
    """Maximum classifier discrepancy (da/mcd.py): three-phase min/max over
    a feature net F and two classifier heads C1/C2, fused into one step."""

    param_groups = ["F", "C1", "C2"]

    def group_updates_per_step(self):
        # F steps in phase A and n_step_F times in phase C; C1/C2 in A and B.
        return {"F": 1 + int(self.cfg.TRAINER.MCD.N_STEP_F), "C1": 2, "C2": 2}

    def build_method(self):
        cfg = self.cfg
        self.use_feature_net()
        n_step_F = int(cfg.TRAINER.MCD.N_STEP_F)
        rng = np.random.RandomState(max(cfg.SEED, 0) + 7)
        fdim = self.net.fdim
        self.params = {"F": self.params["net"],
                       "C1": linear_init(rng, fdim, self.num_classes),
                       "C2": linear_init(rng, fdim, self.num_classes)}
        self.model_state = {"F": self.model_state["net"]}
        net = self.net

        def F_apply(p, s, x, train, rng=None):
            return net.apply(p, s, x, train=train, rng=rng)

        def discrepancy(p1, p2, valid):
            # row-masked: mesh-padded rows must not bias the L1 discrepancy
            return masked_row_mean(jnp.abs(p1 - p2), valid)

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            vx = bx.get("valid")
            vu = bu.get("valid")
            keys = fwd_keys(rng, 3 + n_step_F)

            # Step A: CE through F, C1, C2 jointly
            def loss_A(p):
                f, ns = F_apply(p["F"], state["F"], bx["img"], True, keys[0])
                l1 = cross_entropy_logits(linear_apply(f, p["C1"]), bx["label"], vx)
                l2 = cross_entropy_logits(linear_apply(f, p["C2"]), bx["label"], vx)
                return l1 + l2, ns

            (loss_a, ns_f), gA = jax.value_and_grad(loss_A, has_aux=True)(params)
            new_p, new_os = {}, {}
            for g in ("F", "C1", "C2"):
                new_p[g], new_os[g] = self.group_update(
                    gA[g], opt_state[g], params[g], group=g)
            state = dict(state, F=ns_f)

            # Step B: maximize discrepancy w.r.t. C1/C2 (F frozen, no-grad
            # forwards still update BN stats like the reference's train-mode
            # no_grad passes)
            feat_x, ns_f = F_apply(new_p["F"], state["F"], bx["img"], True,
                                   keys[1])
            feat_x = jax.lax.stop_gradient(feat_x)
            feat_u, ns_f = F_apply(new_p["F"], ns_f, bu["img"], True, keys[2])
            feat_u = jax.lax.stop_gradient(feat_u)
            state = dict(state, F=ns_f)

            def loss_B(pc):
                l1 = cross_entropy_logits(linear_apply(feat_x, pc["C1"]),
                                          bx["label"], vx)
                l2 = cross_entropy_logits(linear_apply(feat_x, pc["C2"]),
                                          bx["label"], vx)
                p1 = jax.nn.softmax(linear_apply(feat_u, pc["C1"]).astype(jnp.float32), 1)
                p2 = jax.nn.softmax(linear_apply(feat_u, pc["C2"]).astype(jnp.float32), 1)
                return l1 + l2 - discrepancy(p1, p2, vu)

            loss_b, gB = jax.value_and_grad(loss_B)(
                {"C1": new_p["C1"], "C2": new_p["C2"]})
            for g in ("C1", "C2"):
                new_p[g], new_os[g] = self.group_update(
                    gB[g], new_os[g], new_p[g], group=g)

            # Step C: minimize discrepancy w.r.t. F, n_step_F times
            loss_c = jnp.float32(0.0)
            for ci in range(n_step_F):
                def loss_C(pf, st, _k=keys[3 + ci]):
                    f, ns = F_apply(pf, st, bu["img"], True, _k)
                    p1 = jax.nn.softmax(linear_apply(f, new_p["C1"]).astype(jnp.float32), 1)
                    p2 = jax.nn.softmax(linear_apply(f, new_p["C2"]).astype(jnp.float32), 1)
                    return discrepancy(p1, p2, vu), ns

                (loss_c, ns_f), gC = jax.value_and_grad(
                    loss_C, has_aux=True)(new_p["F"], state["F"])
                new_p["F"], new_os["F"] = self.group_update(
                    gC, new_os["F"], new_p["F"], group="F")
                state = dict(state, F=ns_f)

            metrics = {"loss": loss_a, "loss_step_A": loss_a,
                       "loss_step_B": loss_b, "loss_step_C": loss_c}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            f, _ = net.apply(params["F"], state["F"], images, train=False)
            return linear_apply(f, params["C1"])

        self.infer_core = infer_core


@TRAINER_REGISTRY.register()
class MME(NetTrainerXU):
    """Minimax entropy (da/mme.py): cosine prototypes; supervised CE then
    entropy maximized w.r.t. prototypes / minimized w.r.t. features via GRL."""

    param_groups = ["net", "C"]

    def group_updates_per_step(self):
        # both groups step after the supervised AND the entropy backward
        return {"net": 2, "C": 2}

    def build_method(self):
        self.use_feature_net()
        lmda = float(self.cfg.TRAINER.MME.LMDA)
        rng = np.random.RandomState(max(self.cfg.SEED, 0) + 7)
        self.params["C"] = prototypes_init(rng, self.net.fdim, self.num_classes)
        net = self.net

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            k0, k1 = fwd_keys(rng, 2)

            def sup_loss(p):
                f, ns = net.apply(p["net"], state["net"], bx["img"], train=True,
                                  rng=k0)
                logit_x = prototypes_apply(f, p["C"])
                loss_x = cross_entropy_logits(logit_x, bx["label"], bx.get("valid"))
                return loss_x, (logit_x, ns)

            (loss_x, (logit_x, ns_net)), g1 = jax.value_and_grad(
                sup_loss, has_aux=True)(params)
            new_p, new_os = {}, {}
            for g in ("net", "C"):
                new_p[g], new_os[g] = self.group_update(
                    g1[g], opt_state[g], params[g], group=g)

            def ent_loss(p):
                f, ns = net.apply(p["net"], ns_net, bu["img"], train=True,
                                  rng=k1)
                logit_u = prototypes_apply(f, p["C"], reverse=True)
                prob_u = jax.nn.softmax(logit_u.astype(jnp.float32), 1)
                ent = -(-prob_u * jnp.log(prob_u + 1e-5)).sum(1)
                return masked_mean(ent, bu.get("valid")) * lmda, ns

            (loss_u, ns_net), g2 = jax.value_and_grad(
                ent_loss, has_aux=True)(new_p)
            for g in ("net", "C"):
                new_p[g], new_os[g] = self.group_update(
                    g2[g], new_os[g], new_p[g], group=g)

            state = dict(state, net=ns_net)
            metrics = {"loss": loss_x, "loss_x": loss_x,
                       "acc_x": accuracy(logit_x, bx["label"], bx.get("valid")),
                       "loss_u": loss_u / lmda}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            f, _ = net.apply(params["net"], state["net"], images, train=False)
            return prototypes_apply(f, params["C"])

        self.infer_core = infer_core


@TRAINER_REGISTRY.register()
class SE(NetTrainerXU):
    """Self-ensembling (da/se.py): EMA teacher consistency on two views of
    the unlabeled target, confidence mask or sigmoid rampup."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.K_TRANSFORMS == 2

    def build_method(self):
        node = self.cfg.TRAINER.SE
        ema_alpha = float(node.EMA_ALPHA)
        conf_thre = float(node.CONF_THRE)
        rampup = int(node.RAMPUP)
        net = self.net
        net_apply = self.net_apply

        self.extra = {
            "teacher": jax.tree.map(
                lambda x: jnp.array(x, copy=True), self.params["net"]),
            "teacher_state": jax.tree.map(
                lambda x: jnp.array(x, copy=True), self.model_state["net"]),
        }

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            input_x = bx["img"][:, 0]
            input_u1, input_u2 = bu["img"][:, 0], bu["img"][:, 1]
            k0, k1, k2 = fwd_keys(rng, 3)
            t_logits, t_ns = net.apply(
                extra["teacher"], extra["teacher_state"], input_u2, train=True,
                rng=k0)
            t_prob = jax.lax.stop_gradient(
                jax.nn.softmax(t_logits.astype(jnp.float32), 1))

            def loss_fn(p):
                logit_x, ns = net_apply(p, state, input_x, train=True, rng=k1)
                loss_x = cross_entropy_logits(logit_x, bx["label"], bx.get("valid"))
                logit_u, ns = net_apply(p, ns, input_u1, train=True, rng=k2)
                prob_u = jax.nn.softmax(logit_u.astype(jnp.float32), 1)
                per = ((prob_u - t_prob) ** 2).sum(1)
                if conf_thre:
                    mask = (t_prob.max(1) > conf_thre).astype(jnp.float32)
                    loss_u = masked_mean(per * mask, bu.get("valid"))
                else:
                    w = sigmoid_rampup(step, rampup)
                    loss_u = masked_mean(per, bu.get("valid")) * w
                return loss_x + loss_u, (logit_x, loss_x, loss_u, ns)

            (loss, (logit_x, loss_x, loss_u, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            alpha = jnp.minimum(
                1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), ema_alpha)
            extra = {"teacher": ema_update(params["net"], extra["teacher"], alpha),
                     "teacher_state": t_ns}
            metrics = {"loss": loss, "loss_x": loss_x,
                       "acc_x": accuracy(logit_x, bx["label"], bx.get("valid")),
                       "loss_u": loss_u}
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class M3SDA(NetTrainerXU):
    """Moment matching for multi-source DA (da/m3sda.py): per-domain pair
    classifiers as a stacked bank, first/second-moment alignment, MCD-style
    3-phase update."""

    param_groups = ["F", "C"]

    def group_updates_per_step(self):
        # F steps in phase A and n_step_F times in phase C; C in A and B.
        return {"F": 1 + int(self.cfg.TRAINER.M3SDA.N_STEP_F), "C": 2}

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.TRAIN_X.SAMPLER == "RandomDomainSampler"
        assert not cfg.DATALOADER.TRAIN_U.SAME_AS_X

    def build_method(self):
        cfg = self.cfg
        self.use_feature_net()
        n_domain = cfg.DATALOADER.TRAIN_X.N_DOMAIN
        if n_domain <= 0:
            n_domain = self.num_source_domains
        bs = cfg.DATALOADER.TRAIN_X.BATCH_SIZE
        self.split_batch = bs // n_domain
        self.n_domain = n_domain
        n_step_F = int(cfg.TRAINER.M3SDA.N_STEP_F)
        lmda = float(cfg.TRAINER.M3SDA.LMDA)
        K = self.num_source_domains
        fdim = self.net.fdim
        rng = np.random.RandomState(max(cfg.SEED, 0) + 7)
        # stacked bank: two classifiers per source domain
        bank = {}
        for ci in ("c1", "c2"):
            ws = np.stack([linear_init(rng, fdim, self.num_classes)["w"]
                           for _ in range(K)])
            bs_ = np.stack([linear_init(rng, fdim, self.num_classes)["b"]
                            for _ in range(K)])
            bank[ci] = {"w": ws, "b": bs_}
        self.params = {"F": self.params["net"], "C": bank}
        self.model_state = {"F": self.model_state["net"]}
        net = self.net
        split, nd = self.split_batch, self.n_domain

        def pair_apply(bank_p, d, f):
            """Apply domain-d's (c1, c2) to features f; d is traced."""
            outs = []
            for ci in ("c1", "c2"):
                w = jnp.take(bank_p[ci]["w"], d, axis=0)
                b = jnp.take(bank_p[ci]["b"], d, axis=0)
                outs.append(f @ w.astype(f.dtype) + b.astype(f.dtype))
            return outs

        def euclidean(a, b):
            return jnp.sqrt(((a - b) ** 2).sum() + 1e-12)

        def moment_distance(feats, feat_u, valid_u):
            def pairwise(xs, u):
                dist, count = 0.0, 0
                for xi in xs:
                    dist, count = dist + euclidean(xi, u), count + 1
                for i in range(len(xs) - 1):
                    for j in range(i + 1, len(xs)):
                        dist, count = dist + euclidean(xs[i], xs[j]), count + 1
                return dist / count

            # ddof=1: torch Tensor.var defaults to the unbiased estimator
            # (da/m3sda.py moment_distance uses xi.var(0)).  The source
            # chunks are exact per-domain slices (mesh-pad rows sit past
            # nd*split and never enter them); the target moments mask them.
            mu_u, var_u = masked_moments(feat_u, valid_u, ddof=1)
            d1 = pairwise([f.mean(0) for f in feats], mu_u)
            d2 = pairwise([f.var(0, ddof=1) for f in feats], var_u)
            return (d1 + d2) / 2.0

        def chunks(x):
            return [x[i * split:(i + 1) * split] for i in range(nd)]

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            xs = chunks(bx["img"])
            ys = chunks(bx["label"])
            ds = [bx["domain"][i * split] for i in range(nd)]
            vu = bu.get("valid")
            keys = fwd_keys(rng, 2 * (nd + 1) + n_step_F)

            # Step A
            def loss_A(p):
                loss_x, feats, ns = 0.0, [], state["F"]
                for ki, (x, y, d) in enumerate(zip(xs, ys, ds)):
                    f, ns = net.apply(p["F"], ns, x, train=True, rng=keys[ki])
                    z1, z2 = pair_apply(p["C"], d, f)
                    loss_x += (cross_entropy_logits(z1, y)
                               + cross_entropy_logits(z2, y))
                    feats.append(f)
                loss_x = loss_x / nd
                fu, ns = net.apply(p["F"], ns, bu["img"], train=True,
                                   rng=keys[nd])
                loss_msda = moment_distance(feats, fu, vu)
                return loss_x + loss_msda * lmda, ns

            (loss_a, ns_f), gA = jax.value_and_grad(loss_A, has_aux=True)(params)
            new_p, new_os = {}, {}
            for g in ("F", "C"):
                new_p[g], new_os[g] = self.group_update(
                    gA[g], opt_state[g], params[g], group=g)
            state = dict(state, F=ns_f)

            # Step B: classifiers maximize discrepancy (features frozen)
            feat_u, ns_f = net.apply(new_p["F"], state["F"], bu["img"],
                                     train=True, rng=keys[nd + 1])
            feat_u = jax.lax.stop_gradient(feat_u)
            feats, ns_f2 = [], ns_f
            for ki, x in enumerate(xs):
                f, ns_f2 = net.apply(new_p["F"], ns_f2, x, train=True,
                                     rng=keys[nd + 2 + ki])
                feats.append(jax.lax.stop_gradient(f))
            state = dict(state, F=ns_f2)

            def loss_B(pc):
                loss_x, loss_dis = 0.0, 0.0
                for f, y, d in zip(feats, ys, ds):
                    z1, z2 = pair_apply(pc, d, f)
                    loss_x += (cross_entropy_logits(z1, y)
                               + cross_entropy_logits(z2, y))
                    z1, z2 = pair_apply(pc, d, feat_u)
                    p1 = jax.nn.softmax(z1.astype(jnp.float32), 1)
                    p2 = jax.nn.softmax(z2.astype(jnp.float32), 1)
                    loss_dis += masked_row_mean(jnp.abs(p1 - p2), vu)
                return loss_x / nd - loss_dis / nd

            loss_b, gB = jax.value_and_grad(loss_B)(new_p["C"])
            new_p["C"], new_os["C"] = self.group_update(
                gB, new_os["C"], new_p["C"], group="C")

            # Step C: features minimize discrepancy
            loss_c = jnp.float32(0.0)
            for ci in range(n_step_F):
                def loss_C(pf, st, _k=keys[2 * (nd + 1) + ci]):
                    fu, ns = net.apply(pf, st, bu["img"], train=True, rng=_k)
                    loss_dis = 0.0
                    for d in ds:
                        z1, z2 = pair_apply(new_p["C"], d, fu)
                        p1 = jax.nn.softmax(z1.astype(jnp.float32), 1)
                        p2 = jax.nn.softmax(z2.astype(jnp.float32), 1)
                        loss_dis += masked_row_mean(jnp.abs(p1 - p2), vu)
                    return loss_dis / nd, ns

                (loss_c, ns_f), gC = jax.value_and_grad(
                    loss_C, has_aux=True)(new_p["F"], state["F"])
                new_p["F"], new_os["F"] = self.group_update(
                    gC, new_os["F"], new_p["F"], group="F")
                state = dict(state, F=ns_f)

            metrics = {"loss": loss_a, "loss_step_A": loss_a,
                       "loss_step_B": loss_b, "loss_step_C": loss_c}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            """Documented divergence: the reference's M3SDA eval path is
            broken (no model_inference; self.model never built,
            da/m3sda.py); here inference ensembles c1 over all source
            domains, mirroring DAEL's expert-mean eval."""
            f, _ = net.apply(params["F"], state["F"], images, train=False)
            z = jnp.einsum("bf,kfc->bkc", f, params["C"]["c1"]["w"].astype(f.dtype))
            z = z + params["C"]["c1"]["b"].astype(f.dtype)[None]
            return z.mean(1)

        self.infer_core = infer_core


@TRAINER_REGISTRY.register()
class CDAC(NetTrainerXU):
    """Cross-domain adaptive clustering (da/cdac.py): adversarial adaptive
    clustering on pairwise similarity, confident pseudo-labels on the
    strong views, consistency with exponential rampup; the reference's
    custom LambdaLR annealing (1 + 10 t/T)^-0.75 is reproduced per group,
    with the prototype head's LR multiplied by CLASS_LR_MULTI."""

    param_groups = ["F", "C"]

    def check_cfg(self, cfg):
        assert len(cfg.TRAINER.CDAC.STRONG_TRANSFORMS) > 0
        assert cfg.DATALOADER.K_TRANSFORMS == 2

    def build_data_loader(self):
        super().build_data_loader()
        cfg = self.cfg
        strong_cfg = cfg.clone()
        strong_cfg.defrost()
        strong_cfg.INPUT.TRANSFORMS = list(cfg.TRAINER.CDAC.STRONG_TRANSFORMS)
        seed = cfg.SEED if cfg.SEED >= 0 else None
        tfm_weak = TrainTransform(cfg, rng=random.Random(seed or 0))
        tfm_strong = TrainTransform(strong_cfg, rng=random.Random((seed or 0) + 1))

        def two_view(data_source, sampler_name, bs):
            wrapper = _WeakStrongWrapper(
                data_source, tfm_weak, tfm_strong, seed=seed, k=2)
            sampler = build_sampler(sampler_name, data_source, batch_size=bs,
                                    seed=seed)
            return BatchLoader(
                wrapper, sampler, batch_size=bs,
                drop_last=len(data_source) >= bs,
                num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
                extra_keys=("img2",))

        self.train_loader_x = two_view(
            self.dm.dataset.train_x, cfg.DATALOADER.TRAIN_X.SAMPLER,
            cfg.DATALOADER.TRAIN_X.BATCH_SIZE)
        if self.dm.dataset.train_u:
            self.train_loader_u = two_view(
                self.dm.dataset.train_u, cfg.DATALOADER.TRAIN_U.SAMPLER,
                cfg.DATALOADER.TRAIN_U.BATCH_SIZE)

    def _build_optimizer(self):
        from ...engine.optim import build_optimizer

        cfg = self.cfg
        node = cfg.TRAINER.CDAC
        self.steps_per_epoch = max(self._num_batches(), 1)
        max_iter = float(self.max_epoch * self.steps_per_epoch)

        def anneal(count):
            t = count.astype(jnp.float32) if hasattr(count, "astype") else float(count)
            return (1.0 + (t / max_iter) * 10.0) ** (-0.75)

        # each group steps TWICE per iteration (Eq.2 then Eq.3/4/8, both
        # with model_backward_and_update in the reference) while the
        # reference's LambdaLR advances once per iteration (cdac.py:225), so
        # the optax update count maps to the iteration count via // 2
        def sched_F(c):
            return cfg.OPTIM.LR * anneal(c // 2)

        def sched_C(c):
            return cfg.OPTIM.LR * float(node.CLASS_LR_MULTI) * anneal(c // 2)

        sched_F.lr_at_epoch = lambda e: float(
            cfg.OPTIM.LR * anneal(float(e * self.steps_per_epoch)))
        self.tx_F, self.lr_schedule = build_optimizer(
            cfg, self.steps_per_epoch, schedule_override=sched_F)
        self.tx_C, _ = build_optimizer(
            cfg, self.steps_per_epoch, schedule_override=sched_C)
        self.tx = self.tx_F  # for generic helpers
        self.opt_state = {"F": self.tx_F.init(self.params["F"]),
                          "C": self.tx_C.init(self.params["C"])}
        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        print(f"# params to be updated: {n_params:,}")

    def build_method(self):
        cfg = self.cfg
        self.use_feature_net()
        node = cfg.TRAINER.CDAC
        rampup_coef = float(node.RAMPUP_COEF)
        rampup_iters = int(node.RAMPUP_ITRS)
        topk = int(node.TOPK_MATCH)
        p_thresh = float(node.P_THRESH)
        rng = np.random.RandomState(max(cfg.SEED, 0) + 7)
        self.params = {"F": self.params["net"],
                       "C": prototypes_init(rng, self.net.fdim, self.num_classes)}
        self.model_state = {"F": self.model_state["net"]}
        net = self.net

        def sim_matrix(feat):
            """s_ij = 1 iff the top-k activated feature indices coincide
            (cdac.py get_similarity_matrix, vectorized)."""
            f = jax.lax.stop_gradient(feat.astype(jnp.float32))
            _, idx = jax.lax.top_k(f, topk)
            idx = jnp.sort(idx, axis=1)
            eq = (idx[:, None, :] == idx[None, :, :]).all(-1)
            return eq.astype(jnp.float32)

        def group_step(tx, grads, os, p):
            updates, os = tx.update(grads, os, p)
            return optax.apply_updates(p, updates), os

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            input_x = bx["img"][:, 0]
            input_u = bu["img"][:, 0]
            input_us = bu["img2"][:, 0]
            input_us2 = bu["img2"][:, 1]
            vu = bu.get("valid")

            keys = fwd_keys(rng, 4)

            # Eq. 2 supervised loss (own backward+step)
            def sup_loss(p):
                f, ns = net.apply(p["F"], state["F"], input_x, train=True,
                                  rng=keys[0])
                logit_x = prototypes_apply(f, p["C"])
                return cross_entropy_logits(
                    logit_x, bx["label"], bx.get("valid")), (logit_x, ns)

            (loss_x, (logit_x, ns_f)), g1 = jax.value_and_grad(
                sup_loss, has_aux=True)(params)
            new_p, new_os = {}, {}
            new_p["F"], new_os["F"] = group_step(
                self.tx_F, g1["F"], opt_state["F"], params["F"])
            new_p["C"], new_os["C"] = group_step(
                self.tx_C, g1["C"], opt_state["C"], params["C"])
            state = dict(state, F=ns_f)

            def unsup_loss(p):
                fu, ns = net.apply(p["F"], state["F"], input_u, train=True,
                                   rng=keys[1])
                fus, ns = net.apply(p["F"], ns, input_us, train=True,
                                    rng=keys[2])
                fus2, ns = net.apply(p["F"], ns, input_us2, train=True,
                                     rng=keys[3])

                # Eq. 3 adversarial adaptive clustering (GRL prototypes)
                lu_r = prototypes_apply(fu, p["C"], reverse=True)
                lus_r = prototypes_apply(fus, p["C"], reverse=True)
                pu_r = jax.nn.softmax(lu_r.astype(jnp.float32), 1)
                pus_r = jax.nn.softmax(lus_r.astype(jnp.float32), 1)
                sim = sim_matrix(fu)
                P = pu_r @ pus_r.T
                bce = -(sim * jnp.log(P + 1e-7)
                        + (1.0 - sim) * jnp.log(1.0 - P + 1e-7))
                aac_loss = -masked_pair_mean(bce, vu)

                # Eq. 4 pseudo-label loss on the second strong view
                lu = prototypes_apply(fu, p["C"])
                lus = prototypes_apply(fus, p["C"])
                lus2 = prototypes_apply(fus2, p["C"])
                prob_u = jax.lax.stop_gradient(
                    jax.nn.softmax(lu.astype(jnp.float32), 1))
                max_probs = prob_u.max(1)
                max_idx = prob_u.argmax(1)
                mask = (max_probs >= p_thresh).astype(jnp.float32)
                if vu is not None:  # mesh-pad rows are never pseudo-labeled
                    mask = mask * vu.astype(mask.dtype)
                logp = jax.nn.log_softmax(lus2.astype(jnp.float32), 1)
                nll = -jnp.take_along_axis(logp, max_idx[:, None], 1)[:, 0]
                pl_loss = masked_mean(nll * mask, vu)

                # Eq. 8 consistency with exponential rampup
                cons_multi = rampup_coef * sigmoid_rampup(step, rampup_iters)
                pus = jax.nn.softmax(lus.astype(jnp.float32), 1)
                pus2 = jax.nn.softmax(lus2.astype(jnp.float32), 1)
                cons_loss = cons_multi * masked_row_mean((pus - pus2) ** 2, vu)

                loss_u = aac_loss + pl_loss + cons_loss
                aux = (aac_loss, pl_loss, cons_loss, max_idx, mask, ns)
                return loss_u, aux

            (loss_u, (aac_loss, pl_loss, cons_loss, max_idx, mask, ns_f)), g2 = (
                jax.value_and_grad(unsup_loss, has_aux=True)(new_p))
            new_p["F"], new_os["F"] = group_step(
                self.tx_F, g2["F"], new_os["F"], new_p["F"])
            new_p["C"], new_os["C"] = group_step(
                self.tx_C, g2["C"], new_os["C"], new_p["C"])
            state = dict(state, F=ns_f)

            eq = (max_idx == bu["label"]).astype(jnp.float32)
            metrics = {
                "loss": loss_x + loss_u,
                "loss_x": loss_x,
                "acc_x": accuracy(logit_x, bx["label"], bx.get("valid")),
                "loss_u": loss_u, "aac_loss": aac_loss, "pl_loss": pl_loss,
                "cons_loss": cons_loss,
                "p_u_pred_acc": masked_mean(eq, vu),
                "p_u_pred_acc_thre": (eq * mask).sum() / (mask.sum() + 1e-5),
                "p_u_pred_keep": masked_mean(mask, vu),
            }
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            f, _ = net.apply(params["F"], state["F"], images, train=False)
            return prototypes_apply(f, params["C"])

        self.infer_core = infer_core


@TRAINER_REGISTRY.register()
class DAEL(NetTrainerXU):
    """Domain-adaptive ensemble learning (da/dael.py): per-source-domain
    expert heads (stacked bank), cross-expert consistency on the strong
    view, most-confident-expert pseudo-labels on target."""

    param_groups = ["F", "E"]

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.TRAIN_X.SAMPLER == "RandomDomainSampler"
        assert not cfg.DATALOADER.TRAIN_U.SAME_AS_X
        assert len(cfg.TRAINER.DAEL.STRONG_TRANSFORMS) > 0

    def build_data_loader(self):
        super().build_data_loader()
        cfg = self.cfg
        strong_cfg = cfg.clone()
        strong_cfg.defrost()
        strong_cfg.INPUT.TRANSFORMS = list(cfg.TRAINER.DAEL.STRONG_TRANSFORMS)
        seed = cfg.SEED if cfg.SEED >= 0 else None
        tfm_weak = TrainTransform(cfg, rng=random.Random(seed or 0))
        tfm_strong = TrainTransform(strong_cfg, rng=random.Random((seed or 0) + 1))

        def two_view(data_source, sampler_name, bs, n_domain=0):
            wrapper = _WeakStrongWrapper(data_source, tfm_weak, tfm_strong,
                                         seed=seed)
            sampler = build_sampler(sampler_name, data_source, batch_size=bs,
                                    n_domain=n_domain, seed=seed)
            return BatchLoader(
                wrapper, sampler, batch_size=bs,
                drop_last=len(data_source) >= bs,
                num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
                extra_keys=("img2",))

        self.train_loader_x = two_view(
            self.dm.dataset.train_x, cfg.DATALOADER.TRAIN_X.SAMPLER,
            cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
            cfg.DATALOADER.TRAIN_X.N_DOMAIN)
        if self.dm.dataset.train_u:
            self.train_loader_u = two_view(
                self.dm.dataset.train_u, cfg.DATALOADER.TRAIN_U.SAMPLER,
                cfg.DATALOADER.TRAIN_U.BATCH_SIZE)

    def build_method(self):
        cfg = self.cfg
        self.use_feature_net()
        n_domain = cfg.DATALOADER.TRAIN_X.N_DOMAIN
        if n_domain <= 0:
            n_domain = self.num_source_domains
        self.split_batch = cfg.DATALOADER.TRAIN_X.BATCH_SIZE // n_domain
        self.n_domain = n_domain
        weight_u = float(cfg.TRAINER.DAEL.WEIGHT_U)
        conf_thre = float(cfg.TRAINER.DAEL.CONF_THRE)
        K = self.num_source_domains
        n_cls = self.num_classes
        fdim = self.net.fdim
        rng = np.random.RandomState(max(cfg.SEED, 0) + 7)
        self.params = {
            "F": self.params["net"],
            "E": {"w": np.stack([linear_init(rng, fdim, n_cls)["w"]
                                 for _ in range(K)]),
                  "b": np.stack([linear_init(rng, fdim, n_cls)["b"]
                                 for _ in range(K)])},
        }
        self.model_state = {"F": self.model_state["net"]}
        net = self.net
        split, nd = self.split_batch, self.n_domain

        def experts_all(E, f):
            """(B, K, C) softmax predictions of every expert."""
            z = jnp.einsum("bf,kfc->bkc", f, E["w"].astype(f.dtype))
            z = z + E["b"].astype(f.dtype)[None]
            return jax.nn.softmax(z.astype(jnp.float32), -1)

        def expert_one(E, d, f):
            w = jnp.take(E["w"], d, axis=0)
            b = jnp.take(E["b"], d, axis=0)
            z = f @ w.astype(f.dtype) + b.astype(f.dtype)
            return jax.nn.softmax(z.astype(jnp.float32), -1)

        def chunks(x):
            return [x[i * split:(i + 1) * split] for i in range(nd)]

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            xs, x2s = chunks(bx["img"]), chunks(bx["img2"])
            ys = [create_onehot(y, n_cls) for y in chunks(bx["label"])]
            ds = [bx["domain"][i * split] for i in range(nd)]

            keys = fwd_keys(rng, 2 * nd + 2)
            # pseudo-labels from the most confident expert (no grad)
            feat_u, ns0 = net.apply(params["F"], state["F"], bu["img"],
                                    train=True, rng=keys[0])
            pred_u = experts_all(params["E"], feat_u)  # (B,K,C)
            experts_max_p = pred_u.max(2)  # (B,K)
            experts_max_idx = pred_u.argmax(2)  # (B,K)
            max_expert_p = experts_max_p.max(1)
            max_expert_idx = experts_max_p.argmax(1)
            pseudo_idx = jnp.take_along_axis(
                experts_max_idx, max_expert_idx[:, None], 1)[:, 0]
            pseudo_u = create_onehot(pseudo_idx, n_cls)
            pseudo_u = jax.lax.stop_gradient(pseudo_u)
            mask_u = (max_expert_p >= conf_thre).astype(jnp.float32)
            vu = bu.get("valid")
            if vu is not None:  # mesh-pad rows are never pseudo-labeled
                mask_u = mask_u * vu.astype(mask_u.dtype)
            mask_u = jax.lax.stop_gradient(mask_u)

            def loss_fn(p):
                loss_x, loss_cr, acc_x = 0.0, 0.0, 0.0
                ns = ns0
                feats, feats2 = [], []
                for ki, x in enumerate(xs):
                    f, ns = net.apply(p["F"], ns, x, train=True,
                                      rng=keys[1 + ki])
                    feats.append(f)
                for ki, x in enumerate(x2s):
                    f, ns = net.apply(p["F"], ns, x, train=True,
                                      rng=keys[1 + nd + ki])
                    feats2.append(f)
                feat_u2, ns = net.apply(p["F"], ns, bu["img2"], train=True,
                                        rng=keys[1 + 2 * nd])

                for f_i, f2_i, y_i, d_i in zip(feats, feats2, ys, ds):
                    pred_i = expert_one(p["E"], d_i, f_i)
                    loss_x += (-y_i * jnp.log(pred_i + 1e-5)).sum(1).mean()
                    expert_label = jax.lax.stop_gradient(pred_i)
                    acc_x += 100.0 * (pred_i.argmax(1) == y_i.argmax(1)).mean()
                    # consistency: mean of the OTHER experts on the strong
                    # view.  Faithful to the reference, which averages over
                    # the other domains PRESENT IN THE BATCH (cr_s = [j for
                    # j in domain_x if j != i], da/dael.py:131) — not all
                    # K-1 source experts — so with N_DOMAIN below
                    # num_source_domains both implementations restrict to
                    # the sampled domains (RandomDomainSampler draws
                    # distinct domains, so ds has no duplicates).
                    all_p = experts_all(p["E"], f2_i)  # (split,K,C)
                    one_hot_d = jax.nn.one_hot(
                        jnp.stack([jnp.asarray(dj) for dj in ds]), K).sum(0)
                    w_others = one_hot_d - jax.nn.one_hot(d_i, K)
                    w_others = w_others / jnp.maximum(w_others.sum(), 1.0)
                    cr_pred = jnp.einsum("bkc,k->bc", all_p, w_others)
                    loss_cr += ((cr_pred - expert_label) ** 2).sum(1).mean()

                loss_x, loss_cr = loss_x / nd, loss_cr / nd
                pred_u2 = experts_all(p["E"], feat_u2).mean(1)
                l_u = (-pseudo_u * jnp.log(pred_u2 + 1e-5)).sum(1)
                loss_u = masked_mean(l_u * mask_u, vu)
                total = loss_x + loss_cr + loss_u * weight_u
                return total, (loss_x, loss_cr, loss_u, acc_x / nd, ns)

            (loss, (loss_x, loss_cr, loss_u, acc_x, ns)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params))
            new_p, new_os = {}, {}
            for g in ("F", "E"):
                new_p[g], new_os[g] = self.group_update(
                    grads[g], opt_state[g], params[g])
            state = dict(state, F=ns)
            metrics = {"loss": loss, "loss_x": loss_x, "acc_x": acc_x,
                       "loss_cr": loss_cr, "loss_u": loss_u}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            f, _ = net.apply(params["F"], state["F"], images, train=False)
            return experts_all(params["E"], f).mean(1)

        self.infer_core = infer_core

"""DG trainer family: Vanilla, CrossGrad, DDAIG, DomainMix, DAELDG.

TPU-native rebuilds of Dassl.pytorch/dassl/engine/dg/*.py.  CrossGrad's
input-gradient perturbations come from jax.grad w.r.t. the image batch
(the reference backprops to input.grad); DDAIG's generator/classifier/
domain-net min-max runs as three sequential group updates inside one
jitted step; DomainMix's cross-domain permutation is a masked categorical
draw (documented divergence: sampled with replacement, the reference's
multinomial is without replacement when the other-domain pool is large
enough — same distribution over pairings in expectation).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ...data.loader import BatchLoader
from ...data.samplers import build_sampler
from ...data.transforms import TrainTransform
from ...engine.trainer import TRAINER_REGISTRY
from ...models.backbones.common import linear_init
from ...models.networks import build_network
from ...models.simple_net import SimpleNet
from .base import NetTrainerX, accuracy, cross_entropy_logits
from .ops import create_onehot, fwd_keys
from .ssl import _WeakStrongWrapper


@TRAINER_REGISTRY.register()
class Vanilla(NetTrainerX):
    """Empirical risk minimization over the merged source domains
    (dg/vanilla.py)."""

    def build_method(self):
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            (k0,) = fwd_keys(rng, 1)

            def loss_fn(p):
                # rng reaches the backbone so MixStyle/EFDMix variants work
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
class CrossGrad(NetTrainerX):
    """Cross-gradient training (dg/crossgrad.py): label net F and domain
    net D perturb each other's inputs with clipped input gradients."""

    param_groups = ["F", "D"]

    def build_method(self):
        cfg = self.cfg
        node = cfg.TRAINER.CROSSGRAD
        eps_f, eps_d = float(node.EPS_F), float(node.EPS_D)
        alpha_f, alpha_d = float(node.ALPHA_F), float(node.ALPHA_D)
        seed = max(cfg.SEED, 0)
        self.F_net = self.net
        self.D_net = SimpleNet(cfg, cfg.MODEL, self.num_source_domains,
                               seed=seed + 13)
        self.params = {"F": self.params["net"], "D": self.D_net.params}
        self.model_state = {"F": self.model_state["net"],
                            "D": self.D_net.state}
        F_net, D_net = self.F_net, self.D_net

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            x, y, d = bx["img"], bx["label"], bx["domain"]
            vx = bx.get("valid")

            # input gradients (the perturbation passes also advance BN
            # stats in the reference; thread their states forward)
            keys = fwd_keys(rng, 6)

            def d_input_loss(img):
                logits, ns = D_net.apply(params["D"], state["D"], img, True,
                                         rng=keys[0])
                return cross_entropy_logits(logits, d, vx), ns

            grad_d, ns_d = jax.grad(d_input_loss, has_aux=True)(x)
            input_d = x + eps_f * jnp.clip(grad_d, -0.1, 0.1)

            def f_input_loss(img):
                logits, ns = F_net.apply(params["F"], state["F"], img, True,
                                         rng=keys[1])
                return cross_entropy_logits(logits, y, vx), ns

            grad_f, ns_f = jax.grad(f_input_loss, has_aux=True)(x)
            input_f = x + eps_d * jnp.clip(grad_f, -0.1, 0.1)

            input_d = jax.lax.stop_gradient(input_d)
            input_f = jax.lax.stop_gradient(input_f)

            def loss_F(pf):
                l1, ns = F_net.apply(pf, ns_f, x, True, rng=keys[2])
                l2, ns = F_net.apply(pf, ns, input_d, True, rng=keys[3])
                loss = ((1 - alpha_f) * cross_entropy_logits(l1, y, vx)
                        + alpha_f * cross_entropy_logits(l2, y, vx))
                return loss, ns

            (loss_f, ns_f2), gF = jax.value_and_grad(
                loss_F, has_aux=True)(params["F"])

            def loss_D(pd):
                l1, ns = D_net.apply(pd, ns_d, x, True, rng=keys[4])
                l2, ns = D_net.apply(pd, ns, input_f, True, rng=keys[5])
                loss = ((1 - alpha_d) * cross_entropy_logits(l1, d, vx)
                        + alpha_d * cross_entropy_logits(l2, d, vx))
                return loss, ns

            (loss_d, ns_d2), gD = jax.value_and_grad(
                loss_D, has_aux=True)(params["D"])

            new_p, new_os = {}, {}
            new_p["F"], new_os["F"] = self.group_update(
                gF, opt_state["F"], params["F"])
            new_p["D"], new_os["D"] = self.group_update(
                gD, opt_state["D"], params["D"])
            state = {"F": ns_f2, "D": ns_d2}
            metrics = {"loss": loss_f + loss_d, "loss_f": loss_f,
                       "loss_d": loss_d}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            logits, _ = F_net.apply(params["F"], state["F"], images, False)
            return logits

        self.infer_core = infer_core


@TRAINER_REGISTRY.register()
class DDAIG(NetTrainerX):
    """Deep domain-adversarial image generation (dg/ddaig.py): generator G
    perturbs inputs to fool the domain net D while preserving the label
    net F's prediction; F trains on a blend of clean and perturbed data
    after warmup."""

    param_groups = ["F", "D", "G"]

    def build_method(self):
        cfg = self.cfg
        node = cfg.TRAINER.DDAIG
        lmda = float(node.LMDA)
        clamp = bool(node.CLAMP)
        clamp_min, clamp_max = float(node.CLAMP_MIN), float(node.CLAMP_MAX)
        warmup = int(node.WARMUP)
        alpha = float(node.ALPHA)
        seed = max(cfg.SEED, 0)
        self.F_net = self.net
        self.D_net = SimpleNet(cfg, cfg.MODEL, self.num_source_domains,
                               seed=seed + 13)
        self.G_net = build_network(node.G_ARCH or "fcn_3x32_gctx",
                                   verbose=cfg.VERBOSE, seed=seed + 29)
        self.params = {"F": self.params["net"], "D": self.D_net.params,
                       "G": self.G_net.params}
        self.model_state = {"F": self.model_state["net"],
                            "D": self.D_net.state,
                            "G": self.G_net.state}
        spe = max(len(self.train_loader_x), 1)
        F_net, D_net, G_net = self.F_net, self.D_net, self.G_net

        def perturb(pg, sg, x):
            # train=True: the reference keeps G in train mode for BOTH the
            # G-update forward and the subsequent no_grad perturbation
            # (set_model_mode("train"); ddaig.py:60-79), so the STN LocNet's
            # BatchNorms normalize with batch stats and their running stats
            # update on each forward — threaded here through state["G"]
            x_p, nsg = G_net.apply_stateful(pg, sg, x, lmda=lmda, train=True)
            if clamp:
                x_p = jnp.clip(x_p, clamp_min, clamp_max)
            return x_p, nsg

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            x, y, d = bx["img"], bx["label"], bx["domain"]
            vx = bx.get("valid")
            epoch = step // spe

            keys = fwd_keys(rng, 5)

            # Update G: minimize label loss, maximize domain loss
            def loss_G(pg):
                x_p, nsg = perturb(pg, state["G"], x)
                lf, _ = F_net.apply(params["F"], state["F"], x_p, True,
                                    rng=keys[0])
                ld, _ = D_net.apply(params["D"], state["D"], x_p, True,
                                    rng=keys[1])
                return (cross_entropy_logits(lf, y, vx)
                        - cross_entropy_logits(ld, d, vx)), nsg

            (loss_g, ns_g), gG = jax.value_and_grad(
                loss_G, has_aux=True)(params["G"])
            new_p, new_os = {}, {}
            new_p["G"], new_os["G"] = self.group_update(
                gG, opt_state["G"], params["G"])

            x_p, ns_g = perturb(new_p["G"], ns_g, x)
            x_p = jax.lax.stop_gradient(x_p)
            ns_g = jax.lax.stop_gradient(ns_g)

            # Update F on clean (+ perturbed after warmup)
            def loss_F(pf):
                l1, ns = F_net.apply(pf, state["F"], x, True, rng=keys[2])
                base = cross_entropy_logits(l1, y, vx)
                l2, ns = F_net.apply(pf, ns, x_p, True, rng=keys[3])
                blended = (1.0 - alpha) * base + alpha * cross_entropy_logits(
                    l2, y, vx)
                loss = jnp.where(epoch + 1 > warmup, blended, base)
                return loss, ns

            (loss_f, ns_f), gF = jax.value_and_grad(
                loss_F, has_aux=True)(params["F"])
            new_p["F"], new_os["F"] = self.group_update(
                gF, opt_state["F"], params["F"])

            # Update D on clean
            def loss_D(pd):
                l1, ns = D_net.apply(pd, state["D"], x, True, rng=keys[4])
                return cross_entropy_logits(l1, d, vx), ns

            (loss_d, ns_d), gD = jax.value_and_grad(
                loss_D, has_aux=True)(params["D"])
            new_p["D"], new_os["D"] = self.group_update(
                gD, opt_state["D"], params["D"])

            state = {"F": ns_f, "D": ns_d, "G": ns_g}
            metrics = {"loss": loss_f, "loss_g": loss_g, "loss_f": loss_f,
                       "loss_d": loss_d}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            logits, _ = F_net.apply(params["F"], state["F"], images, False)
            return logits

        self.infer_core = infer_core


@TRAINER_REGISTRY.register()
class DomainMix(NetTrainerX):
    """DomainMix (dg/domain_mix.py): mixup where each sample's partner is
    drawn from a different domain (crossdomain) or uniformly (random)."""

    def build_method(self):
        node = self.cfg.TRAINER.DOMAINMIX
        mix_type = str(node.TYPE)
        if mix_type not in ("crossdomain", "random"):
            raise NotImplementedError(
                f"Chooses ('random', 'crossdomain'), but got {mix_type}.")
        alpha, beta = float(node.ALPHA), float(node.BETA)
        net_apply = self.net_apply

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            x, y, d = bx["img"], bx["label"], bx["domain"]
            vx = bx.get("valid")
            k_lam, k_perm = jax.random.split(rng)
            lam = (jax.random.beta(k_lam, alpha, beta)
                   if alpha > 0 else jnp.float32(1.0))
            B = x.shape[0]
            if mix_type == "crossdomain":
                other = (d[None, :] != d[:, None]).astype(jnp.float32)
                has_other = other.sum(1, keepdims=True) > 0
                # fall back to uniform when a row has no other-domain partner
                w = jnp.where(has_other, other, jnp.ones_like(other))
                perm = jax.random.categorical(k_perm, jnp.log(w + 1e-9), axis=1)
            else:
                perm = jax.random.permutation(k_perm, B)
            x_mix = lam * x + (1.0 - lam) * x[perm]
            y_a, y_b = y, y[perm]

            (kf,) = fwd_keys(rng, 1)

            def loss_fn(p):
                logits, ns = net_apply(p, state, x_mix, train=True, rng=kf)
                loss = (lam * cross_entropy_logits(logits, y_a, vx)
                        + (1.0 - lam) * cross_entropy_logits(logits, y_b, vx))
                return loss, (logits, ns)

            (loss, (logits, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {"loss": loss, "acc": accuracy(logits, y_a, vx)}
            return params, opt_state, ns, extra, metrics

        self.step_core = step_core


@TRAINER_REGISTRY.register()
class DAELDG(NetTrainerX):
    """Domain-adaptive ensemble learning, DG variant (dg/daeldg.py):
    per-domain experts with cross-expert consistency on the strong view;
    no unlabeled target."""

    param_groups = ["F", "E"]

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.TRAIN_X.SAMPLER == "RandomDomainSampler"
        assert len(cfg.TRAINER.DAELDG.STRONG_TRANSFORMS) > 0

    def build_data_loader(self):
        super().build_data_loader()
        import random as _random

        cfg = self.cfg
        strong_cfg = cfg.clone()
        strong_cfg.defrost()
        strong_cfg.INPUT.TRANSFORMS = list(cfg.TRAINER.DAELDG.STRONG_TRANSFORMS)
        seed = cfg.SEED if cfg.SEED >= 0 else None
        tfm_weak = TrainTransform(cfg, rng=_random.Random(seed or 0))
        tfm_strong = TrainTransform(strong_cfg, rng=_random.Random((seed or 0) + 1))
        data_source = self.dm.dataset.train_x
        bs = cfg.DATALOADER.TRAIN_X.BATCH_SIZE
        wrapper = _WeakStrongWrapper(data_source, tfm_weak, tfm_strong, seed=seed)
        sampler = build_sampler(
            cfg.DATALOADER.TRAIN_X.SAMPLER, data_source, batch_size=bs,
            n_domain=cfg.DATALOADER.TRAIN_X.N_DOMAIN, seed=seed)
        self.train_loader_x = BatchLoader(
            wrapper, sampler, batch_size=bs,
            drop_last=len(data_source) >= bs,
            num_threads=max(1, cfg.DATALOADER.NUM_WORKERS),
            extra_keys=("img2",))

    def build_method(self):
        cfg = self.cfg
        self.use_feature_net()
        n_domain = cfg.DATALOADER.TRAIN_X.N_DOMAIN
        if n_domain <= 0:
            n_domain = self.num_source_domains
        self.split_batch = cfg.DATALOADER.TRAIN_X.BATCH_SIZE // n_domain
        self.n_domain = n_domain
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
            z = jnp.einsum("bf,kfc->bkc", f, E["w"].astype(f.dtype))
            z = z + E["b"].astype(f.dtype)[None]
            return jax.nn.softmax(z.astype(jnp.float32), -1)

        def expert_one(E, dom, f):
            w = jnp.take(E["w"], dom, axis=0)
            b = jnp.take(E["b"], dom, axis=0)
            z = f @ w.astype(f.dtype) + b.astype(f.dtype)
            return jax.nn.softmax(z.astype(jnp.float32), -1)

        def chunks(x):
            return [x[i * split:(i + 1) * split] for i in range(nd)]

        def step_core(params, opt_state, state, extra, bx, bu, rng, step):
            xs, x2s = chunks(bx["img"]), chunks(bx["img2"])
            ys = [create_onehot(yy, n_cls) for yy in chunks(bx["label"])]
            ds = [bx["domain"][i * split] for i in range(nd)]

            keys = fwd_keys(rng, 2 * nd)

            def loss_fn(p):
                loss_x, loss_cr, acc = 0.0, 0.0, 0.0
                ns = state["F"]
                feats, feats2 = [], []
                for ki, xx in enumerate(xs):
                    f, ns = net.apply(p["F"], ns, xx, train=True,
                                      rng=keys[ki])
                    feats.append(f)
                for ki, xx in enumerate(x2s):
                    f, ns = net.apply(p["F"], ns, xx, train=True,
                                      rng=keys[nd + ki])
                    feats2.append(f)
                for f_i, f2_i, y_i, d_i in zip(feats, feats2, ys, ds):
                    pred_i = expert_one(p["E"], d_i, f_i)
                    loss_x += (-y_i * jnp.log(pred_i + 1e-5)).sum(1).mean()
                    expert_label = jax.lax.stop_gradient(pred_i)
                    acc += 100.0 * (pred_i.argmax(1) == y_i.argmax(1)).mean()
                    # averages the other experts PRESENT IN THE BATCH, like
                    # the reference (dg/daeldg.py builds cr_s from the
                    # batch's domains exactly as da/dael.py:131) — see the
                    # DAEL comment in zoo/da.py
                    all_p = experts_all(p["E"], f2_i)
                    one_hot_d = jax.nn.one_hot(
                        jnp.stack([jnp.asarray(dj) for dj in ds]), K).sum(0)
                    w_others = one_hot_d - jax.nn.one_hot(d_i, K)
                    w_others = w_others / jnp.maximum(w_others.sum(), 1.0)
                    cr_pred = jnp.einsum("bkc,k->bc", all_p, w_others)
                    loss_cr += ((cr_pred - expert_label) ** 2).sum(1).mean()
                loss_x, loss_cr = loss_x / nd, loss_cr / nd
                return loss_x + loss_cr, (loss_x, loss_cr, acc / nd, ns)

            (loss, (loss_x, loss_cr, acc, ns)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            new_p, new_os = {}, {}
            for g in ("F", "E"):
                new_p[g], new_os[g] = self.group_update(
                    grads[g], opt_state[g], params[g])
            state = dict(state, F=ns)
            metrics = {"loss": loss, "loss_x": loss_x, "acc": acc,
                       "loss_cr": loss_cr}
            return new_p, new_os, state, extra, metrics

        self.step_core = step_core

        def infer_core(params, state, images):
            f, _ = net.apply(params["F"], state["F"], images, train=False)
            return experts_all(params["E"], f).mean(1)

        self.infer_core = infer_core

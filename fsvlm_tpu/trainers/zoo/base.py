"""Full-network trainer bases for the DA/DG/SSL zoo.

The CLIP prompt trainers optimize a tiny pytree against frozen towers; the
zoo trainers (Dassl.pytorch/dassl/engine/{da,dg,ssl}) instead train whole
CNNs, carry BatchNorm running statistics, and often keep auxiliary state
(EMA teachers, step counters).  The TPU-native contract here:

  step_core(params, opt_state, state, extra, batch_x, batch_u, rng, step)
      -> (params, opt_state, state, extra, metrics)

one pure function per method, jitted once, donated in-place.  ``state`` is
the BN-statistics pytree (threaded, never mutated as module state — the
reference's in-place BN updates on "frozen" nets are a documented bug
class), ``extra`` holds method state (EMA weights, rampup counters),
``step`` is the global iteration as a traced scalar so schedule ramps
(GRL lambda, rampups) compile once.

NetTrainerX runs labeled-only epochs; NetTrainerXU zips train_x/train_u
cyclically with the reference's TRAIN.COUNT_ITER semantics
(dassl/engine/trainer.py:560-610).
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...engine.trainer import SimpleTrainer
from ...models.simple_net import SimpleNet
from ...parallel.mesh import replicate, shard_batch
from ...utils import AverageMeter, MetricMeter


def cross_entropy_logits(logits, labels, valid=None):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if valid is None:
        return nll.mean()
    w = valid.astype(nll.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def masked_mean(x, valid):
    if valid is None:
        return x.mean()
    w = valid.astype(x.dtype)
    return (x * w).sum() / jnp.maximum(w.sum(), 1.0)


def masked_row_mean(x, valid):
    """Mean over batch rows of a per-row reduction: non-batch axes are
    averaged unconditionally, rows are weighted by ``valid`` (mesh-padding
    mask, shard_batch).  Equals ``x.mean()`` when valid is None/all-ones."""
    flat = x.reshape(x.shape[0], -1).mean(1)
    return masked_mean(flat, valid)


def masked_pair_mean(x, valid):
    """Mean of a pairwise (B, B) matrix where both rows must be valid."""
    if valid is None:
        return x.mean()
    w = valid.astype(x.dtype)
    ww = w[:, None] * w[None, :]
    return (x * ww).sum() / jnp.maximum(ww.sum(), 1.0)


def masked_moments(f, valid, ddof=0):
    """Row-masked per-feature mean and variance of ``f`` (B, D)."""
    if valid is None:
        return f.mean(0), f.var(0, ddof=ddof)
    w = valid.astype(f.dtype)[:, None]
    n = jnp.maximum(w.sum(), 1.0)
    mu = (f * w).sum(0) / n
    var = ((f - mu) ** 2 * w).sum(0) / jnp.maximum(n - ddof, 1.0)
    return mu, var


def accuracy(logits, labels, valid=None):
    correct = (logits.argmax(-1) == labels).astype(jnp.float32)
    return 100.0 * masked_mean(correct, valid)


class NetTrainerX(SimpleTrainer):
    """Labeled-only zoo base (TrainerX equivalent).

    Multi-model methods (MCD's F/C1/C2, DANN's net/critic, ...) set
    ``self.param_groups`` to the top-level keys of ``self.params``; each
    group then gets its own optimizer state (the reference registers one
    torch optimizer per model, dassl trainer.py:86-116) and ``step_core``
    updates groups independently via ``self.group_update``.
    """

    model_name = "model"
    param_groups = None  # subclass: list of top-level param keys, or None
    _tx_group = {}  # group -> tx override (multi-update-per-step schedules)

    def __init__(self, cfg):
        # The device-fused augmentation pipeline (DATALOADER.DEVICE_AUG)
        # swaps every train loader to raw-uint8 batches and relies on the
        # trainer to fuse crop/flip/normalize into its step
        # (engine/trainer.py SimpleTrainer._compile_steps).  The zoo steps
        # consume host-transformed pixels (K_TRANSFORMS views, strong/weak
        # FixMatch pipelines, RETURN_IMG0) that the device pipeline does not
        # model — fail loudly instead of training on un-normalized uint8.
        if cfg.DATALOADER.DEVICE_AUG:
            raise ValueError(
                "DATALOADER.DEVICE_AUG is only supported by the CLIP prompt "
                "trainers; the DA/DG/SSL zoo trainers require the host "
                "transform pipeline (multi-view / strong-weak augmentations)"
            )
        super().__init__(cfg)

    def build_model(self):
        cfg = self.cfg
        self.net = SimpleNet(cfg, cfg.MODEL, self.num_classes, seed=max(cfg.SEED, 0))
        self.params = {"net": self.net.params}
        self.model_state = {"net": self.net.state}
        self.extra = {}
        self.frozen = {}
        self.build_method()
        if not hasattr(self, "infer_core"):
            net = self.net

            def infer_core(params, state, images):
                logits, _ = net.apply(params["net"], state["net"], images, train=False)
                return logits

            self.infer_core = infer_core

    def build_method(self):
        """Subclass hook: extend params/state/extra and set self.step_core."""
        raise NotImplementedError

    def use_feature_net(self):
        """Replace the default classifier-carrying net with a pure feature
        extractor (the reference's SimpleNet(cfg, MODEL, 0) used by MCD,
        MME, M3SDA, CDAC, DAEL which own their classifier heads)."""
        cfg = self.cfg
        self.net = SimpleNet(cfg, cfg.MODEL, 0, seed=max(cfg.SEED, 0))
        self.params = {"net": self.net.params}
        self.model_state = {"net": self.net.state}

    def net_apply(self, params, state, x, train, rng=None):
        """Apply the main net inside step_core (returns logits, new net state)."""
        kw = {"rng": rng} if rng is not None else {}
        logits, ns = self.net.apply(params["net"], state["net"], x,
                                    train=train, **kw)
        return logits, dict(state, net=ns)

    def finalize_method(self):
        """Hook that runs after MODEL.INIT_WEIGHTS is applied but before the
        step compiles — for methods that snapshot the (possibly loaded)
        initial params (ADDA's frozen source model, AdaBN's stat reset)."""

    def _build_optimizer(self):
        from ...engine.optim import build_optimizer

        self.steps_per_epoch = max(
            self._num_batches() if hasattr(self, "_num_batches")
            else len(self.train_loader_x), 1)
        self.tx, self.lr_schedule = build_optimizer(self.cfg, self.steps_per_epoch)
        self._tx_group = {}
        if self.param_groups is None:
            self.opt_state = self.tx.init(self.params)
        else:
            # one optimizer state per model group (the reference registers a
            # torch optimizer per model, dassl trainer.py:86-116).  Groups
            # that are stepped k>1 times per trainer iteration (MCD's 3-phase
            # F, MME's two backwards, ...) get a schedule that divides the
            # optax update count by k: the reference advances its LR
            # schedulers once per iteration/epoch (dassl trainer.py:214-230),
            # so every intra-iteration update must see the SAME staircase LR.
            ups = self.group_updates_per_step()
            for g in self.param_groups:
                k = int(ups.get(g, 1))
                if k > 1:
                    sched = self.lr_schedule
                    self._tx_group[g], _ = build_optimizer(
                        self.cfg, self.steps_per_epoch,
                        schedule_override=(
                            lambda c, _s=sched, _k=k: _s(c // _k)))
            self.opt_state = {
                g: self._tx_group.get(g, self.tx).init(self.params[g])
                for g in self.param_groups
            }
        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        print(f"# params to be updated: {n_params:,}")

    def group_updates_per_step(self):
        """Optimizer updates per trainer iteration for each param group.
        Subclasses with multiple backward+step phases per iteration
        (da/mcd.py, da/mme.py, da/m3sda.py) override this so their LR
        schedule does not advance k times per iteration."""
        return {}

    def group_update(self, grads_g, opt_state_g, params_g, group=None):
        """One optimizer step for a single param group (inside step_core)."""
        import optax

        tx = self._tx_group.get(group, self.tx)
        updates, new_os = tx.update(grads_g, opt_state_g, params_g)
        return optax.apply_updates(params_g, updates), new_os

    # ------------------------------------------------------------------ jit
    def _compile_steps(self):
        self.finalize_method()
        self.params = replicate(self.params, self.mesh)
        self.model_state = replicate(self.model_state, self.mesh)
        self.extra = replicate(self.extra, self.mesh)
        self.frozen = replicate(self.frozen, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)

        step_core = self.step_core

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def train_step(params, opt_state, state, extra, bx, bu, rng, step):
            return step_core(params, opt_state, state, extra, bx, bu, rng, step)

        infer_core = self.infer_core

        @jax.jit
        def eval_step(params, state, images):
            return infer_core(params, state, images)

        self._train_step_xu = train_step
        self._eval_step = eval_step
        self._text_step = self._eval_with_txf = None
        self._train_step_resident = None
        self._train_epoch_resident = None  # no fused/resident path for zoo nets
        self._device_cache = None

    def model_inference(self, images):
        return self._eval_step(self.params, self.model_state, images)

    def _global_step(self, batch_idx):
        return np.asarray(self.epoch * self.steps_per_epoch + batch_idx, np.int32)

    def forward_backward_device(self, device_batch, step_key=None):
        if step_key is None:
            self.rng_key, step_key = jax.random.split(self.rng_key)
        (self.params, self.opt_state, self.model_state, self.extra,
         metrics) = self._train_step_xu(
            self.params, self.opt_state, self.model_state, self.extra,
            device_batch, None, step_key, self._global_step(self.batch_idx),
        )
        return metrics

    # -------------------------------------------------------------- ckpt
    def extra_state(self):
        s = super().extra_state()
        s["model_state"] = jax.tree.map(np.asarray, self.model_state)
        s["method_extra"] = jax.tree.map(np.asarray, self.extra)
        return s

    def load_extra_state(self, state):
        super().load_extra_state(state)
        if state.get("model_state") is not None:
            self.model_state = replicate(
                jax.tree.map(jnp.asarray, state["model_state"]), self.mesh
            )
        if state.get("method_extra") is not None:
            self.extra = replicate(
                jax.tree.map(jnp.asarray, state["method_extra"]), self.mesh
            )


class NetTrainerXU(NetTrainerX):
    """Labeled + unlabeled zoo base (TrainerXU equivalent)."""

    def _num_batches(self):
        cfg = self.cfg
        len_x = len(self.train_loader_x)
        len_u = len(self.train_loader_u) if self.train_loader_u else len_x
        count = cfg.TRAIN.COUNT_ITER
        if count == "train_x":
            return len_x
        if count == "train_u":
            return len_u
        if count == "smaller_one":
            return min(len_x, len_u)
        raise ValueError(count)

    def run_epoch(self):
        losses = MetricMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        num_batches = self._num_batches()
        pending = []

        def cycle(loader):
            while True:
                for b in loader:
                    yield b

        it_x = cycle(self.train_loader_x)
        it_u = cycle(self.train_loader_u or self.train_loader_x)

        epoch_key = self._epoch_key()
        end = time.time()
        try:
            for batch_idx in range(num_batches):
                bx = shard_batch(next(it_x), self.mesh)
                bu = shard_batch(next(it_u), self.mesh)
                data_time.update(time.time() - end)
                self.batch_idx = batch_idx
                step_key = jax.random.fold_in(epoch_key, batch_idx)
                (self.params, self.opt_state, self.model_state, self.extra,
                 metrics) = self._train_step_xu(
                    self.params, self.opt_state, self.model_state, self.extra,
                    bx, bu, step_key, self._global_step(batch_idx),
                )
                pending.append((batch_idx, metrics))
                batch_time.update(time.time() - end)

                if (batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0 or (
                    batch_idx + 1 == num_batches
                ):
                    for bi, m in pending:
                        host = {k: float(v) for k, v in m.items()}
                        self._record_metrics(losses, host, bi, num_batches)
                    pending.clear()
                    self._emit_train_line(losses, batch_time, data_time,
                                          batch_idx, num_batches)
                end = time.time()
        finally:
            # close the abandoned mid-pass iterators deterministically so
            # each BatchLoader producer thread terminates now (its __iter__
            # finally unblocks on close) instead of leaking a blocked thread
            # + prefetched batches every epoch
            it_x.close()
            it_u.close()

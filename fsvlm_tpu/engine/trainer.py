"""Trainer engine.

Capability parity with dassl/engine/trainer.py (TrainerBase/SimpleTrainer/
TrainerX, :77-650) re-designed around a functional JAX core:

- a method trainer contributes pure functions — ``loss_fn(params, frozen,
  batch, rng) -> (loss, metrics)`` and ``logits_fn(params, frozen, images)``
  — plus the trainable ``params`` pytree and a device-resident ``frozen``
  pytree (CLIP towers, token embeddings, precomputed teacher features).
- the engine jits ONE SPMD train step over a 1-D data mesh (params
  replicated, batch sharded; XLA inserts the gradient psums over ICI) and
  one eval step; the same compiled step serves every epoch.
- frozen towers never enter the grad computation: backprop touches only the
  prompt pytree, which is the main TPU win vs the reference's
  requires_grad_(False) bookkeeping (SURVEY.md §7.1).

Lifecycle, checkpoint layout, meters/ETA printing, best-val selection, and
log formats mirror the reference so downstream tooling (parse_test_res)
works unchanged.
"""

import copy
import datetime
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import DataManager
from ..parallel.mesh import data_sharded, get_mesh, replicate, shard_batch
from ..utils import AverageMeter, MetricMeter, mkdir_if_missing
from ..utils.registry import Registry
from .checkpoint import load_checkpoint, resume_from_checkpoint, save_checkpoint
from .evaluator import build_evaluator
from .optim import build_optimizer
from .tb import TensorboardWriter

TRAINER_REGISTRY = Registry("TRAINER")


def build_trainer(cfg):
    return TRAINER_REGISTRY.get(cfg.TRAINER.NAME)(cfg)


class SimpleTrainer:
    """Generic epoch-driven trainer around a functional method core."""

    def __init__(self, cfg):
        self.check_cfg(cfg)
        self.cfg = cfg
        self.start_epoch = self.epoch = 0
        self.max_epoch = cfg.OPTIM.MAX_EPOCH
        self.output_dir = cfg.OUTPUT_DIR
        self.best_result = -np.inf

        self.mesh = get_mesh()
        self.rng_key = jax.random.PRNGKey(max(cfg.SEED, 0))

        self.build_data_loader()
        # method contract: must set self.params, self.frozen, self.loss_fn,
        # self.logits_fn, self.model_name
        self.build_model()
        if cfg.MODEL.INIT_WEIGHTS:
            # load_pretrained_weights parity (dassl torchtools.py:267-314):
            # initialize the trainable pytree from a checkpoint file
            ckpt = load_checkpoint(cfg.MODEL.INIT_WEIGHTS)
            self.params = self._coerce_params(ckpt["state_dict"])
            print(f'Initialized params from "{cfg.MODEL.INIT_WEIGHTS}"')
        self.evaluator = build_evaluator(cfg, lab2cname=self.lab2cname)

        self._build_optimizer()
        self._compile_steps()
        self._writer = None

    # ------------------------------------------------------------------ setup
    def check_cfg(self, cfg):
        pass

    def build_data_loader(self):
        dm = DataManager(self.cfg)
        self.dm = dm
        self.train_loader_x = dm.train_loader_x
        self.train_loader_u = dm.train_loader_u
        self.val_loader = dm.val_loader
        self.test_loader = dm.test_loader
        self.num_classes = dm.num_classes
        self.num_source_domains = dm.num_source_domains
        self.lab2cname = dm.lab2cname

    def build_model(self):
        raise NotImplementedError

    def _build_optimizer(self):
        steps_per_epoch = len(self.train_loader_x) if self.train_loader_x else 1
        self.steps_per_epoch = steps_per_epoch
        self.tx, self.lr_schedule = build_optimizer(self.cfg, steps_per_epoch)
        self.opt_state = self.tx.init(self.params)
        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        print(f"# params to be updated: {n_params:,}")

    # ------------------------------------------------------------- jit steps
    def _compile_steps(self):
        self.params = replicate(self.params, self.mesh)
        self.frozen = replicate(self.frozen, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)

        loss_fn = self.loss_fn
        if self.cfg.DATALOADER.DEVICE_AUG:
            # fuse random-resized-crop/flip/normalize into the train step
            from ..ops.preprocess import random_resized_crop_flip_normalize

            inner = loss_fn
            out_size = self.cfg.INPUT.SIZE[0]
            scale = tuple(self.cfg.INPUT.RRCROP_SCALE)
            mean = jnp.asarray(self.cfg.INPUT.PIXEL_MEAN, jnp.float32)
            std = jnp.asarray(self.cfg.INPUT.PIXEL_STD, jnp.float32)

            def loss_fn(params, frozen, batch, rng):
                k_aug, k_rest = jax.random.split(rng)
                imgs = random_resized_crop_flip_normalize(
                    batch["img"], k_aug, out_size=out_size, scale=scale,
                    mean=mean, std=std,
                )
                batch = dict(batch, img=imgs)
                return inner(params, frozen, batch, k_rest)

        tx = self.tx

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, frozen, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, frozen, batch, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return params, opt_state, metrics

        logits_fn = self.logits_fn

        # multi-host: every host must be able to fetch eval logits, so jit
        # eval outputs as fully replicated (single-host: unconstrained)
        if jax.process_count() > 1:
            from ..parallel.mesh import replicated

            eval_jit = partial(jax.jit, out_shardings=replicated(self.mesh))
        else:
            eval_jit = jax.jit

        @eval_jit
        def eval_step(params, frozen, images):
            return logits_fn(params, frozen, images)

        # device-resident variant: the batch carries only indices; images
        # are gathered from the HBM-resident uint8 cache inside the step
        # (cache is an ARGUMENT, never a closure — a closed-over array would
        # become an HLO constant).  The gather output is pinned to the data
        # sharding so each device reads only its own batch rows from the
        # replicated cache.
        ds_sharding = data_sharded(self.mesh)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step_resident(params, opt_state, frozen, cache, batch, rng):
            imgs = jax.lax.with_sharding_constraint(
                jnp.take(cache, batch["index"], axis=0), ds_sharding
            )
            batch = dict(batch, img=imgs)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, frozen, batch, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return params, opt_state, metrics

        # epoch-fused variant: the whole epoch is ONE dispatch (lax.scan
        # over the step), fed by an on-device index schedule — on a remote
        # TPU relay this removes every per-step round-trip; on direct
        # hardware it removes per-step dispatch overhead.  Per-step rng is
        # fold_in(epoch_key, step) so fused/unfused trajectories are
        # identical.
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_epoch_resident(params, opt_state, frozen, cache, sched, epoch_key):
            def body(carry, xs):
                params, opt_state = carry
                batch, step_idx = xs
                rng = jax.random.fold_in(epoch_key, step_idx)
                imgs = jax.lax.with_sharding_constraint(
                    jnp.take(cache, batch["index"], axis=0), ds_sharding
                )
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, frozen, dict(batch, img=imgs), rng
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics = dict(metrics)
                metrics["loss"] = loss
                return (params, opt_state), metrics

            steps = sched["index"].shape[0]
            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state), (sched, jnp.arange(steps))
            )
            return params, opt_state, metrics

        # device-built epoch schedule (TRAIN.DEVICE_SCHEDULE): permute a
        # resident index buffer with the epoch key and gather labels/domains
        # from resident metadata — the fused epoch then needs NO per-epoch
        # host work or H2D beyond one PRNG key (the host path stacks and
        # re-ships the schedule every epoch).  steps/B/Bp are static.
        from jax.sharding import NamedSharding, PartitionSpec as P

        sched_sharding = NamedSharding(self.mesh, P(None, "data"))

        @partial(
            jax.jit,
            static_argnums=(2, 3, 4, 5, 6),
            out_shardings=sched_sharding,
        )
        def build_schedule(meta, key, n_items, steps, B, Bp, shuffle):
            perm = (
                jax.random.permutation(key, n_items)
                if shuffle
                else jnp.arange(n_items)
            ).astype(jnp.int32)
            total = steps * B
            if total > n_items:
                # pad like the host path: repeat the last real element
                perm = jnp.concatenate(
                    [perm, jnp.broadcast_to(perm[-1], (total - n_items,))]
                )
            index = perm[:total].reshape(steps, B)
            valid = (jnp.arange(total) < n_items).reshape(steps, B)
            if Bp > B:  # mesh-size padding, False-masked
                index = jnp.concatenate(
                    [index, jnp.broadcast_to(index[:, -1:], (steps, Bp - B))], 1
                )
                valid = jnp.concatenate(
                    [valid, jnp.zeros((steps, Bp - B), bool)], 1
                )
            return {
                "index": index,
                "label": jnp.take(meta["label"], index, axis=0),
                "domain": jnp.take(meta["domain"], index, axis=0),
                "valid": valid,
            }

        self._build_schedule = build_schedule
        self._resident_meta = None
        self._train_step = train_step
        self._train_step_resident = train_step_resident
        self._train_epoch_resident = train_epoch_resident
        self._device_cache = None
        self._eval_step = eval_step

        # optional split eval: encode the class-prompt text features ONCE per
        # test() call instead of once per batch (the reference re-runs the
        # text tower on every eval batch) — a large win at eval time for
        # big class counts.  Trainers opt in by setting text_features_fn +
        # image_logits_fn.
        self._text_step = self._eval_with_txf = None
        if getattr(self, "text_features_fn", None) is not None:
            self._text_step = eval_jit(self.text_features_fn)
            self._eval_with_txf = eval_jit(self.image_logits_fn)

    # ------------------------------------------------------------------ train
    def train(self, start_epoch=None, max_epoch=None):
        self.start_epoch = start_epoch if start_epoch is not None else self.start_epoch
        self.max_epoch = max_epoch if max_epoch is not None else self.max_epoch
        self.before_train()
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch()
            self.after_epoch()
        return self.after_train()

    def before_train(self):
        if self.cfg.RESUME:
            self.resume_model_if_exist(self.cfg.RESUME)
        else:
            self.resume_model_if_exist(self.output_dir)
        mkdir_if_missing(self.output_dir)
        self._writer = (
            TensorboardWriter(os.path.join(self.output_dir, "tensorboard"))
            if jax.process_index() == 0
            else None
        )
        self.time_start = time.time()
        # observability extension: FSVLM_PROFILE_DIR captures a jax profiler
        # trace of the whole run (view with tensorboard/xprof); the
        # reference's only tracing is wall-clock meters (SURVEY.md §5.1)
        profile_dir = os.environ.get("FSVLM_PROFILE_DIR")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
            self._profiling = True
        else:
            self._profiling = False

    def before_epoch(self):
        pass

    def _maybe_device_cache(self):
        """Build (once) the HBM-resident uint8 train cache when eligible.

        Eligible: DEVICE_RESIDENT auto/on, the train loader is the raw-uint8
        device-aug pipeline, and the full set fits the MB budget (a 16-shot
        x 1000-class set at 256^2 is ~3 GB... at 100 classes ~300 MB).  The
        reference has no equivalent (torch DataLoader re-ships every batch,
        Dassl data_manager.py:202-275); this makes per-step H2D a few
        hundred bytes of indices, which matters on any deployment where
        host->device bandwidth is the bottleneck."""
        mode = str(self.cfg.DATALOADER.DEVICE_RESIDENT).lower()
        if mode in ("false", "off", "0", "no"):
            return None
        if getattr(self, "_train_step_resident", None) is None:
            # trainer family without an index-gather step (the zoo bases set
            # _train_step_resident = None): never build the cache, else
            # run_epoch would feed index-only batches to a step that expects
            # pixels
            return None
        if self._device_cache is not None:
            return self._device_cache
        wrapper = getattr(self.train_loader_x, "wrapper", None)
        forced = mode in ("true", "on", "1", "yes")
        if not getattr(wrapper, "raw_uint8", False):
            if forced:
                raise ValueError(
                    "DATALOADER.DEVICE_RESIDENT=on requires the device-aug "
                    "raw-uint8 train pipeline (DATALOADER.DEVICE_AUG=True)"
                )
            return None
        n = len(wrapper)
        nbytes = n * wrapper.pre_size * wrapper.pre_size * 3
        budget = int(self.cfg.DATALOADER.DEVICE_RESIDENT_BUDGET_MB) << 20
        if nbytes > budget and not forced:
            print(
                f"* device-resident train set disabled: {nbytes >> 20} MB "
                f"> budget {self.cfg.DATALOADER.DEVICE_RESIDENT_BUDGET_MB} MB"
            )
            self.cfg.defrost()
            self.cfg.DATALOADER.DEVICE_RESIDENT = "off"
            self.cfg.freeze()
            return None
        imgs = wrapper.materialize(
            num_threads=max(1, self.cfg.DATALOADER.NUM_WORKERS)
        )
        from ..parallel.mesh import replicated

        self._device_cache = jax.device_put(imgs, replicated(self.mesh))
        # resident per-item metadata for the device-built epoch schedule
        data = wrapper.data_source
        self._resident_meta = {
            "label": jax.device_put(
                np.asarray([it.label for it in data], np.int32),
                replicated(self.mesh),
            ),
            "domain": jax.device_put(
                np.asarray([it.domain for it in data], np.int32),
                replicated(self.mesh),
            ),
        }
        print(
            f"* device-resident train set: {n} images x {wrapper.pre_size}^2 "
            f"({nbytes >> 20} MB) in HBM; per-step H2D is indices only"
        )
        return self._device_cache

    def _maybe_device_schedule(self, num_batches):
        """Build this epoch's index schedule ON DEVICE when eligible
        (TRAIN.DEVICE_SCHEDULE on, resident metadata present, and a plain
        Random/Sequential sampler).  Removes the last per-epoch host work
        from the fused path: the permutation comes from the epoch PRNG key,
        so the only H2D is one key.

        Documented divergence: the shuffle is a jax PRNG permutation
        (reproducible from cfg.SEED + epoch), not the host python-random
        order — both are uniform shuffles of the same few-shot set; the
        default 'off' keeps the host path byte-identical to the per-step
        pipeline (tests compare those trajectories)."""
        mode = str(self.cfg.TRAIN.get("DEVICE_SCHEDULE", False)).lower()
        if mode in ("off", "false", "0", "no", ""):
            return None
        if self._resident_meta is None:
            return None
        from ..data.samplers import RandomSampler, SequentialSampler

        sampler = getattr(self.train_loader_x, "sampler", None)
        if not isinstance(sampler, (RandomSampler, SequentialSampler)):
            print(
                "* TRAIN.DEVICE_SCHEDULE: unsupported sampler "
                f"{type(sampler).__name__}; falling back to host schedule"
            )
            return None
        loader = self.train_loader_x
        n_items = len(loader.wrapper)
        B = loader.batch_size
        Bp = B + (-B) % self.mesh.devices.size
        key = jax.random.fold_in(self._epoch_key(), 1 << 20)
        return self._build_schedule(
            self._resident_meta, key, n_items, num_batches, B, Bp,
            isinstance(sampler, RandomSampler),
        )

    def _epoch_key(self):
        """Per-epoch PRNG base: fold_in(rng_key, epoch).  Per-step keys are
        fold_in(epoch_key, batch_idx) — identical derivation on the host
        per-step path and inside the fused epoch scan, and reproducible
        across resume (rng state is a pure function of the epoch)."""
        return jax.random.fold_in(self.rng_key, self.epoch)

    def _emit_train_line(self, losses, batch_time, data_time, batch_idx, num_batches):
        nb_remain = (num_batches - batch_idx - 1) + (
            self.max_epoch - self.epoch - 1
        ) * num_batches
        eta = str(datetime.timedelta(seconds=int(batch_time.avg * nb_remain)))
        print(
            f"epoch [{self.epoch + 1}/{self.max_epoch}]"
            f"[{batch_idx + 1}/{num_batches}]\t"
            f"time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
            f"data {data_time.val:.3f} ({data_time.avg:.3f})\t"
            f"{losses}\t"
            f"lr {self.get_current_lr():.4e}\t"
            f"eta {eta}"
        )

    def _record_metrics(self, losses, host, batch_idx, num_batches):
        if not np.isfinite(host["loss"]):
            raise FloatingPointError(f"Loss is infinite or NaN: {host}")
        losses.update(host)
        if self._writer:
            n_iter = self.epoch * num_batches + batch_idx
            for name, meter in losses.meters.items():
                self._writer.scalar(f"train/{name}", meter.avg, n_iter)
            self._writer.scalar("train/lr", self.get_current_lr(), n_iter)

    def run_epoch(self):
        losses = MetricMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        num_batches = len(self.train_loader_x)
        pending = []  # (batch_idx, device metrics) fetched at print frequency
        cache = self._maybe_device_cache()

        fuse_mode = str(self.cfg.TRAIN.get("EPOCH_FUSE", "auto")).lower()
        if (
            cache is not None
            and num_batches > 0
            and fuse_mode not in ("off", "false", "0", "no")
            # a trainer may veto auto-fusion when its per-step cost makes a
            # whole-epoch device program unsurvivable (e.g. CoCoOp past the
            # batched-text limit); an explicit EPOCH_FUSE="on" overrides
            and not (
                fuse_mode == "auto"
                and getattr(self, "_epoch_fuse_auto_off", False)
            )
            and jax.process_count() == 1
            and getattr(self, "_train_epoch_resident", None) is not None
        ):
            return self._run_epoch_fused(
                cache, losses, batch_time, data_time, num_batches
            )

        def device_batches():
            """H2D one batch ahead so the transfer overlaps the previous
            step's compute."""
            ahead = None
            source = (
                self.train_loader_x.iter_index_batches()
                if cache is not None
                else self.train_loader_x
            )
            for batch in source:
                cur = self.parse_batch_train(batch)
                if ahead is not None:
                    yield ahead
                ahead = cur
            if ahead is not None:
                yield ahead

        epoch_key = self._epoch_key()
        end = time.time()
        for batch_idx, device_batch in enumerate(device_batches()):
            data_time.update(time.time() - end)
            self.batch_idx = batch_idx
            step_key = jax.random.fold_in(epoch_key, batch_idx)
            metrics = self.forward_backward_device(device_batch, step_key)
            pending.append((batch_idx, metrics))
            batch_time.update(time.time() - end)

            meet_freq = (batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0
            if meet_freq or batch_idx + 1 == num_batches:
                # fetch the on-device metric scalars only now (one sync)
                for bi, m in pending:
                    host = {k: float(v) for k, v in m.items()}
                    self._record_metrics(losses, host, bi, num_batches)
                pending.clear()
                self._emit_train_line(
                    losses, batch_time, data_time, batch_idx, num_batches
                )
            end = time.time()

    def _run_epoch_fused(self, cache, losses, batch_time, data_time, num_batches):
        """One dispatch per epoch: stack the index schedule, scan on device,
        reconstruct the standard per-batch log lines from the stacked
        metrics afterwards.

        Logging semantics vs the per-step path: the LR lines/TB series are
        identical (the schedule is a per-EPOCH staircase — optim.py
        lr_at_epoch — so every step of this epoch shares one LR and
        ``get_current_lr()`` reads it from the unchanged ``self.epoch``);
        the NaN-loss FloatingPointError is necessarily DEFERRED to the end
        of the epoch dispatch — the whole epoch runs on device before any
        metric is host-visible, so a NaN at step k is raised after the
        remaining steps executed (the per-step path raises at the next
        PRINT_FREQ fetch)."""
        t0 = time.time()
        sched = self._maybe_device_schedule(num_batches)
        if sched is None:
            batches = list(self.train_loader_x.iter_index_batches())
            # Class/domain samplers report a construction-time __len__ that
            # can differ from the batches an epoch actually yields (the
            # reference's samplers have the same quirk, dassl
            # samplers.py:37,92,148 — torch's loop just follows the
            # iterator).  The fused scan must follow the real schedule.
            if len(batches) != num_batches:
                num_batches = len(batches)
            keys = ("label", "domain", "index", "valid")
            sched_np = {k: np.stack([b[k] for b in batches]) for k in keys}
            # pad the batch axis to the mesh size exactly like shard_batch
            n = self.mesh.devices.size
            B = sched_np["index"].shape[1]
            pad = (-B) % n
            if pad:
                for k in keys:
                    x = sched_np[k]
                    fill = (
                        np.zeros((x.shape[0], pad) + x.shape[2:], dtype=x.dtype)
                        if k == "valid"
                        else np.repeat(x[:, -1:], pad, axis=1)
                    )
                    sched_np[k] = np.concatenate([x, fill], axis=1)
            from jax.sharding import NamedSharding, PartitionSpec as P

            sched_sharding = NamedSharding(self.mesh, P(None, "data"))
            sched = {k: jax.device_put(v, sched_sharding) for k, v in sched_np.items()}
        data_time.update(time.time() - t0)

        self.params, self.opt_state, metrics = self._train_epoch_resident(
            self.params, self.opt_state, self.frozen, cache, sched,
            self._epoch_key(),
        )
        host_metrics = {k: np.asarray(v) for k, v in metrics.items()}  # sync
        dt = time.time() - t0
        per_step = max(dt - data_time.val, 0.0) / num_batches

        for bi in range(num_batches):
            self.batch_idx = bi
            batch_time.update(per_step + (data_time.val if bi == 0 else 0.0))
            host = {k: float(v[bi]) for k, v in host_metrics.items()}
            self._record_metrics(losses, host, bi, num_batches)
            if (bi + 1) % self.cfg.TRAIN.PRINT_FREQ == 0 or bi + 1 == num_batches:
                self._emit_train_line(losses, batch_time, data_time, bi, num_batches)

    def forward_backward(self, batch):
        return self.forward_backward_device(self.parse_batch_train(batch))

    def forward_backward_device(self, device_batch, step_key=None):
        if step_key is None:  # direct callers outside run_epoch
            self.rng_key, step_key = jax.random.split(self.rng_key)
        if "img" not in device_batch:  # index-only batch -> resident gather
            self.params, self.opt_state, metrics = self._train_step_resident(
                self.params, self.opt_state, self.frozen, self._device_cache,
                device_batch, step_key,
            )
        else:
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.opt_state, self.frozen, device_batch, step_key
            )
        return metrics

    def parse_batch_train(self, batch):
        return shard_batch(batch, self.mesh)

    def after_epoch(self):
        last_epoch = (self.epoch + 1) == self.max_epoch
        do_test = not self.cfg.TEST.NO_TEST
        meet_freq = (
            (self.epoch + 1) % self.cfg.TRAIN.CHECKPOINT_FREQ == 0
            if self.cfg.TRAIN.CHECKPOINT_FREQ > 0
            else False
        )

        if do_test and self.cfg.TEST.FINAL_MODEL == "best_val" and self.val_loader:
            curr_result = self.test(split="val")
            is_best = curr_result > self.best_result
            if is_best:
                self.best_result = curr_result
                self.save_model(self.epoch, self.output_dir, val_result=curr_result,
                                model_name="model-best.pkl")
        if meet_freq or last_epoch:
            self.save_model(self.epoch, self.output_dir)

    def after_train(self):
        print("Finish training")
        if getattr(self, "_profiling", False):
            jax.profiler.stop_trace()
            self._profiling = False
        result = None
        if not self.cfg.TEST.NO_TEST:
            if self.cfg.TEST.FINAL_MODEL == "best_val":
                print("Deploy the model with the best val performance")
                self.load_model(self.output_dir)
            result = self.test()
        elapsed = round(time.time() - self.time_start)
        print(f"Elapsed: {datetime.timedelta(seconds=elapsed)}")
        if self._writer is not None:
            self._writer.close()
        return result

    # ------------------------------------------------------------------- test
    def _get_frozen_eval(self):
        """Frozen pytree for eval/serving.  Under MODEL.QUANT_INT8 the frozen
        CLIP visual tower is swapped for its int8 copy (ops/quant.py) — a
        serving-precision choice only; training always sees the fp tower.
        Built lazily on first eval so every CLIP-path trainer (zero-shot or
        trained prompts) serves int8 uniformly; trainers without a frozen
        CLIP (the DA/DG/SSL zoo) are untouched."""
        if getattr(self, "_frozen_eval", None) is not None:
            return self._frozen_eval
        fe = self.frozen
        if getattr(self.cfg.MODEL, "QUANT_INT8", False) and isinstance(fe, dict):
            clip = fe.get("clip")
            if (isinstance(clip, dict) and isinstance(clip.get("visual"), dict)
                    and "blocks" in clip["visual"]):
                from ..ops.quant import quantize_clip_params

                families = tuple(
                    getattr(self.cfg.MODEL, "QUANT_INT8_FAMILIES", None)
                    or ("attn", "mlp"))
                static_amax = None
                if getattr(self.cfg.MODEL, "QUANT_INT8_STATIC", False):
                    from ..ops.quant import calibrate_visual_amax

                    n_cal = int(getattr(
                        self.cfg.MODEL, "QUANT_INT8_CALIB_BATCHES", 4))
                    loader = self.test_loader or self.train_loader_x

                    def _cal_batches():
                        for i, batch in enumerate(loader):
                            if i >= n_cal:
                                break
                            yield self.parse_batch_test(batch)["img"]

                    static_amax = {"visual": calibrate_visual_amax(
                        clip, self.clip_cfg, _cal_batches())}
                print(f"[eval] int8 image tower (MODEL.QUANT_INT8, "
                      f"families={','.join(families)}, "
                      f"act={'static' if static_amax else 'dynamic'})")
                fe = dict(fe, clip=quantize_clip_params(
                    clip, towers=("visual",), families=families,
                    static_amax=static_amax))
        self._frozen_eval = fe
        return fe

    def model_inference(self, images):
        return self._eval_step(self.params, self._get_frozen_eval(), images)

    def parse_batch_test(self, batch):
        return shard_batch(batch, self.mesh)

    def test(self, split=None, return_pred=False):
        self.evaluator.reset()
        cfg = self.cfg
        split = split or cfg.TEST.SPLIT
        if split == "val" and self.val_loader is not None:
            data_loader = self.val_loader
        else:
            split = "test"
            data_loader = self.test_loader
        print(f"Evaluate on the *{split}* set")

        cached_txf = None
        if self._text_step is not None:
            cached_txf = self._text_step(self.params, self.frozen)

        for batch in data_loader:
            device_batch = self.parse_batch_test(batch)
            # host-side mask/labels: shard_batch may pad to the mesh size
            # (and under multi-host the device batch is not host-addressable)
            valid = np.asarray(batch["valid"])
            labels = np.asarray(batch["label"])
            if cached_txf is not None:
                logits = np.asarray(
                    self._eval_with_txf(
                        self.params, self._get_frozen_eval(),
                        device_batch["img"], cached_txf
                    )
                )
            else:
                logits = np.asarray(self.model_inference(device_batch["img"]))
            logits = logits[: len(valid)]  # drop mesh-padding rows
            self.evaluator.process(logits[valid], labels[valid])

        results = self.evaluator.evaluate()
        for k, v in results.items():
            self._writer and self._writer.scalar(f"{split}/{k}", v, self.epoch)
        if return_pred:
            return self.evaluator.y_true, self.evaluator.y_pred
        return list(results.values())[0]

    # ------------------------------------------------------------ checkpoints
    def get_model_names(self):
        return [self.model_name]

    def extra_state(self):
        """Trainer state beyond params/optimizer that a resume must restore
        (rng stream, best-val tracker; subclasses add e.g. GPA accumulators)."""
        return {
            "rng_key": np.asarray(self.rng_key),
            "best_result": float(self.best_result),
        }

    def load_extra_state(self, state):
        if state.get("rng_key") is not None:
            self.rng_key = jnp.asarray(state["rng_key"])
        if state.get("best_result") is not None:
            self.best_result = float(state["best_result"])

    def save_model(self, epoch, directory, val_result=None, model_name=""):
        if jax.process_index() != 0:
            return  # multi-host: one writer per shared output dir
        save_checkpoint(
            {
                "state_dict": self.params,
                "epoch": epoch + 1,
                "optimizer": self.opt_state,
                "val_result": val_result,
                "extra": self.extra_state(),
            },
            os.path.join(directory, self.model_name),
            model_name=model_name,
        )

    def resume_model_if_exist(self, directory):
        ckpt = resume_from_checkpoint(os.path.join(directory, self.model_name))
        if ckpt is None:
            # parity: dassl torchtools.py:118-157 announces the fallback
            print(f'No checkpoint found in "{directory}", train from scratch')
            return 0
        self.params = replicate(self._coerce_params(ckpt["state_dict"]), self.mesh)
        if ckpt.get("optimizer") is not None:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(self.opt_state),
                jax.tree.leaves(ckpt["optimizer"]),
            )
            self.opt_state = replicate(opt_state, self.mesh)
        self.start_epoch = ckpt["epoch"]
        self.load_extra_state(ckpt.get("extra") or {})
        print(f"Resumed from epoch {self.start_epoch}")
        return self.start_epoch

    def _coerce_params(self, loaded):
        """Align a loaded state dict with the live params structure.

        Name-aware recursive merge with shape-mismatch skip (parity:
        load_pretrained_weights, dassl torchtools.py:267-314).  Keys absent
        from the checkpoint keep their live values; class-dependent buffers
        never enter checkpoints in the first place (they live in ``frozen``),
        which is the analog of the reference deleting token_prefix/suffix on
        load (coop.py:488-510)."""

        def merge(live, ckpt, path):
            if isinstance(live, dict):
                if not isinstance(ckpt, dict):
                    print(f"Warning: checkpoint subtree mismatch at {path}; keeping live")
                    return live
                out = {}
                for k, v in live.items():
                    if k in ckpt:
                        out[k] = merge(v, ckpt[k], f"{path}/{k}")
                    else:
                        print(f"Warning: {path}/{k} missing from checkpoint; keeping init")
                        out[k] = v
                return out
            if isinstance(live, (tuple, list)):
                if not isinstance(ckpt, (tuple, list)) or len(ckpt) != len(live):
                    print(f"Warning: checkpoint subtree mismatch at {path}; keeping live")
                    return live
                merged = [merge(a, b, f"{path}[{i}]") for i, (a, b) in enumerate(zip(live, ckpt))]
                return type(live)(merged)
            arr = jnp.asarray(ckpt)
            if hasattr(live, "shape") and arr.shape != live.shape:
                print(
                    f"Warning: shape mismatch at {path} "
                    f"({arr.shape} vs {live.shape}); keeping init"
                )
                return live
            return arr.astype(live.dtype) if hasattr(live, "dtype") else arr

        return merge(self.params, loaded, "")

    def load_model(self, directory, epoch=None):
        if not directory:
            print("Skip load_model (no pretrained path given)")
            return
        name = "model-best.pkl" if epoch is None else f"model.pkl-{epoch}"
        path = os.path.join(directory, self.model_name, name)
        if not os.path.exists(path) and epoch is None:
            # fall back to the pointer file
            ckpt = resume_from_checkpoint(os.path.join(directory, self.model_name))
        else:
            ckpt = load_checkpoint(path)
        if ckpt is None:
            raise FileNotFoundError(f"No checkpoint under {directory}")
        print(
            f'Load model from "{directory}" (epoch {ckpt["epoch"]}, '
            f'val_result {ckpt.get("val_result")})'
        )
        self.params = replicate(self._coerce_params(ckpt["state_dict"]), self.mesh)

    # ------------------------------------------------------------------ misc
    def get_current_lr(self):
        return float(self.lr_schedule.lr_at_epoch(min(self.epoch, self.max_epoch)))


# Back-compat alias: the reference distinguishes TrainerX (labeled-only);
# every CLIP-path trainer is labeled-only here.
TrainerX = SimpleTrainer

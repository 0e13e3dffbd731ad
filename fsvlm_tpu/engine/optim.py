"""Optimizers and LR schedules (parity: dassl/optim/).

The reference steps torch schedulers once per epoch (trainer.update_lr after
run_epoch); here the schedule is a pure function of the optax step count,
with steps_per_epoch baked in so per-step optax updates realize the same
per-epoch lr staircase:

- warmup (epoch < WARMUP_EPOCH): constant WARMUP_CONS_LR or linear ramp
  lr * epoch / WARMUP_EPOCH (min WARMUP_MIN_LR at epoch 0)
- post-warmup (WARMUP_RECOUNT=True, the dassl default that every shipped
  config uses): the successor scheduler starts counting at the END of
  warmup — the warmup wrapper only steps the successor once the warmup
  epochs have elapsed (dassl/optim/lr_scheduler.py:27-33), so epoch e
  trains at successor(e - WARMUP_EPOCH):
    cosine:      lr * (1 + cos(pi * (e - w) / MAX_EPOCH)) / 2
    single_step: lr * GAMMA ** ((e - w) // STEPSIZE[-1])
    multi_step:  lr * GAMMA ** #(milestones <= e - w)
  (dassl/optim/lr_scheduler.py:10-152)
"""

import math

import jax.numpy as jnp
import optax

AVAI_OPTIMS = ["adam", "amsgrad", "sgd", "rmsprop", "radam", "adamw"]


def _scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam(amsgrad=True) semantics: the running max is taken
    over the RAW second moment, then bias-corrected (optax.scale_by_amsgrad
    maxes the bias-corrected moment instead, which diverges while the
    correction is still moving)."""
    import jax

    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return {"count": jnp.zeros([], jnp.int32), "mu": z(), "nu": z(), "nu_max": z()}

    def update(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], updates)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return out, {"count": count, "mu": mu, "nu": nu, "nu_max": nu_max}

    return optax.GradientTransformation(init, update)
AVAI_SCHEDS = ["single_step", "multi_step", "cosine", "constant"]


def make_lr_schedule(cfg, steps_per_epoch):
    """Returns lr(step) implementing dassl's per-epoch schedule."""
    base_lr = cfg.OPTIM.LR
    max_epoch = cfg.OPTIM.MAX_EPOCH
    sched = cfg.OPTIM.LR_SCHEDULER
    warmup_epoch = cfg.OPTIM.WARMUP_EPOCH
    warmup_type = cfg.OPTIM.WARMUP_TYPE
    warmup_cons = cfg.OPTIM.WARMUP_CONS_LR
    warmup_min = cfg.OPTIM.WARMUP_MIN_LR
    gamma = cfg.OPTIM.GAMMA
    stepsize = cfg.OPTIM.STEPSIZE

    if sched not in AVAI_SCHEDS:
        raise ValueError(f"Unknown LR_SCHEDULER: {sched} (choices {AVAI_SCHEDS})")
    if warmup_epoch > 0 and not getattr(cfg.OPTIM, "WARMUP_RECOUNT", True):
        # WARMUP_RECOUNT=False relies on torch's recursive-scheduler drift
        # after a last_epoch jump (lr_scheduler.py:133-135) — no shipped
        # config uses it; reject rather than silently mis-schedule.
        raise NotImplementedError("WARMUP_RECOUNT=False is not supported")

    def lr_at_epoch(epoch):
        if warmup_epoch > 0 and epoch < warmup_epoch:
            if warmup_type == "constant":
                return warmup_cons
            if warmup_type == "linear":
                if epoch == 0:
                    return warmup_min
                return base_lr * epoch / warmup_epoch
            raise ValueError(f"Unknown WARMUP_TYPE: {warmup_type}")
        # WARMUP_RECOUNT semantics: successor counts from the end of warmup
        t = epoch - warmup_epoch if warmup_epoch > 0 else epoch
        if sched == "cosine":
            return base_lr * 0.5 * (1.0 + math.cos(math.pi * t / max_epoch))
        if sched == "single_step":
            # reference takes the LAST stepsize entry (lr_scheduler.py:101-102)
            ss = stepsize[-1] if isinstance(stepsize, (tuple, list)) else stepsize
            if ss <= 0:
                ss = max_epoch
            return base_lr * gamma ** (t // ss)
        if sched == "multi_step":
            passed = sum(1 for m in stepsize if t >= m)
            return base_lr * gamma ** passed
        return base_lr

    # precompute the per-epoch staircase as a jnp table: lr(step) is a gather,
    # keeping the schedule jit-friendly with zero host sync
    table = jnp.asarray(
        [lr_at_epoch(e) for e in range(max_epoch + 1)], dtype=jnp.float32
    )

    def schedule(count):
        epoch = jnp.minimum(count // max(steps_per_epoch, 1), max_epoch)
        return table[epoch]

    schedule.lr_at_epoch = lr_at_epoch  # host-side introspection for logging
    return schedule


def build_optimizer(cfg, steps_per_epoch, param_labels=None, lr_mult=None,
                    schedule_override=None):
    """optax transform matching dassl build_optimizer (optimizer.py:13-142).

    Weight decay follows torch semantics (decay added to the gradient before
    momentum).  staged-lr (NEW_LAYERS/BASE_LR_MULT) is realized with
    optax.multi_transform when param_labels/lr_mult are given.
    schedule_override replaces the dassl epoch staircase with a custom
    lr(step) (CDAC's per-iteration LambdaLR annealing, da/cdac.py:18-25).
    """
    name = cfg.OPTIM.NAME
    if name not in AVAI_OPTIMS:
        raise ValueError(f"Unknown OPTIM.NAME: {name} (choices {AVAI_OPTIMS})")

    schedule = (schedule_override if schedule_override is not None
                else make_lr_schedule(cfg, steps_per_epoch))
    wd = cfg.OPTIM.WEIGHT_DECAY
    momentum = cfg.OPTIM.MOMENTUM
    b1, b2 = cfg.OPTIM.ADAM_BETA1, cfg.OPTIM.ADAM_BETA2

    def core(scale=1.0):
        parts = []
        # torch semantics: coupled L2 (decay added to the grad before the
        # optimizer statistics) for everything except AdamW, which decouples
        # the decay (applied after scale_by_adam, torch.optim.AdamW)
        if wd and name != "adamw":
            parts.append(optax.add_decayed_weights(wd))
        if name == "sgd":
            parts.append(
                optax.trace(decay=momentum, nesterov=cfg.OPTIM.SGD_NESTEROV)
            )
        elif name == "adam":
            parts.append(optax.scale_by_adam(b1=b1, b2=b2))
        elif name == "amsgrad":
            parts.append(_scale_by_amsgrad_torch(b1=b1, b2=b2))
        elif name == "adamw":
            parts.append(optax.scale_by_adam(b1=b1, b2=b2))
            if wd:
                parts.append(optax.add_decayed_weights(wd))
        elif name == "rmsprop":
            parts.append(
                optax.scale_by_rms(decay=cfg.OPTIM.RMSPROP_ALPHA, initial_scale=0.0)
            )
            if momentum:
                parts.append(optax.trace(decay=momentum))
        elif name == "radam":
            parts.append(optax.scale_by_radam(b1=b1, b2=b2))
        parts.append(optax.scale_by_learning_rate(lambda c: scale * schedule(c)))
        return optax.chain(*parts)

    if param_labels is not None and lr_mult is not None:
        tx = optax.multi_transform(
            {"base": core(scale=lr_mult), "new": core(1.0)}, param_labels
        )
    else:
        tx = core()
    tx = optax.apply_if_finite(tx, max_consecutive_errors=8)
    return tx, schedule

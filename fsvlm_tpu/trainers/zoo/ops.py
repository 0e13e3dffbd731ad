"""Shared zoo ops: rampups, sharpening, mixup, EMA, GRL.

Functional equivalents of dassl/modeling/ops (utils.py, mixup.py,
reverse_grad.py), expressed for use inside a single jitted step: schedule
ramps take the traced global step so one compile covers the whole run.
"""

import jax
import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(-5 (1 - t)^2), t = clip(current/len, 0, 1) (dassl utils.py)."""
    if rampup_length == 0:
        return jnp.float32(1.0)
    t = jnp.clip(current.astype(jnp.float32), 0.0, rampup_length) / rampup_length
    return jnp.exp(-5.0 * (1.0 - t) ** 2)


def linear_rampup(current, rampup_length):
    if rampup_length == 0:
        return jnp.float32(1.0)
    return jnp.clip(current.astype(jnp.float32) / rampup_length, 0.0, 1.0)


def sharpen_prob(p, temperature):
    """p^(1/T) renormalized (dassl utils.py::sharpen_prob)."""
    sharp = p ** (1.0 / temperature)
    return sharp / sharp.sum(-1, keepdims=True)


def create_onehot(labels, num_classes):
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def mixup_pair(rng, x1, x2, y1, y2, beta, preserve_order=True):
    """dassl ops/mixup.py: one global lam ~ Beta(beta, beta) per call."""
    lam = jax.random.beta(rng, beta, beta)
    if preserve_order:
        lam = jnp.maximum(lam, 1.0 - lam)
    x = lam * x1 + (1.0 - lam) * x2
    y = lam * y1 + (1.0 - lam) * y2
    return x, y


def ema_update(student, teacher, alpha):
    """teacher <- alpha * teacher + (1 - alpha) * student (per leaf)."""
    return jax.tree.map(lambda t, s: alpha * t + (1.0 - alpha) * s, teacher, student)


@jax.custom_vjp
def grad_reverse(x, lmda):
    """Gradient reversal layer (dassl ops/reverse_grad.py): identity fwd,
    -lmda * g backward."""
    return x


def _gr_fwd(x, lmda):
    return x, lmda


def _gr_bwd(lmda, g):
    return (-lmda * g, jnp.zeros_like(lmda))


grad_reverse.defvjp(_gr_fwd, _gr_bwd)

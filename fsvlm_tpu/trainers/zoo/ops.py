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
    """p**T renormalized (dassl utils.py:5-13 uses the config value as the
    EXPONENT, p.pow(temperature) — the paper's p^(1/T) with T=1/temp)."""
    sharp = p ** temperature
    return sharp / sharp.sum(-1, keepdims=True)


def create_onehot(labels, num_classes):
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def fwd_keys(rng, n):
    """Per-forward dropout keys for a step: the reference runs every
    train-mode net forward with stochastic layers live (torch modules in
    .train()), so each forward in a step gets its own key.  Derived by
    fold_in on an offset stream so threading dropout through a trainer
    never perturbs its pre-existing draws (mixup lambdas, permutations,
    which consume split(rng, ...) directly)."""
    return [jax.random.fold_in(rng, 1000 + i) for i in range(n)]


def mixup_pair(rng, x1, x2, y1, y2, beta, preserve_order=True):
    """dassl ops/mixup.py: PER-SAMPLE lam ~ Beta(beta, beta) — the
    reference samples shape (B, 1, 1, 1), one mixing weight per row."""
    b = x1.shape[0]
    lam = jax.random.beta(rng, beta, beta, shape=(b,))
    if preserve_order:
        lam = jnp.maximum(lam, 1.0 - lam)
    lam_x = lam.reshape((b,) + (1,) * (x1.ndim - 1))
    lam_y = lam.reshape((b,) + (1,) * (y1.ndim - 1))
    x = lam_x * x1 + (1.0 - lam_x) * x2
    y = lam_y * y1 + (1.0 - lam_y) * y2
    return x, y


def ema_update(student, teacher, alpha):
    """teacher <- alpha * teacher + (1 - alpha) * student (per leaf)."""
    return jax.tree.map(lambda t, s: alpha * t + (1.0 - alpha) * s, teacher, student)


def bce_logits(logits, targets, valid=None):
    """BCEWithLogitsLoss (mean) with optional row mask."""
    per = optax_sigmoid_bce(logits, targets)
    per = per.reshape(per.shape[0], -1).mean(1)
    if valid is None:
        return per.mean()
    w = valid.astype(per.dtype)
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


def optax_sigmoid_bce(logits, labels):
    l = logits.astype(jnp.float32)
    return jnp.maximum(l, 0.0) - l * labels + jnp.log1p(jnp.exp(-jnp.abs(l)))


def leaky_relu(x, negative_slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def mlp_head_init(rng, in_features, hidden_layers, bn=True):
    """Functional dassl mlp head (dassl/modeling/head/mlp.py):
    [Linear -> BN1d -> activation] per hidden layer.
    Returns (params, state, out_features)."""
    from ...models.backbones.common import bn_init, linear_init

    params, state = {}, {}
    cin = in_features
    for i, width in enumerate(hidden_layers):
        params[f"fc{i}"] = linear_init(rng, cin, width)
        if bn:
            params[f"bn{i}"], state[f"bn{i}"] = bn_init(width)
        cin = width
    return params, state, cin


def mlp_head_apply(x, params, state, train, n_layers, act=leaky_relu):
    from ...models.backbones.common import bn_apply, linear_apply

    new_state = {}
    for i in range(n_layers):
        x = linear_apply(x, params[f"fc{i}"])
        if f"bn{i}" in params:
            x, new_state[f"bn{i}"] = bn_apply(
                x, params[f"bn{i}"], state[f"bn{i}"], train
            )
        x = act(x)
    return x, new_state


def prototypes_init(rng, fdim, num_classes):
    """MME/CDAC cosine prototype classifier (bias-free linear over
    L2-normalized features, temperature 0.05)."""
    from ...models.backbones.common import linear_init

    p = linear_init(rng, fdim, num_classes)
    return {"w": p["w"]}


def prototypes_apply(x, params, temp=0.05, reverse=False, lmda=1.0):
    if reverse:
        x = grad_reverse(x, jnp.float32(lmda))
    x = x * jax.lax.rsqrt((x * x).sum(-1, keepdims=True) + 1e-12)
    return (x @ params["w"].astype(x.dtype)) / temp


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

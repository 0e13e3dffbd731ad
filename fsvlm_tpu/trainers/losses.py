"""Loss functions for the prompt-learning trainers.

Parity targets:
- MultiClassFocalLoss (trainers/coop.py:131-163): alpha[target] *
  (1-pt)^gamma * CE, alpha defaulting to inverse-frequency weights computed
  from DATASET.PER_CLASS_SHOTS (coop.py:326-346).
- LogitsNTXentLoss (coop.py:66-128): SimCLR NT-Xent over L2-normalized logit
  rows, temperature 0.07.
- NTXentLoss over features (simclr_utils.py:62-86) — same math, different
  inputs.
- mixup (independentVL.py:12-29), KD (independentVL.py:32-44).

All are pure jnp functions (batched, jit/grad-safe).

Every batch-reduced loss takes an optional ``valid`` (B,) bool mask:
shard_batch pads batches that don't divide the mesh by repeating the last
row, and without masking those duplicates would silently over-weight the
last example (e.g. the shipped batch-4 configs on an 8-device mesh).  The
masked mean sums per-example losses over valid rows only.
"""

import jax
import jax.numpy as jnp
import optax


def masked_mean(per_example, valid=None):
    """Mean of (B,) per-example values over valid rows (plain mean if no
    mask).  Uses where-select so masked entries may be inf/nan-free."""
    if valid is None:
        return per_example.mean()
    v = valid.astype(per_example.dtype)
    safe = jnp.where(valid, per_example, 0.0)
    return safe.sum() / jnp.maximum(v.sum(), 1.0)


def masked_acc(logits, labels, valid=None):
    """Batch top-1 accuracy (%) over valid rows."""
    correct = (logits.argmax(-1) == labels).astype(jnp.float32)
    return masked_mean(correct, valid) * 100.0


def cross_entropy(logits, labels, valid=None):
    return masked_mean(
        optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ),
        valid,
    )


def focal_loss(logits, labels, alpha=None, gamma=2.0, valid=None):
    """Multi-class focal loss; ``alpha``: optional (C,) per-class weights."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    pt = jnp.exp(-ce)
    focal = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        focal = alpha[labels] * focal
    return masked_mean(focal, valid)


def focal_alpha_from_shots(per_class_shots):
    """Inverse-frequency alpha: total / (n_cls * count) (coop.py:337-345)."""
    import numpy as np

    counts = np.asarray(per_class_shots, np.float32)
    total = counts.sum()
    n_cls = len(counts)
    alpha = np.where(counts > 0, total / (n_cls * np.maximum(counts, 1)), 0.0)
    return jnp.asarray(alpha, jnp.float32)


def nt_xent(z1, z2, temperature=0.07, valid=None):
    """SimCLR NT-Xent over two aligned views.

    z1, z2: (N, D) — rows are L2-normalized internally.  Positives are
    (i, i+N); self-similarity is excluded.  Covers both the fork's
    logit-space variant (inputs = logits) and the feature-space variant.
    With ``valid``, padded rows are excluded both as anchors and as
    negatives (a padded duplicate would double-count its source row).
    """
    z1 = z1 / jnp.linalg.norm(z1, axis=1, keepdims=True)
    z2 = z2 / jnp.linalg.norm(z2, axis=1, keepdims=True)
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)  # (2N, D)
    n2 = z.shape[0]
    n = n2 // 2

    sim = z @ z.T / temperature  # (2N, 2N)
    self_mask = jnp.eye(n2, dtype=bool)
    sim = jnp.where(self_mask, -jnp.inf, sim)
    v2 = None
    if valid is not None:
        v2 = jnp.concatenate([valid, valid]).astype(bool)
        sim = jnp.where(v2[None, :], sim, -jnp.inf)

    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    logsumexp = jax.nn.logsumexp(sim, axis=1)
    pos = sim[jnp.arange(n2), pos_idx]
    per_row = logsumexp - pos
    if v2 is not None:
        per_row = jnp.where(v2, per_row, 0.0)
        return per_row.sum() / jnp.maximum(v2.astype(jnp.float32).sum(), 1.0)
    return per_row.mean()


def mixup_batch(rng, images, alpha=1.0):
    """Returns (mixed_images, perm, lam) — mixup_data semantics
    (independentVL.py:12-21)."""
    k_lam, k_perm = jax.random.split(rng)
    lam = jax.random.beta(k_lam, alpha, alpha) if alpha > 0 else 1.0
    perm = jax.random.permutation(k_perm, images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed, perm, lam


def mixup_criterion(loss_fn, logits, labels_a, labels_b, lam):
    return lam * loss_fn(logits, labels_a) + (1.0 - lam) * loss_fn(logits, labels_b)


def kd_loss(student_logits, teacher_logits, T=4.0, valid=None):
    """KL(softmax(teacher/T) ‖ softmax(student/T)) * T^2
    (independentVL.py:32-44)."""
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T, axis=1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=1)
    per_row = (t * (jnp.log(jnp.clip(t, 1e-12)) - s)).sum(axis=1)
    return masked_mean(per_row, valid) * (T * T)


def l1_loss(a, b, valid=None):
    """Elementwise-mean L1; with ``valid``, rows of ``a``/``b`` (axis 0) are
    masked (used for per-image feature SCL terms on padded batches)."""
    d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    if valid is None:
        return d.mean()
    return masked_mean(d.reshape(d.shape[0], -1).mean(axis=1), valid)


def kl_logits(student_logits, teacher_logits, T=1.0, valid=None):
    """KL divergence between temperature-scaled logit rows (PromptSRC's
    SCL-logits term, promptsrc.py:316-324)."""
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T, axis=1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=1)
    per_row = (t * (jnp.log(jnp.clip(t, 1e-12)) - s)).sum(axis=1)
    return masked_mean(per_row, valid) * (T * T)

"""Golden parity for losses and LR schedules against torch formulations.

The torch reference formulas are re-stated here directly (focal:
trainers/coop.py:131-163; NT-Xent: coop.py:66-128; KD: independentVL.py:
32-69; schedules: dassl/optim/lr_scheduler.py) and evaluated with torch as
the oracle.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine.optim import make_lr_schedule
from fsvlm_tpu.trainers.losses import (
    cross_entropy,
    focal_alpha_from_shots,
    focal_loss,
    kd_loss,
    nt_xent,
)


def test_focal_loss_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 8).astype(np.float32)
    labels = rng.randint(0, 8, 16)
    shots = [16, 16, 8, 8, 4, 4, 1, 1]
    alpha = focal_alpha_from_shots(shots)

    # torch oracle (MultiClassFocalLoss semantics)
    lt = torch.from_numpy(logits)
    yt = torch.from_numpy(labels)
    at = torch.tensor(np.asarray(alpha))
    ce = F.cross_entropy(lt, yt, reduction="none")
    pt = torch.exp(-ce)
    expected = (at[yt] * (1 - pt) ** 2 * ce).mean().item()

    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha=alpha))
    assert abs(ours - expected) < 1e-5

    # alpha formula: total / (n_cls * count)
    np.testing.assert_allclose(
        np.asarray(alpha), [58 / (8 * c) for c in shots], rtol=1e-6
    )


def test_nt_xent_matches_torch():
    """Reference LogitsNTXentLoss: normalized rows, sim/T, positives at
    (i, i+N), CE over [pos | negatives-excluding-self-and-pos]."""
    rng = np.random.RandomState(1)
    z1 = rng.randn(6, 10).astype(np.float32)
    z2 = rng.randn(6, 10).astype(np.float32)
    T = 0.07

    a = F.normalize(torch.from_numpy(z1), dim=1)
    b = F.normalize(torch.from_numpy(z2), dim=1)
    z = torch.cat([a, b], 0)
    n2 = z.shape[0]
    n = n2 // 2
    sim = z @ z.t() / T
    pos_idx = torch.arange(n2)
    pos_idx[:n] += n
    pos_idx[n:] -= n
    pos = sim[torch.arange(n2), pos_idx].unsqueeze(1)
    neg_mask = (
        (torch.arange(n2)[None, :] != torch.arange(n2)[:, None])
        & (torch.arange(n2)[None, :] != pos_idx[:, None])
    )
    negs = sim[neg_mask].view(n2, -1)
    out = torch.cat([pos, negs], 1)
    expected = F.cross_entropy(out, torch.zeros(n2, dtype=torch.long)).item()

    ours = float(nt_xent(jnp.asarray(z1), jnp.asarray(z2), temperature=T))
    assert abs(ours - expected) < 1e-5


def test_kd_loss_matches_torch():
    rng = np.random.RandomState(2)
    s = rng.randn(8, 12).astype(np.float32)
    t = rng.randn(8, 12).astype(np.float32)
    T = 4.0
    st = torch.from_numpy(s)
    tt = torch.from_numpy(t)
    expected = (
        F.kl_div(
            F.log_softmax(st / T, dim=1),
            F.softmax(tt / T, dim=1),
            reduction="batchmean",
        )
        * T
        * T
    ).item()
    ours = float(kd_loss(jnp.asarray(s), jnp.asarray(t), T=T))
    assert abs(ours - expected) < 1e-4


def test_cosine_schedule_matches_torch():
    """dassl: CosineAnnealingLR stepped per epoch + 1-epoch constant warmup."""
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.0025
    cfg.OPTIM.MAX_EPOCH = 20
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 1e-5

    sched = make_lr_schedule(cfg, steps_per_epoch=10)

    # torch oracle
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.0025)
    cosine = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)

    # ConstantWarmupScheduler semantics: epoch 0 -> cons_lr; epoch e>=1 ->
    # cosine stepped e times
    expected = [1e-5]
    for e in range(1, 20):
        cosine.step()
        expected.append(opt.param_groups[0]["lr"])

    got = [sched.lr_at_epoch(e) for e in range(20)]
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    # step-indexed table agrees with epoch function
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(10)) == pytest.approx(expected[1])
    assert float(sched(199)) == pytest.approx(expected[19])


def test_multi_step_schedule():
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.MAX_EPOCH = 10
    cfg.OPTIM.LR_SCHEDULER = "multi_step"
    cfg.OPTIM.STEPSIZE = (4, 7)
    cfg.OPTIM.GAMMA = 0.1
    cfg.OPTIM.WARMUP_EPOCH = -1
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    got = [round(sched.lr_at_epoch(e), 8) for e in range(10)]
    assert got == [0.1] * 4 + [0.01] * 3 + [0.001] * 3

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


def _reference_lr_trace(cfg):
    """Drive the REAL dassl scheduler stack (warmup wrapper + torch
    successor, dassl/optim/lr_scheduler.py) exactly as the engine does —
    one .step() after each epoch — and record the lr each epoch trains at."""
    from reference_oracle import import_reference_lr_scheduler

    mod = import_reference_lr_scheduler()
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=cfg.OPTIM.LR)
    sched = mod.build_lr_scheduler(opt, cfg.OPTIM)
    trace = []
    for _ in range(cfg.OPTIM.MAX_EPOCH):
        trace.append(opt.param_groups[0]["lr"])
        sched.step()
    return trace


def _schedule_cfg(**kw):
    cfg = get_cfg_default()
    for k, v in kw.items():
        setattr(cfg.OPTIM, k, v)
    return cfg


@pytest.mark.parametrize(
    "kw",
    [
        # PromptSRC/MaPLe-style: cosine + 1-epoch constant warmup.  With
        # WARMUP_RECOUNT=True (the dassl default) epoch e>=1 trains at
        # cosine(e-1): the first post-warmup epoch runs at the FULL base lr.
        dict(LR=0.0025, MAX_EPOCH=20, LR_SCHEDULER="cosine",
             WARMUP_EPOCH=1, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5),
        # short schedule (MaPLe ep5) where the off-by-one bites hardest
        dict(LR=0.0035, MAX_EPOCH=5, LR_SCHEDULER="cosine",
             WARMUP_EPOCH=1, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5),
        # linear warmup over 3 epochs + cosine
        dict(LR=0.002, MAX_EPOCH=12, LR_SCHEDULER="cosine",
             WARMUP_EPOCH=3, WARMUP_TYPE="linear", WARMUP_MIN_LR=1e-6),
        # multi_step with warmup: milestones count post-warmup epochs
        dict(LR=0.1, MAX_EPOCH=12, LR_SCHEDULER="multi_step",
             STEPSIZE=(4, 7), GAMMA=0.1,
             WARMUP_EPOCH=2, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5),
        # single_step, no warmup; reference uses the LAST stepsize entry
        dict(LR=0.05, MAX_EPOCH=10, LR_SCHEDULER="single_step",
             STEPSIZE=(2, 3), GAMMA=0.5, WARMUP_EPOCH=-1),
        # cosine, no warmup
        dict(LR=0.01, MAX_EPOCH=8, LR_SCHEDULER="cosine", WARMUP_EPOCH=-1),
    ],
)
def test_schedule_matches_reference_scheduler(kw):
    cfg = _schedule_cfg(**kw)
    expected = _reference_lr_trace(cfg)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    got = [sched.lr_at_epoch(e) for e in range(cfg.OPTIM.MAX_EPOCH)]
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-12)

    # step-indexed table agrees with the epoch function
    assert float(sched(0)) == pytest.approx(expected[0])
    assert float(sched(10)) == pytest.approx(expected[1])
    last = 10 * cfg.OPTIM.MAX_EPOCH - 1
    assert float(sched(last)) == pytest.approx(expected[-1])

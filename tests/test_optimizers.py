"""All dassl optimizer choices must build and step (optimizer.py:13-142 parity)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine.optim import AVAI_OPTIMS, build_optimizer


@pytest.mark.parametrize("name", AVAI_OPTIMS)
def test_optimizer_builds_and_steps(name):
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = name
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = -1

    tx, sched = build_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.5)}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(new_params["w"])).all()
    assert not np.allclose(np.asarray(new_params["w"]), 1.0)


def _torch_trace(opt_name, lr, wd, steps, grad=0.5, shape=(4,)):
    """Step the real torch optimizer on a constant gradient."""
    import torch

    p = torch.nn.Parameter(torch.ones(shape))
    if opt_name == "adamw":
        opt = torch.optim.AdamW([p], lr=lr, weight_decay=wd)
    elif opt_name == "amsgrad":
        opt = torch.optim.Adam([p], lr=lr, weight_decay=wd, amsgrad=True)
    elif opt_name == "adam":
        opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    else:
        raise ValueError(opt_name)
    trace = []
    for _ in range(steps):
        opt.zero_grad()
        p.grad = torch.full(shape, grad)
        opt.step()
        trace.append(p.detach().numpy().copy())
    return trace


@pytest.mark.parametrize("name", ["adam", "adamw", "amsgrad"])
def test_adam_family_matches_torch(name):
    """adamw must use DECOUPLED weight decay (torch.optim.AdamW), adam and
    amsgrad coupled L2 (torch.optim.Adam); amsgrad keeps the running max of
    the second moment."""
    lr, wd, steps = 0.05, 0.1, 5
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = name
    cfg.OPTIM.LR = lr
    cfg.OPTIM.WEIGHT_DECAY = wd
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.OPTIM.LR_SCHEDULER = "constant"
    cfg.OPTIM.WARMUP_EPOCH = -1

    tx, _ = build_optimizer(cfg, steps_per_epoch=10 * steps)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    ours = []
    for _ in range(steps):
        grads = {"w": jnp.full((4,), 0.5)}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        ours.append(np.asarray(params["w"]))

    expected = _torch_trace(name, lr, wd, steps)
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-7)


def test_adamw_differs_from_adam_under_decay():
    """Guard against regressing to coupled L2 for adamw."""
    a = _torch_trace("adam", 0.05, 0.1, 3)
    w = _torch_trace("adamw", 0.05, 0.1, 3)
    assert not np.allclose(a[-1], w[-1])


def test_unknown_optimizer_rejected():
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "sophia"
    with pytest.raises(ValueError, match="Unknown OPTIM.NAME"):
        build_optimizer(cfg, 1)


def test_distance_helpers():
    import numpy as np

    from fsvlm_tpu.engine.distance import compute_distance_matrix

    rng = np.random.RandomState(0)
    x = rng.randn(5, 8).astype(np.float32)
    y = rng.randn(7, 8).astype(np.float32)

    d = np.asarray(compute_distance_matrix(jnp.asarray(x), jnp.asarray(y), "euclidean"))
    expected = np.linalg.norm(x[:, None] - y[None, :], axis=-1)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)

    c = np.asarray(compute_distance_matrix(jnp.asarray(x), jnp.asarray(y), "cosine"))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=1, keepdims=True)
    np.testing.assert_allclose(c, 1 - xn @ yn.T, rtol=1e-5, atol=1e-6)

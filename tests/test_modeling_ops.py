"""Modeling ops zoo: MixStyle/EFDMix, MMD, Sinkhorn, TransNorm, DSBN,
label-smoothed CE, dynamic conv — vs reference semantics
(Dassl dassl/modeling/ops/*.py; torch oracles where cheap)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsvlm_tpu.models.modeling_ops import (
    attention_apply,
    attention_init,
    conv2d_dynamic_apply,
    conv2d_dynamic_init,
    cross_entropy_smooth,
    dsbn_apply,
    dsbn_init,
    efdmix,
    maximum_mean_discrepancy,
    minibatch_energy_distance,
    mixstyle,
    sinkhorn_divergence,
    transnorm_apply,
    transnorm_init,
)


def test_mixstyle_preserves_shape_and_moves_stats():
    x = jnp.asarray(np.random.RandomState(0).rand(8, 6, 6, 4), jnp.float32)
    y = mixstyle(jax.random.PRNGKey(0), x, p=1.0, alpha=0.3)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))
    # eval / p=0 are identity
    assert np.allclose(np.asarray(mixstyle(jax.random.PRNGKey(0), x, train=False)), x)
    y0 = mixstyle(jax.random.PRNGKey(1), x, p=0.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x))


def test_efdmix_sorted_value_interpolation():
    x = jnp.asarray(np.random.RandomState(1).rand(6, 5, 5, 3), jnp.float32)
    y = efdmix(jax.random.PRNGKey(2), x, p=1.0, alpha=0.3)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))
    # lam=1 limit: y == x when the partner is itself (identity permutation
    # can't be forced, but the sorted-value map of x onto its own ranks is x)
    xv = x.transpose(0, 3, 1, 2).reshape(6, 3, 25)
    idx = jnp.argsort(xv, -1)
    vals = jnp.take_along_axis(xv, idx, -1)
    back = jnp.take_along_axis(vals, jnp.argsort(idx, -1), -1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xv), rtol=1e-6)


@pytest.mark.parametrize("kernel", ["linear", "poly", "rbf"])
def test_mmd_against_torch_oracle(kernel):
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_mmd", "/root/reference/Dassl.pytorch/dassl/modeling/ops/mmd.py")
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception:
        pytest.skip("reference mmd not importable")
    x = np.random.RandomState(0).rand(5, 16).astype(np.float32)
    y = np.random.RandomState(1).rand(7, 16).astype(np.float32)
    ours = float(maximum_mean_discrepancy(jnp.asarray(x), jnp.asarray(y),
                                          kernel_type=kernel))
    theirs = float(ref.MaximumMeanDiscrepancy(kernel_type=kernel)(
        torch.from_numpy(x), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_sinkhorn_divergence_properties():
    x = jnp.asarray(np.random.RandomState(0).rand(6, 8), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).rand(6, 8) + 2.0, jnp.float32)
    d_far = float(sinkhorn_divergence(x, y, max_iter=10))
    d_self = float(sinkhorn_divergence(x, x, max_iter=10))
    assert d_far > d_self
    assert abs(d_self) < 1e-4
    med = float(minibatch_energy_distance(x, y, max_iter=5))
    assert np.isfinite(med)


def test_cross_entropy_smooth_matches_plain_at_zero():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 5), jnp.float32)
    labels = jnp.asarray([0, 2, 4, 1])
    plain = float(cross_entropy_smooth(logits, labels, 0.0))
    expect = float(-jnp.take_along_axis(
        jax.nn.log_softmax(logits, 1), labels[:, None], 1).mean())
    np.testing.assert_allclose(plain, expect, rtol=1e-6)
    smoothed = float(cross_entropy_smooth(logits, labels, 0.2))
    assert smoothed != plain


def test_transnorm_train_eval_and_state():
    p, s = transnorm_init(4)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 4) * 3, jnp.float32)
    y, ns = transnorm_apply(x, jax.tree.map(jnp.asarray, p),
                            jax.tree.map(jnp.asarray, s), train=True)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(ns["mean_s"]), s["mean_s"])
    y_eval, ns2 = transnorm_apply(x, jax.tree.map(jnp.asarray, p), ns,
                                  train=False)
    assert ns2 is ns and y_eval.shape == x.shape


def test_dsbn_per_domain_stats():
    p, s = dsbn_init(3, n_domain=2)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 6, 6, 3), jnp.float32)
    _, ns = dsbn_apply(x, jax.tree.map(jnp.asarray, p),
                       jax.tree.map(jnp.asarray, s), domain_idx=1, train=True)
    # only domain 1's stats moved
    np.testing.assert_allclose(np.asarray(ns["mean"][0]), s["mean"][0])
    assert not np.allclose(np.asarray(ns["mean"][1]), s["mean"][1])


def test_dynamic_conv_shapes():
    rng = np.random.RandomState(0)
    p = conv2d_dynamic_init(rng, 8, 16, 3, squeeze=4)
    x = jnp.asarray(rng.rand(2, 10, 10, 8), jnp.float32)
    y = conv2d_dynamic_apply(x, p, stride=2)
    assert y.shape == (2, 5, 5, 16)
    w = attention_apply(x, attention_init(rng, 8, 2, squeeze=4))
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)


def test_mixstyle_resnet_variant_runs():
    from fsvlm_tpu.models.backbones import build_backbone

    bb = build_backbone("resnet18_ms_l12", seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    f, _ = bb.apply(bb.params, bb.state, x, train=True,
                    rng=jax.random.PRNGKey(0))
    assert f.shape == (4, 512)
    # train mode without rng must fail loudly, not silently skip mixing
    with pytest.raises(ValueError, match="rng"):
        bb.apply(bb.params, bb.state, x, train=True)
    # eval mode needs no rng
    f2, _ = bb.apply(bb.params, bb.state, x, train=False)
    assert f2.shape == (4, 512)
    efd = build_backbone("resnet50_efdmix_l1", seed=0)
    f3, _ = efd.apply(efd.params, efd.state, x, train=True,
                      rng=jax.random.PRNGKey(1))
    assert f3.shape == (4, 2048)


def test_head_registry_mlp():
    from fsvlm_tpu.models.heads import build_head

    h = build_head("mlp", in_features=32, hidden_layers=[16, 8],
                   activation="leaky_relu")
    assert h.out_features == 8
    y, ns = h.apply(h.params, h.state, jnp.ones((4, 32)), train=True)
    assert y.shape == (4, 8) and set(ns) == {"bn0", "bn1"}
    d = build_head("mlp", in_features=8, hidden_layers=4, dropout=0.5)
    with pytest.raises(ValueError, match="rng"):
        d.apply(d.params, d.state, jnp.ones((2, 8)), train=True)

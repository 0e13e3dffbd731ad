"""Int8 serving quantization (ops/quant.py).

The reference serves fp16/fp32 torch (PromptSRC/trainers/zsclip.py:28-54);
the int8 W8A8 path is a TPU-native serving extension.  These tests pin:
  * the quantized GEMM against the fp linear (elementwise tolerance),
  * feature agreement of the quantized ViT tower at tiny and real widths,
  * the ZeroshotCLIP serving path under MODEL.QUANT_INT8 (top-1 agreement),
  * that the ResNet tower is left untouched (documented no-op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvlm_tpu.models.clip import ARCHS, encode_image
from fsvlm_tpu.models.clip.convert import random_clip_params
from fsvlm_tpu.ops.layers import linear
from fsvlm_tpu.ops.quant import (
    int8_linear,
    is_quantized,
    quantize_blocks,
    quantize_clip_params,
    quantize_weight,
)


def test_int8_linear_close_to_fp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 9, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 96).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(96).astype(np.float32) * 0.1)

    wq = quantize_weight(w)
    assert wq["q8"].dtype == jnp.int8 and wq["scale"].shape == (96,)

    y_fp = x @ w + b
    y_q = int8_linear(x, wq, b)
    # symmetric per-channel W8 + per-token A8: ~1% relative error expected
    rel = jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp)
    assert float(rel) < 0.02, float(rel)

    # the generic linear() dispatches on the quantization record
    np.testing.assert_array_equal(np.asarray(linear(x, wq, b)),
                                  np.asarray(y_q))


def test_quantize_weight_stacked_layers():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 32, 48).astype(np.float32))
    wq = quantize_weight(w)
    assert wq["q8"].shape == (3, 32, 48) and wq["scale"].shape == (3, 48)
    # per-layer slices must equal quantizing each layer independently
    one = quantize_weight(w[1])
    np.testing.assert_array_equal(np.asarray(wq["q8"][1]), np.asarray(one["q8"]))
    np.testing.assert_allclose(np.asarray(wq["scale"][1]), np.asarray(one["scale"]))


@pytest.mark.parametrize("arch", ["test-tiny", "ViT-B/16"])
def test_quantized_vit_features_agree(arch):
    cfg = ARCHS[arch]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=0))
    qparams = quantize_clip_params(params, towers=("visual",))
    assert is_quantized(qparams["visual"]["blocks"]["attn"]["w_qkv"])
    # text tower untouched
    assert not isinstance(qparams["text"]["blocks"]["attn"]["w_qkv"], dict)

    res = 32 if arch == "test-tiny" else cfg.image_resolution
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(2, res, res, 3).astype(np.float32) * 0.5)

    f_fp = encode_image(params, cfg, imgs)
    f_q = encode_image(qparams, cfg, imgs)
    cos = jnp.sum(
        f_fp * f_q, axis=-1
    ) / (jnp.linalg.norm(f_fp, axis=-1) * jnp.linalg.norm(f_q, axis=-1))
    assert float(jnp.min(cos)) > 0.99, np.asarray(cos)


def test_quantize_families_subset():
    """families=("mlp",) quantizes only the wide MLP GEMMs (2/3 of tower
    FLOPs) and leaves QKV/out-proj float — the partially-quantized tower
    still runs and tracks the fp features."""
    cfg = ARCHS["test-tiny"]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=7))
    qparams = quantize_clip_params(
        params, towers=("visual",), families=("mlp",))
    blocks = qparams["visual"]["blocks"]
    assert is_quantized(blocks["mlp"]["w_fc"])
    assert is_quantized(blocks["mlp"]["w_proj"])
    assert not is_quantized(blocks["attn"]["w_qkv"])
    assert not is_quantized(blocks["attn"]["w_out"])

    rng = np.random.RandomState(8)
    imgs = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.5)
    f_fp = encode_image(params, cfg, imgs)
    f_q = encode_image(qparams, cfg, imgs)
    cos = jnp.sum(f_fp * f_q, axis=-1) / (
        jnp.linalg.norm(f_fp, axis=-1) * jnp.linalg.norm(f_q, axis=-1))
    assert float(jnp.min(cos)) > 0.99, np.asarray(cos)


def test_quantized_blocks_scan_jit():
    """The quantized stacked pytree must flow through jit + lax.scan."""
    cfg = ARCHS["test-tiny"]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=3))
    qb = quantize_blocks(params["visual"]["blocks"])
    from fsvlm_tpu.models.clip.transformer import transformer

    x = jnp.asarray(np.random.RandomState(4).randn(2, 5, cfg.vision_width),
                    dtype=jnp.float32)
    out = jax.jit(
        lambda b, x: transformer(b, x, n_heads=cfg.vision_heads)
    )(qb, x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


def test_resnet_tower_quantization_is_noop():
    cfg = ARCHS["test-tiny-rn"]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=5))
    qparams = quantize_clip_params(params, towers=("visual",))
    flat_a = jax.tree_util.tree_leaves(params["visual"])
    flat_b = jax.tree_util.tree_leaves(qparams["visual"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trained_coop_serves_int8_at_eval(tmp_path):
    """MODEL.QUANT_INT8 is an engine-level eval hook: a TRAINED prompt
    trainer (CoOp) serves its checkpoint through the int8 tower, and the
    accuracy matches the fp32 eval on the same params."""
    from test_coop_end2end import make_cfg

    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    cfg = make_cfg(tmp_path, **{"OPTIM.MAX_EPOCH": 8, "OPTIM.LR": 2.0,
                                "TEST.NO_TEST": True})
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    acc_fp = t.test()
    # flip to int8 serving on the same live trainer
    t.cfg.defrost()
    t.cfg.MODEL.QUANT_INT8 = True
    t.cfg.freeze()
    t._frozen_eval = None  # rebuild the eval pytree
    acc_q = t.test()
    assert is_quantized(t._frozen_eval["clip"]["visual"]["blocks"]["attn"]["w_qkv"])
    assert abs(acc_q - acc_fp) <= 10.0, (acc_fp, acc_q)


def test_engine_int8_families_config(tmp_path):
    """MODEL.QUANT_INT8_FAMILIES ["mlp"] reaches the engine eval hook: only
    the MLP GEMMs quantize (the measured-faster selective variant)."""
    from test_coop_end2end import make_cfg

    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    cfg = make_cfg(tmp_path, **{"MODEL.QUANT_INT8": True})
    cfg.defrost()
    cfg.MODEL.QUANT_INT8_FAMILIES = ["mlp"]
    cfg.freeze()
    t = build_trainer(cfg)
    fe = t._get_frozen_eval()
    assert is_quantized(fe["clip"]["visual"]["blocks"]["mlp"]["w_fc"])
    assert not is_quantized(fe["clip"]["visual"]["blocks"]["attn"]["w_qkv"])


def test_visual_prompt_trainer_serves_int8(tmp_path):
    """Visual deep prompts (PromptSRC) splice INSIDE the quantized tower:
    the scan slices each layer's {"q8","scale"} record alongside the float
    leaves and the spliced sequence flows through int8_linear.  This is the
    one serving composition the CoOp test above (no visual prompts) cannot
    reach."""
    from test_ivlp_promptsrc import ivlp_cfg

    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    cfg = ivlp_cfg(tmp_path, trainer="PromptSRC", **{
        "OPTIM.MAX_EPOCH": 2,
        "TEST.NO_TEST": True,
        "TRAINER.PROMPTSRC.TEXT_LOSS_WEIGHT": 1.0,
        "TRAINER.PROMPTSRC.IMAGE_LOSS_WEIGHT": 0.5,
        "TRAINER.PROMPTSRC.GPA_MEAN": 1,
        "TRAINER.PROMPTSRC.GPA_STD": 1,
    })
    cfg.freeze()
    t = build_trainer(cfg)
    t.train()

    acc_fp = t.test()
    t.cfg.defrost()
    t.cfg.MODEL.QUANT_INT8 = True
    t.cfg.freeze()
    t._frozen_eval = None
    acc_q = t.test()
    assert is_quantized(
        t._frozen_eval["clip"]["visual"]["blocks"]["mlp"]["w_fc"])
    # random tiny towers after 2 epochs: only require the quantized serve
    # to produce a sane accuracy in the fp path's neighbourhood
    assert abs(acc_q - acc_fp) <= 15.0, (acc_fp, acc_q)


def test_int8_serving_shards_over_mesh():
    """The int8 forward composes with SPMD: batch sharded over the 8-device
    mesh, quantized params replicated, predictions match single-device."""
    from fsvlm_tpu.parallel.mesh import data_sharded, get_mesh, replicated

    cfg = ARCHS["test-tiny"]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=7))
    qparams = quantize_clip_params(params, towers=("visual",))
    rng = np.random.RandomState(8)
    imgs = rng.randn(16, 32, 32, 3).astype(np.float32) * 0.5

    f_single = np.asarray(encode_image(qparams, cfg, jnp.asarray(imgs)))

    mesh = get_mesh()
    assert mesh.devices.size == 8
    qp = jax.device_put(qparams, replicated(mesh))
    xb = jax.device_put(jnp.asarray(imgs), data_sharded(mesh))
    f_mesh = np.asarray(
        jax.jit(lambda p, x: encode_image(p, cfg, x))(qp, xb))
    np.testing.assert_allclose(f_mesh, f_single, rtol=2e-5, atol=2e-5)


def test_int8_linear_static_scale():
    """A quant record carrying a calibrated static activation scale ("xs")
    skips the per-row dynamic quantization and still tracks fp."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(4, 9, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 96).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(96).astype(np.float32) * 0.1)

    wq = quantize_weight(w)
    amax = float(jnp.max(jnp.abs(x)))
    wq_static = dict(wq, xs=jnp.asarray(amax / 127.0, jnp.float32))

    y_fp = x @ w + b
    y_s = int8_linear(x, wq_static, b)
    rel = jnp.linalg.norm(y_s - y_fp) / jnp.linalg.norm(y_fp)
    assert float(rel) < 0.03, float(rel)
    # static != dynamic records (different activation grids), both close to fp
    y_d = int8_linear(x, wq, b)
    rel_d = jnp.linalg.norm(y_s - y_d) / jnp.linalg.norm(y_fp)
    assert float(rel_d) < 0.03, float(rel_d)


def test_calibrated_static_tower_features_agree():
    """calibrate_visual_amax -> quantize_clip_params(static_amax=...): the
    static-scale int8 tower tracks the fp features as well as dynamic int8
    on in-distribution inputs."""
    from fsvlm_tpu.ops.quant import calibrate_visual_amax

    cfg = ARCHS["test-tiny"]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=0))
    rng = np.random.RandomState(11)
    cal = [jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32) * 0.5)
           for _ in range(3)]
    amax = calibrate_visual_amax(params, cfg, cal, compute_dtype=jnp.float32)
    n_layers = params["visual"]["blocks"]["ln_1"]["scale"].shape[0]
    assert amax.shape == (n_layers, 4)
    assert bool(jnp.all(amax > 0))

    qp = quantize_clip_params(params, towers=("visual",),
                              static_amax={"visual": amax})
    rec = qp["visual"]["blocks"]["attn"]["w_qkv"]
    assert is_quantized(rec) and rec["xs"].shape == (n_layers,)

    imgs = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32) * 0.5)
    f_fp = encode_image(params, cfg, imgs)
    f_s = encode_image(qp, cfg, imgs)
    cos = jnp.sum(f_fp * f_s, axis=-1) / (
        jnp.linalg.norm(f_fp, axis=-1) * jnp.linalg.norm(f_s, axis=-1))
    assert float(jnp.min(cos)) > 0.985, np.asarray(cos)


def test_engine_int8_static_config(tmp_path):
    """MODEL.QUANT_INT8_STATIC reaches the engine eval hook: the frozen eval
    tower's records carry per-layer static scales calibrated from the test
    loader."""
    from test_coop_end2end import make_cfg

    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    cfg = make_cfg(tmp_path, **{"MODEL.QUANT_INT8": True})
    cfg.defrost()
    cfg.MODEL.QUANT_INT8_STATIC = True
    cfg.MODEL.QUANT_INT8_CALIB_BATCHES = 2
    cfg.freeze()
    t = build_trainer(cfg)
    fe = t._get_frozen_eval()
    rec = fe["clip"]["visual"]["blocks"]["attn"]["w_qkv"]
    assert is_quantized(rec) and "xs" in rec
    assert bool(jnp.all(rec["xs"] > 0))
    acc = t.test()
    assert acc == acc  # serving runs end-to-end (NaN guard)


def test_zsclip_serving_int8_top1_agreement(tmp_path):
    """ZeroshotCLIP under MODEL.QUANT_INT8: logits close, top-1 agrees."""
    from fsvlm_tpu.config import get_cfg_default

    def build(quant):
        cfg = get_cfg_default()
        cfg.MODEL.BACKBONE.NAME = "test-tiny"
        cfg.MODEL.BACKBONE.PRETRAINED = False
        cfg.MODEL.QUANT_INT8 = quant
        cfg.DATASET.NAME = "Synthetic"
        return cfg

    from fsvlm_tpu.models.clip import encode_text_ids, l2_normalize
    from fsvlm_tpu.models.clip.tokenizer import tokenize

    cfg = ARCHS["test-tiny"]
    params = jax.tree.map(jnp.asarray, random_clip_params(cfg, seed=0))
    ids = tokenize([f"a photo of a thing {i}." for i in range(7)])
    txf = l2_normalize(encode_text_ids(params, cfg, ids))

    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randn(16, 32, 32, 3).astype(np.float32) * 0.5)

    def logits(p):
        imf = l2_normalize(encode_image(p, cfg, imgs))
        return imf @ txf.T

    l_fp = logits(params)
    l_q = logits(quantize_clip_params(params, towers=("visual",)))
    agree = np.mean(
        np.argmax(np.asarray(l_fp), -1) == np.argmax(np.asarray(l_q), -1))
    assert agree >= 14 / 16, agree

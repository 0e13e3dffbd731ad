"""Backbone zoo shape/behavior checks: AlexNet, VGG-16, PreAct-ResNet18,
EfficientNet B0/B1, plus registry completeness vs the reference zoo
(Dassl dassl/modeling/backbone/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsvlm_tpu.models.backbones import BACKBONE_REGISTRY, build_backbone


def _run(name, size, train=False, rng=None, batch=1):
    bb = build_backbone(name, seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 3),
                    jnp.float32)
    f, ns = bb.apply(bb.params, bb.state, x, train=train, rng=rng)
    return bb, f


def test_alexnet_features():
    bb, f = _run("alexnet", 224)
    assert f.shape == (1, 4096)
    # dropout without rng in train mode must raise
    with pytest.raises(ValueError, match="rng"):
        _run("alexnet", 224, train=True)
    _, f2 = _run("alexnet", 224, train=True, rng=jax.random.PRNGKey(0))
    assert f2.shape == (1, 4096)


def test_vgg16_features():
    bb, f = _run("vgg16", 224)
    assert bb.out_features == 4096 and f.shape == (1, 4096)


def test_preact_resnet18_cifar_shape():
    bb, f = _run("preact_resnet18", 32)
    assert bb.out_features == 512 and f.shape == (1, 512)


@pytest.mark.parametrize("name,ch", [("efficientnet_b0", 1280),
                                     ("efficientnet_b2", 1408)])
def test_efficientnet_widths(name, ch):
    bb = build_backbone(name, seed=0)
    assert bb.out_features == ch
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    f, ns = bb.apply(bb.params, bb.state, x, train=False)
    assert f.shape == (1, ch)
    f2, _ = bb.apply(bb.params, bb.state, x, train=True,
                     rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(f2)).all()


def test_efficientnet_b0_block_count():
    bb = build_backbone("efficientnet_b0", seed=0)
    assert len(bb.blocks) == 16  # 1+2+2+3+3+4+1
    b1 = build_backbone("efficientnet_b1", seed=0)
    assert len(b1.blocks) == 23  # depth 1.1 rounds every stage up


def test_dynamic_resnet_runs():
    bb = build_backbone("resnet18_dynamic", seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    f, _ = bb.apply(bb.params, bb.state, x, train=False)
    assert f.shape == (2, 512)
    # dynamic conv params exist in every block's 3x3 slots
    assert "att" in bb.params["layer1_0"]["conv1"]


def test_registry_covers_reference_names():
    """Every backbone name the reference registers must resolve here
    (dassl/modeling/backbone: resnets+variants, wide_resnet, digit CNNs,
    alexnet, vgg16, preact_resnet18, efficientnet b0-b7)."""
    expected = (
        ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
         "alexnet", "vgg16", "preact_resnet18",
         "wide_resnet_16_4", "wide_resnet_28_2",
         "cnn_digitsdg", "cnn_digitsingle", "cnn_digit5_m3sda"]
        + [f"efficientnet_b{i}" for i in range(8)]
        + [f"resnet{n}_{t}_{l}" for n in (18, 50, 101)
           for t in ("ms", "efdmix") for l in ("l123", "l12", "l1")]
        + [f"resnet{n}_dynamic" for n in (18, 50, 101)]
        + [f"resnet{n}_dynamic_ms_{l}" for n in (18, 50, 101)
           for l in ("l123", "l12", "l1")]
    )
    have = set(BACKBONE_REGISTRY.registered_names())
    missing = [n for n in expected if n not in have]
    assert not missing, f"missing backbones: {missing}"


def test_pretrained_resnet_import(tmp_path, monkeypatch, capsys):
    """MODEL.BACKBONE.PRETRAINED=True loads staged weights into the
    functional resnet; absent weights warn loudly (never silent)."""
    torch = pytest.importorskip("torch")
    from fsvlm_tpu.config import get_cfg_default
    from fsvlm_tpu.models.backbones.resnet import ResNetBackbone
    from fsvlm_tpu.models.simple_net import SimpleNet, find_backbone_weights

    # synthesize a torchvision-layout resnet18 state_dict from our shapes
    bb = ResNetBackbone("basic", [2, 2, 2, 2], seed=0)
    sd = {}
    rng = np.random.RandomState(0)

    def put_conv(name, w):
        sd[name + ".weight"] = torch.from_numpy(
            rng.rand(*np.transpose(w, (3, 2, 0, 1)).shape).astype(np.float32))

    def put_bn(name, c):
        sd[name + ".weight"] = torch.ones(c)
        sd[name + ".bias"] = torch.zeros(c)
        sd[name + ".running_mean"] = torch.full((c,), 0.25)
        sd[name + ".running_var"] = torch.full((c,), 2.0)

    put_conv("conv1", bb.params["conv1"]["w"])
    put_bn("bn1", 64)
    for key, _ in bb._strides:
        stage, b = key.split("_")
        tv = f"{stage}.{b}"
        blk = bb.params[key]
        for c in ("conv1", "conv2"):
            put_conv(f"{tv}.{c}", blk[c]["w"])
            put_bn(f"{tv}.bn{c[-1]}", blk[c]["w"].shape[-1])
        if "down_conv" in blk:
            put_conv(f"{tv}.downsample.0", blk["down_conv"]["w"])
            put_bn(f"{tv}.downsample.1", blk["down_conv"]["w"].shape[-1])
    wpath = tmp_path / "resnet18-fake.pth"
    torch.save(sd, str(wpath))
    monkeypatch.setenv("FSVLM_BACKBONE_WEIGHTS", str(wpath))
    assert find_backbone_weights("resnet18") == str(wpath)

    cfg = get_cfg_default()
    cfg.VERBOSE = False
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    cfg.MODEL.BACKBONE.PRETRAINED = True
    net = SimpleNet(cfg, cfg.MODEL, 4, seed=0)
    np.testing.assert_allclose(
        np.asarray(net.state["backbone"]["bn1"]["mean"]), 0.25)
    out = capsys.readouterr().out
    assert "Loaded pretrained backbone weights" in out

    # absent weights: prominent warning, not a silent no-op
    monkeypatch.setenv("FSVLM_BACKBONE_WEIGHTS", str(tmp_path / "nowhere"))
    monkeypatch.delenv("HOME", raising=False)
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    SimpleNet(cfg, cfg.MODEL, 4, seed=0)
    assert "WARNING: MODEL.BACKBONE.PRETRAINED" in capsys.readouterr().out

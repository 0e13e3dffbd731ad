"""ModifiedResNet image tower (RN50/RN101/RN50x4/RN50x16).

Parity target: PromptSRC/clip/model.py:10-150 — 3-conv stem with avgpool,
anti-aliased strided bottlenecks (avgpool before the stride-2 conv), and a
QKV attention pool instead of global average pooling.

BatchNorm always uses the frozen running statistics.  Documented divergence:
the reference leaves BN in train mode during prompt tuning (set_model_mode
("train") flips the whole CustomCLIP), silently updating running stats with
batch statistics even though no gradient reaches them; a frozen tower should
not mutate, so we normalize with the checkpoint statistics everywhere.
"""

import jax
import jax.numpy as jnp


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + 1e-5)
    w = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    b = (p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    return x * w + b


def _conv(x, kernel, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _bottleneck(x, p, stride):
    identity = x
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=((1, 1), (1, 1))), p["bn2"]))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = _avg_pool(x, stride) if stride > 1 else x
        identity = _bn(_conv(identity, p["downsample"]["conv"]), p["downsample"]["bn"])
    return jax.nn.relu(out + identity)


def _attention_pool(x, p, n_heads):
    """QKV attention pool (AttentionPool2d, clip/model.py:56-91).

    x: (B, H, W, C). The mean token attends over [mean; tokens]."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean = tokens.mean(axis=1, keepdims=True)
    seq = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
    seq = seq + p["positional_embedding"].astype(seq.dtype)

    def proj(t, lin):
        return t @ lin["w"].astype(t.dtype) + lin["b"].astype(t.dtype)

    q = proj(seq[:, :1], p["q_proj"])  # only the mean token's output is used
    k = proj(seq, p["k_proj"])
    v = proj(seq, p["v_proj"])

    head_dim = C // n_heads
    q = q.reshape(B, 1, n_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, n_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, n_heads, head_dim).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * head_dim ** -0.5, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, C)
    out = proj(out, p["c_proj"])
    return out


def encode_image_resnet(params, cfg, images, compute_dtype=jnp.float32,
                        collect_stages=False):
    """images: (B, H, W, 3) CLIP-normalized NHWC.

    collect_stages: also return the four stage outputs (NHWC) — golden
    comparison surface against the reference's layer1..4 (clip/model.py
    ModifiedResNet.forward)."""
    v = params["visual"]
    x = images.astype(compute_dtype)

    s = v["stem"]
    x = jax.nn.relu(_bn(_conv(x, s["conv1"], stride=2, padding=((1, 1), (1, 1))), s["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, s["conv2"], padding=((1, 1), (1, 1))), s["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, s["conv3"], padding=((1, 1), (1, 1))), s["bn3"]))
    x = _avg_pool(x, 2)

    stages = []
    for li, stage in enumerate(v["layers"]):
        stride = 1 if li == 0 else 2
        for bi, block in enumerate(stage):
            x = _bottleneck(x, block, stride if bi == 0 else 1)
        stages.append(x)

    x = _attention_pool(x, v["attnpool"], cfg.vision_heads)
    if collect_stages:
        return x.astype(jnp.float32), stages
    return x.astype(jnp.float32)

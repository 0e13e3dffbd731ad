"""OpenAI CLIP checkpoint -> JAX pytree conversion, plus random init.

The torch layout being mapped is documented in the reference
(PromptSRC/clip/model.py:488-561 module tree; clip/clip.py:86-182 loader).
Every tensor in the source state dict is mapped or explicitly skipped;
conversion fails loudly on unknown keys so weight porting stays total.
"""

import re

import numpy as np

from .config import CLIPConfig, config_from_state_dict_shapes

# trainer-owned parameters that may appear in modified checkpoints; they are
# extracted by the method trainers, not by the tower converter
_SKIP_PATTERNS = [
    r".*VPT.*",
    r"^prompt_learner\..*",
    r".*lora.*",
    r"^input_resolution$",
    r"^context_length$",
    r"^vocab_size$",
]


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu) — avoid importing torch at module scope
    return t.detach().cpu().numpy()


def _ln(sd, prefix):
    return {
        "scale": _to_numpy(sd[prefix + ".weight"]).astype(np.float32),
        "bias": _to_numpy(sd[prefix + ".bias"]).astype(np.float32),
    }


def _stack_blocks(sd, prefix, n_layers):
    """Stack per-layer transformer params along a leading layer axis.

    torch Linear stores (out, in); we store (in, out) so forward is x @ w.
    """
    def get(i, name):
        return _to_numpy(sd[f"{prefix}.resblocks.{i}.{name}"]).astype(np.float32)

    blocks = {
        "ln_1": {
            "scale": np.stack([get(i, "ln_1.weight") for i in range(n_layers)]),
            "bias": np.stack([get(i, "ln_1.bias") for i in range(n_layers)]),
        },
        "attn": {
            "w_qkv": np.stack([get(i, "attn.in_proj_weight").T for i in range(n_layers)]),
            "b_qkv": np.stack([get(i, "attn.in_proj_bias") for i in range(n_layers)]),
            "w_out": np.stack([get(i, "attn.out_proj.weight").T for i in range(n_layers)]),
            "b_out": np.stack([get(i, "attn.out_proj.bias") for i in range(n_layers)]),
        },
        "ln_2": {
            "scale": np.stack([get(i, "ln_2.weight") for i in range(n_layers)]),
            "bias": np.stack([get(i, "ln_2.bias") for i in range(n_layers)]),
        },
        "mlp": {
            "w_fc": np.stack([get(i, "mlp.c_fc.weight").T for i in range(n_layers)]),
            "b_fc": np.stack([get(i, "mlp.c_fc.bias") for i in range(n_layers)]),
            "w_proj": np.stack([get(i, "mlp.c_proj.weight").T for i in range(n_layers)]),
            "b_proj": np.stack([get(i, "mlp.c_proj.bias") for i in range(n_layers)]),
        },
    }
    return blocks


def _convert_vit_visual(sd, cfg):
    # torch conv weight (width, 3, P, P) -> HWIO (P, P, 3, width)
    conv = _to_numpy(sd["visual.conv1.weight"]).astype(np.float32)
    return {
        "patch_embed": conv.transpose(2, 3, 1, 0),
        "class_embedding": _to_numpy(sd["visual.class_embedding"]).astype(np.float32),
        "positional_embedding": _to_numpy(sd["visual.positional_embedding"]).astype(np.float32),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": _stack_blocks(sd, "visual.transformer", cfg.vision_layers),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _to_numpy(sd["visual.proj"]).astype(np.float32),
    }


def _conv(sd, prefix):
    # torch conv weight (out, in, kh, kw) -> HWIO (kh, kw, in, out)
    return _to_numpy(sd[prefix + ".weight"]).astype(np.float32).transpose(2, 3, 1, 0)


def _bn(sd, prefix):
    return {
        "scale": _to_numpy(sd[prefix + ".weight"]).astype(np.float32),
        "bias": _to_numpy(sd[prefix + ".bias"]).astype(np.float32),
        "mean": _to_numpy(sd[prefix + ".running_mean"]).astype(np.float32),
        "var": _to_numpy(sd[prefix + ".running_var"]).astype(np.float32),
    }


def _linear(sd, prefix):
    return {
        "w": _to_numpy(sd[prefix + ".weight"]).astype(np.float32).T,
        "b": _to_numpy(sd[prefix + ".bias"]).astype(np.float32),
    }


def _convert_resnet_visual(sd, cfg):
    visual = {
        "stem": {
            "conv1": _conv(sd, "visual.conv1"),
            "bn1": _bn(sd, "visual.bn1"),
            "conv2": _conv(sd, "visual.conv2"),
            "bn2": _bn(sd, "visual.bn2"),
            "conv3": _conv(sd, "visual.conv3"),
            "bn3": _bn(sd, "visual.bn3"),
        },
        "layers": [],
        "attnpool": {
            "positional_embedding": _to_numpy(
                sd["visual.attnpool.positional_embedding"]
            ).astype(np.float32),
            "q_proj": _linear(sd, "visual.attnpool.q_proj"),
            "k_proj": _linear(sd, "visual.attnpool.k_proj"),
            "v_proj": _linear(sd, "visual.attnpool.v_proj"),
            "c_proj": _linear(sd, "visual.attnpool.c_proj"),
        },
    }
    for li, n_blocks in enumerate(cfg.vision_layers, start=1):
        stage = []
        for b in range(n_blocks):
            p = f"visual.layer{li}.{b}"
            block = {
                "conv1": _conv(sd, p + ".conv1"),
                "bn1": _bn(sd, p + ".bn1"),
                "conv2": _conv(sd, p + ".conv2"),
                "bn2": _bn(sd, p + ".bn2"),
                "conv3": _conv(sd, p + ".conv3"),
                "bn3": _bn(sd, p + ".bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _conv(sd, p + ".downsample.0"),
                    "bn": _bn(sd, p + ".downsample.1"),
                }
            stage.append(block)
        visual["layers"].append(stage)
    return visual


def clip_params_from_state_dict(sd, cfg=None):
    """Convert a torch CLIP state dict to (params pytree, CLIPConfig)."""
    sd = {k: v for k, v in sd.items()}
    if cfg is None:
        cfg = config_from_state_dict_shapes(sd)

    visual = (
        _convert_vit_visual(sd, cfg) if cfg.is_vit else _convert_resnet_visual(sd, cfg)
    )
    params = {
        "visual": visual,
        "text": {
            "token_embedding": _to_numpy(sd["token_embedding.weight"]).astype(np.float32),
            "positional_embedding": _to_numpy(sd["positional_embedding"]).astype(np.float32),
            "blocks": _stack_blocks(sd, "transformer", cfg.transformer_layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": _to_numpy(sd["text_projection"]).astype(np.float32),
        },
        "logit_scale": _to_numpy(sd["logit_scale"]).astype(np.float32).reshape(()),
    }

    # verify totality: everything else must match a sanctioned skip pattern
    consumed = _consumed_keys(cfg)
    leftovers = [
        k
        for k in sd
        if k not in consumed and not any(re.match(p, k) for p in _SKIP_PATTERNS)
    ]
    if leftovers:
        raise ValueError(f"Unmapped checkpoint keys: {leftovers[:10]} ...")
    return params, cfg


def _consumed_keys(cfg):
    keys = {
        "token_embedding.weight",
        "positional_embedding",
        "ln_final.weight",
        "ln_final.bias",
        "text_projection",
        "logit_scale",
    }
    for i in range(cfg.transformer_layers):
        for name in _BLOCK_KEYS:
            keys.add(f"transformer.resblocks.{i}.{name}")
    if cfg.is_vit:
        keys |= {
            "visual.conv1.weight",
            "visual.class_embedding",
            "visual.positional_embedding",
            "visual.ln_pre.weight",
            "visual.ln_pre.bias",
            "visual.ln_post.weight",
            "visual.ln_post.bias",
            "visual.proj",
        }
        for i in range(cfg.vision_layers):
            for name in _BLOCK_KEYS:
                keys.add(f"visual.transformer.resblocks.{i}.{name}")
    else:
        for stem in ["conv1", "conv2", "conv3"]:
            keys.add(f"visual.{stem}.weight")
        for bn in ["bn1", "bn2", "bn3"]:
            for part in _BN_KEYS:
                keys.add(f"visual.{bn}.{part}")
        for li, n_blocks in enumerate(cfg.vision_layers, start=1):
            for b in range(n_blocks):
                p = f"visual.layer{li}.{b}"
                for c in ["conv1", "conv2", "conv3"]:
                    keys.add(f"{p}.{c}.weight")
                for bn in ["bn1", "bn2", "bn3"]:
                    for part in _BN_KEYS:
                        keys.add(f"{p}.{bn}.{part}")
                keys.add(f"{p}.downsample.0.weight")
                for part in _BN_KEYS:
                    keys.add(f"{p}.downsample.1.{part}")
        for proj in ["q_proj", "k_proj", "v_proj", "c_proj"]:
            keys.add(f"visual.attnpool.{proj}.weight")
            keys.add(f"visual.attnpool.{proj}.bias")
        keys.add("visual.attnpool.positional_embedding")
    return keys


_BLOCK_KEYS = [
    "ln_1.weight",
    "ln_1.bias",
    "attn.in_proj_weight",
    "attn.in_proj_bias",
    "attn.out_proj.weight",
    "attn.out_proj.bias",
    "ln_2.weight",
    "ln_2.bias",
    "mlp.c_fc.weight",
    "mlp.c_fc.bias",
    "mlp.c_proj.weight",
    "mlp.c_proj.bias",
]

_BN_KEYS = ["weight", "bias", "running_mean", "running_var", "num_batches_tracked"]


def load_openai_checkpoint(path):
    """Load an OpenAI CLIP release file (TorchScript archive or state dict)
    and return (params, cfg).  Parity: clip/clip.py:86-135 + trainers'
    load_clip_to_cpu (trainers/coop.py:165-183)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return clip_params_from_state_dict(sd)


def export_openai_state_dict(params, cfg):
    """Inverse of ``clip_params_from_state_dict``: fsvlm params pytree ->
    OpenAI-format torch-key state dict (numpy values; wrap in
    torch.from_numpy to load_state_dict into the reference CLIP,
    clip/model.py:370-431).  Used by the golden-pack generator to feed
    deterministically regenerable full-shape weights (random_clip_params)
    to the torch oracle, so committed full-shape goldens need only the
    seed, not hundreds of MB of weights."""
    sd = {}

    def unstack(prefix, blocks, n_layers):
        for i in range(n_layers):
            sd[f"{prefix}.resblocks.{i}.ln_1.weight"] = blocks["ln_1"]["scale"][i]
            sd[f"{prefix}.resblocks.{i}.ln_1.bias"] = blocks["ln_1"]["bias"][i]
            sd[f"{prefix}.resblocks.{i}.attn.in_proj_weight"] = (
                np.asarray(blocks["attn"]["w_qkv"][i]).T)
            sd[f"{prefix}.resblocks.{i}.attn.in_proj_bias"] = blocks["attn"]["b_qkv"][i]
            sd[f"{prefix}.resblocks.{i}.attn.out_proj.weight"] = (
                np.asarray(blocks["attn"]["w_out"][i]).T)
            sd[f"{prefix}.resblocks.{i}.attn.out_proj.bias"] = blocks["attn"]["b_out"][i]
            sd[f"{prefix}.resblocks.{i}.ln_2.weight"] = blocks["ln_2"]["scale"][i]
            sd[f"{prefix}.resblocks.{i}.ln_2.bias"] = blocks["ln_2"]["bias"][i]
            sd[f"{prefix}.resblocks.{i}.mlp.c_fc.weight"] = (
                np.asarray(blocks["mlp"]["w_fc"][i]).T)
            sd[f"{prefix}.resblocks.{i}.mlp.c_fc.bias"] = blocks["mlp"]["b_fc"][i]
            sd[f"{prefix}.resblocks.{i}.mlp.c_proj.weight"] = (
                np.asarray(blocks["mlp"]["w_proj"][i]).T)
            sd[f"{prefix}.resblocks.{i}.mlp.c_proj.bias"] = blocks["mlp"]["b_proj"][i]

    v = params["visual"]
    if cfg.is_vit:
        sd["visual.conv1.weight"] = np.asarray(v["patch_embed"]).transpose(3, 2, 0, 1)
        sd["visual.class_embedding"] = v["class_embedding"]
        sd["visual.positional_embedding"] = v["positional_embedding"]
        sd["visual.ln_pre.weight"] = v["ln_pre"]["scale"]
        sd["visual.ln_pre.bias"] = v["ln_pre"]["bias"]
        unstack("visual.transformer", v["blocks"], cfg.vision_layers)
        sd["visual.ln_post.weight"] = v["ln_post"]["scale"]
        sd["visual.ln_post.bias"] = v["ln_post"]["bias"]
        sd["visual.proj"] = v["proj"]
    else:
        def put_bn(prefix, bn):
            sd[prefix + ".weight"] = bn["scale"]
            sd[prefix + ".bias"] = bn["bias"]
            sd[prefix + ".running_mean"] = bn["mean"]
            sd[prefix + ".running_var"] = bn["var"]
            sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

        def put_conv(prefix, w):
            sd[prefix + ".weight"] = np.asarray(w).transpose(3, 2, 0, 1)

        for i in (1, 2, 3):
            put_conv(f"visual.conv{i}", v["stem"][f"conv{i}"])
            put_bn(f"visual.bn{i}", v["stem"][f"bn{i}"])
        for li, stage in enumerate(v["layers"], start=1):
            for b, block in enumerate(stage):
                p = f"visual.layer{li}.{b}"
                for c in ("conv1", "conv2", "conv3"):
                    put_conv(f"{p}.{c}", block[c])
                for bn in ("bn1", "bn2", "bn3"):
                    put_bn(f"{p}.{bn}", block[bn])
                if "downsample" in block:
                    put_conv(f"{p}.downsample.0", block["downsample"]["conv"])
                    put_bn(f"{p}.downsample.1", block["downsample"]["bn"])
        ap = v["attnpool"]
        sd["visual.attnpool.positional_embedding"] = ap["positional_embedding"]
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            sd[f"visual.attnpool.{proj}.weight"] = np.asarray(ap[proj]["w"]).T
            sd[f"visual.attnpool.{proj}.bias"] = ap[proj]["b"]

    t = params["text"]
    sd["token_embedding.weight"] = t["token_embedding"]
    sd["positional_embedding"] = t["positional_embedding"]
    unstack("transformer", t["blocks"], cfg.transformer_layers)
    sd["ln_final.weight"] = t["ln_final"]["scale"]
    sd["ln_final.bias"] = t["ln_final"]["bias"]
    sd["text_projection"] = t["text_projection"]
    sd["logit_scale"] = np.asarray(params["logit_scale"])
    return {k: np.ascontiguousarray(np.asarray(val)) for k, val in sd.items()}


# --------------------------------------------------------------------------
# random initialization (tests, benchmarks, dry-runs; no network access)
# --------------------------------------------------------------------------

def _random_resnet_visual(cfg, rng):
    """ModifiedResNet random weights (reference init: bn3 scale zeroed,
    attnpool projections std=width**-0.5, clip/model.py:573-583)."""

    def conv(kh, kw, cin, cout):
        bound = 1.0 / np.sqrt(cin * kh * kw)
        return rng.uniform(-bound, bound, (kh, kw, cin, cout)).astype(np.float32)

    def bn(c, zero_scale=False):
        return {
            "scale": (np.zeros if zero_scale else np.ones)(c).astype(np.float32),
            "bias": np.zeros(c, np.float32),
            "mean": np.zeros(c, np.float32),
            "var": np.ones(c, np.float32),
        }

    W = cfg.vision_width
    visual = {
        "stem": {
            "conv1": conv(3, 3, 3, W // 2),
            "bn1": bn(W // 2),
            "conv2": conv(3, 3, W // 2, W // 2),
            "bn2": bn(W // 2),
            "conv3": conv(3, 3, W // 2, W),
            "bn3": bn(W),
        },
        "layers": [],
    }
    inplanes = W
    for li, n_blocks in enumerate(cfg.vision_layers):
        planes = W * (2 ** li)
        stage = []
        for b in range(n_blocks):
            block = {
                "conv1": conv(1, 1, inplanes if b == 0 else planes * 4, planes),
                "bn1": bn(planes),
                "conv2": conv(3, 3, planes, planes),
                "bn2": bn(planes),
                "conv3": conv(1, 1, planes, planes * 4),
                "bn3": bn(planes * 4, zero_scale=True),
            }
            if b == 0:
                block["downsample"] = {
                    "conv": conv(1, 1, inplanes, planes * 4),
                    "bn": bn(planes * 4),
                }
            stage.append(block)
        inplanes = planes * 4
        visual["layers"].append(stage)

    embed_dim_v = W * 32
    std = embed_dim_v ** -0.5
    spacial = cfg.image_resolution // 32

    def linear(cin, cout):
        return {
            "w": rng.normal(0, std, (cin, cout)).astype(np.float32),
            "b": np.zeros(cout, np.float32),
        }

    visual["attnpool"] = {
        "positional_embedding": (
            rng.randn(spacial ** 2 + 1, embed_dim_v) / np.sqrt(embed_dim_v)
        ).astype(np.float32),
        "q_proj": linear(embed_dim_v, embed_dim_v),
        "k_proj": linear(embed_dim_v, embed_dim_v),
        "v_proj": linear(embed_dim_v, embed_dim_v),
        "c_proj": linear(embed_dim_v, cfg.embed_dim),
    }
    return visual

def random_clip_params(cfg: CLIPConfig, seed=0):
    """Random CLIP weights with the reference's init distributions
    (CLIP.initialize_parameters, clip/model.py:567-591). ViT only for now;
    ModifiedResNet towers use kaiming-style fan-in scaling."""
    rng = np.random.RandomState(seed)

    def normal(shape, std):
        return rng.normal(0.0, std, size=shape).astype(np.float32)

    def make_blocks(n_layers, width):
        proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
        attn_std = width ** -0.5
        fc_std = (2 * width) ** -0.5
        return {
            "ln_1": {
                "scale": np.ones((n_layers, width), np.float32),
                "bias": np.zeros((n_layers, width), np.float32),
            },
            "attn": {
                "w_qkv": normal((n_layers, width, 3 * width), attn_std),
                "b_qkv": np.zeros((n_layers, 3 * width), np.float32),
                "w_out": normal((n_layers, width, width), proj_std),
                "b_out": np.zeros((n_layers, width), np.float32),
            },
            "ln_2": {
                "scale": np.ones((n_layers, width), np.float32),
                "bias": np.zeros((n_layers, width), np.float32),
            },
            "mlp": {
                "w_fc": normal((n_layers, width, 4 * width), fc_std),
                "b_fc": np.zeros((n_layers, 4 * width), np.float32),
                "w_proj": normal((n_layers, 4 * width, width), proj_std),
                "b_proj": np.zeros((n_layers, width), np.float32),
            },
        }

    if not cfg.is_vit:
        visual = _random_resnet_visual(cfg, rng)
    else:
        visual = None

    W = cfg.vision_width
    scale = W ** -0.5
    params = {
        "visual": visual
        if visual is not None
        else {
            "patch_embed": normal(
                (cfg.vision_patch_size, cfg.vision_patch_size, 3, W),
                (3 * cfg.vision_patch_size ** 2) ** -0.5,
            ),
            "class_embedding": (scale * rng.randn(W)).astype(np.float32),
            "positional_embedding": (
                scale * rng.randn(cfg.vision_seq_len, W)
            ).astype(np.float32),
            "ln_pre": {"scale": np.ones(W, np.float32), "bias": np.zeros(W, np.float32)},
            "blocks": make_blocks(cfg.vision_layers, W),
            "ln_post": {"scale": np.ones(W, np.float32), "bias": np.zeros(W, np.float32)},
            "proj": (scale * rng.randn(W, cfg.embed_dim)).astype(np.float32),
        },
        "text": {
            "token_embedding": normal((cfg.vocab_size, cfg.transformer_width), 0.02),
            "positional_embedding": normal(
                (cfg.context_length, cfg.transformer_width), 0.01
            ),
            "blocks": make_blocks(cfg.transformer_layers, cfg.transformer_width),
            "ln_final": {
                "scale": np.ones(cfg.transformer_width, np.float32),
                "bias": np.zeros(cfg.transformer_width, np.float32),
            },
            "text_projection": normal(
                (cfg.transformer_width, cfg.embed_dim), cfg.transformer_width ** -0.5
            ),
        },
        "logit_scale": np.float32(np.log(1 / 0.07)),
    }
    return params

#!/usr/bin/env python
"""Golden-activation harness for REAL OpenAI CLIP weights.

The reference's value claim is accuracy with the released CLIP checkpoints
(PromptSRC/clip/clip.py:39-86 downloads them; docs/EVAL.md reports with
them).  This environment has no network egress, so the checkpoints may not
exist on disk — this tool makes the parity claim *provable the day they
do*:

    python tools/make_goldens.py --backbone ViT-B/16 --out goldens.npz

runs the reference PyTorch model (the read-only oracle checkout) on the
checkpoint found by ``find_clip_weights``, and dumps deterministic inputs
plus every comparison surface: tokenizer ids, text/image features, logits,
logit_scale, and per-block transformer activations for both towers.
``tests/test_golden_weights.py`` replays the same inputs through fsvlm_tpu
and asserts feature/logit agreement (it generates goldens in-process when
weights are present, or replays a saved .npz via $FSVLM_GOLDENS — so it
skips today and bites the moment weights appear).
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

CLASSNAMES = [
    "golden retriever", "tabby cat", "fire truck", "acoustic guitar",
    "espresso", "aircraft carrier", "daisy", "school bus",
    "wind farm", "saxophone", "lighthouse", "sushi",
    "snow leopard", "hot air balloon", "cathedral", "typewriter",
]

# CLIP preprocessing constants (clip/clip.py:78)
MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

PLAIN_DESIGN = {
    "trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
    "vision_ctx": 0, "language_ctx": 0,
}


def golden_inputs(resolution, n_images=8, seed=0):
    """Deterministic inputs: CLIP-normalized pseudo-images + prompt ids."""
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, (n_images, resolution, resolution, 3))
    images = (raw.astype(np.float32) / 255.0 - MEAN) / STD
    texts = [f"a photo of a {c}." for c in CLASSNAMES]
    return images, texts


def load_oracle_model(backbone, weights_path=None):
    """Build the reference torch CLIP from the on-disk checkpoint."""
    import torch

    from reference_oracle import import_reference_clip
    from fsvlm_tpu.trainers.backbone import find_clip_weights

    path = weights_path or find_clip_weights(backbone)
    if path is None:
        return None, None
    import_reference_clip()
    from clip.model import build_model

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    model = build_model(dict(sd), PLAIN_DESIGN).float().eval()
    return model, path


def build_goldens(backbone, n_images=8, seed=0, weights_path=None):
    """Run the torch oracle; returns the golden dict (None if no weights)."""
    import torch

    model, path = load_oracle_model(backbone, weights_path)
    if model is None:
        return None
    from reference_oracle import import_reference_clip

    ref_clip = import_reference_clip()

    resolution = model.visual.input_resolution
    images, texts = golden_inputs(resolution, n_images, seed)
    ids = ref_clip.tokenize(texts).numpy()

    with torch.no_grad():
        t_images = torch.from_numpy(images.transpose(0, 3, 1, 2)).float()
        t_ids = torch.from_numpy(ids).long()
        vis_blocks = []
        if hasattr(model.visual, "transformer"):  # ViT (RN has no blocks)
            # saved_features fills only while .init is True (model.py:362-366)
            model.visual.transformer.saved_features = []
            model.visual.transformer.init = True
        imf = model.encode_image(t_images).float()
        if hasattr(model.visual, "transformer"):
            vis_blocks = [
                f.permute(1, 0, 2).numpy()
                for f in model.visual.transformer.saved_features
            ]
        model.transformer.saved_features = []
        model.transformer.init = True
        txf = model.encode_text(t_ids).float()
        txt_blocks = [
            f.permute(1, 0, 2).numpy()
            for f in model.transformer.saved_features
        ]
        scale = model.logit_scale.exp().item()
        imf_n = imf / imf.norm(dim=-1, keepdim=True)
        txf_n = txf / txf.norm(dim=-1, keepdim=True)
        logits = (scale * imf_n @ txf_n.t()).numpy()

    out = {
        "backbone": backbone,
        "weights_path": str(path),
        "images": images.astype(np.float32),
        "ids": ids.astype(np.int32),
        "text_features": txf.numpy(),
        "image_features": imf.numpy(),
        "logits_per_image": logits,
        "logit_scale": np.float32(scale),
    }
    for i, b in enumerate(txt_blocks):
        out[f"text_block_{i}"] = b
    for i, b in enumerate(vis_blocks):
        out[f"vis_block_{i}"] = b
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backbone", default="ViT-B/16")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-images", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    goldens = build_goldens(args.backbone, args.n_images, args.seed)
    if goldens is None:
        print(
            f"No CLIP weights on disk for {args.backbone} "
            "(see find_clip_weights search order); nothing to do."
        )
        return 1
    out = args.out or f"goldens_{args.backbone.replace('/', '-')}.npz"
    np.savez_compressed(out, **goldens)
    print(f"Wrote {out}: " + ", ".join(sorted(goldens)))
    print("Replay check: FSVLM_GOLDENS=%s python -m pytest "
          "tests/test_golden_weights.py -v" % out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Interpret learned context vectors as nearest vocabulary tokens.

Parity target: PromptSRC/interpret_prompts/interpret_prompt.py:1-83 — load a
trained prompt checkpoint, compute Euclidean distances from each ctx vector
to every token embedding, and print the top-k nearest words.

Usage:
    python tools/interpret_prompt.py <checkpoint.pkl> --backbone ViT-B/16 --topk 4
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsvlm_tpu.models.clip import ARCHS
from fsvlm_tpu.models.clip.convert import random_clip_params
from fsvlm_tpu.models.clip.tokenizer import get_tokenizer
from fsvlm_tpu.trainers.backbone import find_clip_weights


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="trainer checkpoint (model.pkl-*)")
    p.add_argument("--backbone", default="ViT-B/16")
    p.add_argument("--topk", type=int, default=4)
    args = p.parse_args()

    with open(args.checkpoint, "rb") as f:
        ckpt = pickle.load(f)
    state = ckpt["state_dict"]
    ctx = np.asarray(state["ctx"])
    if ctx.ndim == 3:  # class-specific: interpret the mean context
        # (reference raises NotImplementedError here, interpret_prompt.py:80)
        ctx = ctx.mean(axis=0)
    print(f"Size of context: {ctx.shape}")

    # MaPLe/IVLP checkpoints also carry per-layer deep text prompts — the
    # reference walks prompt_learner.compound_prompts_text.<i>
    # (interpret_prompt.py:50-62); here they are a stacked (depth-1, n, D)
    # leaf or a list of per-layer arrays
    layer_ctx = [("input", ctx)]
    deep = state.get("compound_text", state.get("text_deep"))
    if deep is not None:
        deep = [np.asarray(d) for d in deep] if isinstance(deep, (list, tuple)) \
            else list(np.asarray(deep))
        layer_ctx += [(f"layer {i + 2}", d) for i, d in enumerate(deep)]

    path = find_clip_weights(args.backbone)
    if path is not None:
        from fsvlm_tpu.models.clip.convert import load_openai_checkpoint

        clip_params, _ = load_openai_checkpoint(path)
    else:
        print("(no pretrained weights found; using random embedding table)")
        clip_params = random_clip_params(ARCHS[args.backbone], seed=0)
    token_embedding = np.asarray(clip_params["text"]["token_embedding"])

    tok = get_tokenizer()
    # Euclidean distance from each ctx vector to every token embedding
    for name, vectors in layer_ctx:
        if len(layer_ctx) > 1:
            print(f"== {name} context ==")
        for i, vec in enumerate(np.asarray(vectors)):
            dist = np.linalg.norm(token_embedding - vec[None, :], axis=1)
            idxs = np.argsort(dist)[: args.topk]
            words = [(tok.decoder.get(int(j), "?"), float(dist[j])) for j in idxs]
            pretty = ", ".join(f"{w!r} ({d:.3f})" for w, d in words)
            print(f"ctx[{i}]: {pretty}")


if __name__ == "__main__":
    main()

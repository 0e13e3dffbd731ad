#!/usr/bin/env python
"""lpclip: CLIP feature extraction + sklearn logistic-regression linear probe.

Parity target: PromptSRC/lpclip/ —
- feat_extractor.py:105-167: run the frozen image tower over train/val/test
  and dump features + labels to .npz per split;
- linear_probe.py:53-118: few-shot LogisticRegression with the 2-stage
  binary hyperparameter search over the inverse regularization strength C
  (coarse log sweep, then bisection between the best neighbors).

Usage:
    python tools/lpclip.py --root $DATA --dataset-config-file \
        configs/datasets/caltech101.yaml --backbone ViT-B/16 \
        --num-shots 16 --seed 1 --output-dir /tmp/lpclip
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.data import DataManager
from fsvlm_tpu.models.clip import encode_image
from fsvlm_tpu.trainers.backbone import load_clip_backbone
import fsvlm_tpu.data  # noqa: F401


def extract_split(loader, clip_params, clip_cfg, batch_limit=None):
    import jax

    feats, labels = [], []
    eval_fn = jax.jit(lambda imgs: encode_image(clip_params, clip_cfg, imgs))
    for bi, batch in enumerate(loader):
        valid = batch["valid"]
        f = np.asarray(eval_fn(batch["img"]))
        feats.append(f[valid])
        labels.append(batch["label"][valid])
        if batch_limit and bi + 1 >= batch_limit:
            break
    return np.concatenate(feats), np.concatenate(labels)


def search_logreg(train_f, train_y, val_f, val_y, max_iter=1000):
    """2-stage C search (linear_probe.py:53-118)."""
    from sklearn.linear_model import LogisticRegression

    def fit_eval(c):
        clf = LogisticRegression(C=c, max_iter=max_iter)
        clf.fit(train_f, train_y)
        return clf.score(val_f, val_y), clf

    # stage 1: coarse sweep over powers of 10
    cs = [10 ** k for k in range(-6, 7, 2)]
    scores = []
    for c in cs:
        acc, _ = fit_eval(c)
        scores.append(acc)
        print(f"C={c:g}: val acc {acc*100:.2f}%")
    best = int(np.argmax(scores))

    # stage 2: the reference's two-endpoint bracket contraction
    # (lpclip/linear_probe.py:64-92): evaluate BOTH bracket endpoints each
    # round, keep the better one, and move the worse endpoint to the log
    # midpoint — so the search can climb on either side of the coarse best.
    lo = cs[max(best - 1, 0)]
    hi = cs[min(best + 1, len(cs) - 1)]
    best_c, best_acc = cs[best], scores[best]
    memo = {}

    def eval_c(c):
        if c not in memo:
            memo[c], _ = fit_eval(c)
            print(f"C={c:g}: val acc {memo[c]*100:.2f}%")
        return memo[c]

    for _ in range(8):
        acc_lo, acc_hi = eval_c(lo), eval_c(hi)
        mid = 10 ** ((np.log10(lo) + np.log10(hi)) / 2)
        if acc_lo < acc_hi:
            if acc_hi > best_acc:
                best_acc, best_c = acc_hi, hi
            lo = mid
        else:
            if acc_lo > best_acc:
                best_acc, best_c = acc_lo, lo
            hi = mid
        if hi / lo < 1.1:
            break
    return best_c


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--dataset-config-file", required=True)
    p.add_argument("--backbone", default="RN50")
    p.add_argument("--num-shots", type=int, default=16)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--output-dir", default="./lpclip_out")
    args = p.parse_args()

    cfg = get_cfg_default()
    cfg.merge_from_file(args.dataset_config_file)
    cfg.DATASET.ROOT = args.root
    cfg.DATASET.NUM_SHOTS = args.num_shots
    cfg.SEED = args.seed
    cfg.MODEL.BACKBONE.NAME = args.backbone
    from fsvlm_tpu.models.clip import ARCHS

    res = ARCHS[args.backbone].image_resolution
    cfg.INPUT.SIZE = (res, res)
    cfg.INPUT.TRANSFORMS = ["normalize"]
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.freeze()

    os.makedirs(args.output_dir, exist_ok=True)
    dm = DataManager(cfg)
    clip_params, clip_cfg = load_clip_backbone(cfg)

    splits = {}
    for name, loader in [
        ("train", dm.train_loader_x),
        ("val", dm.val_loader),
        ("test", dm.test_loader),
    ]:
        f, y = extract_split(loader, clip_params, clip_cfg)
        np.savez(os.path.join(args.output_dir, f"{name}.npz"), feature_list=f, label_list=y)
        print(f"{name}: features {f.shape}")
        splits[name] = (f, y)

    best_c = search_logreg(*splits["train"], *splits["val"])
    print(f"Best C: {best_c:g}")

    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(C=best_c, max_iter=1000)
    train_f = np.concatenate([splits["train"][0], splits["val"][0]])
    train_y = np.concatenate([splits["train"][1], splits["val"][1]])
    clf.fit(train_f, train_y)
    acc = clf.score(*splits["test"]) * 100.0
    print(f"=> result\n* accuracy: {acc:.1f}%")


if __name__ == "__main__":
    main()

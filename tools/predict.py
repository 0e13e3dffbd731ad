#!/usr/bin/env python
"""Classify arbitrary image files with a trained fsvlm model.

Deployment gap the reference leaves open: its only inference surface is
``train.py --eval-only`` over a *registered dataset split*
(PromptSRC/train.py:117-125) — there is no way to point a trained model at
a directory of images.  This CLI serves exactly that: same config plumbing
as train.py, same checkpoint loader, same deterministic eval transform
(resize -> center crop -> normalize), then the trainer's compiled serving
step (``logits_fn``) over fixed-shape padded batches.

Usage (flags are train.py's, plus the predict-specific ones):
  python tools/predict.py \
      --config-file configs/trainers/PromptSRC/vit_b16_c2_ep20_batch4_4+4ctx.yaml \
      --dataset-config-file configs/datasets/oxford_pets.yaml --root $DATA \
      --model-dir output/run1 [--load-epoch N] \
      --images photo.jpg some_dir/ [--topk 5] [--pred-batch 64] \
      [--out preds.jsonl] [opts...]

Leave --model-dir empty with ``--trainer ZeroshotCLIP`` for zero-shot
serving.  MODEL.QUANT_INT8 True serves the int8 image tower.  Output is
one JSON object per line: {"path", "topk": [{"label", "prob"}, ...]}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm", ".tif", ".tiff"}


def collect_images(specs):
    paths = []
    for spec in specs:
        if os.path.isdir(spec):
            for dirpath, _, names in sorted(os.walk(spec)):
                for n in sorted(names):
                    if os.path.splitext(n)[1].lower() in IMG_EXTS:
                        paths.append(os.path.join(dirpath, n))
        elif os.path.isfile(spec):
            paths.append(spec)
        else:
            raise FileNotFoundError(f"--images entry not found: {spec}")
    if not paths:
        raise ValueError("no images found under --images")
    return paths


def predict(trainer, cfg, paths, topk=5, pred_batch=64):
    """Yield (path, [(classname, prob), ...]) for every image path."""
    import numpy as np

    from fsvlm_tpu.data.loader import _decode
    from fsvlm_tpu.data.transforms import TestTransform

    tf = TestTransform(cfg)
    lab2cname = trainer.dm.lab2cname
    n_cls = len(lab2cname)
    k = min(topk, n_cls)

    # cached class text features (mirrors SimpleTrainer.test): the text
    # tower runs once for the whole run, not once per batch
    cached_txf = None
    if trainer._text_step is not None:
        cached_txf = trainer._text_step(trainer.params, trainer.frozen)

    B = min(pred_batch, len(paths))
    for start in range(0, len(paths), B):
        chunk = paths[start:start + B]
        imgs = np.stack([tf(_decode(p)) for p in chunk])
        if len(chunk) < B:  # pad to the compiled batch shape
            pad = np.broadcast_to(imgs[-1:], (B - len(chunk),) + imgs.shape[1:])
            imgs = np.concatenate([imgs, pad], 0)
        batch = trainer.parse_batch_test({
            "img": imgs,
            "valid": np.ones(B, bool),
            "label": np.zeros(B, np.int64),
        })
        if cached_txf is not None:
            logits = np.asarray(trainer._eval_with_txf(
                trainer.params, trainer._get_frozen_eval(),
                batch["img"], cached_txf))
        else:
            logits = np.asarray(trainer.model_inference(batch["img"]))
        logits = logits[:len(chunk)].astype(np.float64)
        probs = np.exp(logits - logits.max(1, keepdims=True))
        probs /= probs.sum(1, keepdims=True)
        top = np.argsort(-probs, axis=1)[:, :k]
        for p, row, pr in zip(chunk, top, probs):
            yield p, [(lab2cname[int(c)], float(pr[int(c)])) for c in row]


def main(args):
    import train as train_cli

    cfg = train_cli.setup_cfg(args)
    paths = collect_images(args.images)

    from fsvlm_tpu.engine.trainer import build_trainer

    trainer = build_trainer(cfg)
    trainer.load_model(args.model_dir, epoch=args.load_epoch)

    out = open(args.out, "w") if args.out else sys.stdout
    try:
        for path, tk in predict(trainer, cfg, paths,
                                topk=args.topk, pred_batch=args.pred_batch):
            out.write(json.dumps({
                "path": path,
                "topk": [{"label": l, "prob": round(p, 6)} for l, p in tk],
            }) + "\n")
    finally:
        if args.out:
            out.close()
            print(f"wrote {len(paths)} predictions to {args.out}")


def build_argparser():
    import train as train_cli

    parser = train_cli.build_argparser()
    parser.description = __doc__
    parser.add_argument("--images", type=str, nargs="+", required=True,
                        help="image files and/or directories (recursive)")
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--pred-batch", type=int, default=64,
                        help="serving batch size (one compiled shape)")
    parser.add_argument("--out", type=str, default="",
                        help="write JSONL here instead of stdout")
    return parser


if __name__ == "__main__":
    main(build_argparser().parse_args())

#!/usr/bin/env python
"""Convert a reference-trained torch prompt checkpoint to fsvlm format.

Reads a dassl ``model.pth.tar-<E>`` / ``model-best.pth.tar`` produced by the
reference (incl. the published PromptSRC/MaPLe model-zoo files) and writes an
fsvlm checkpoint that ``train.py --eval-only --model-dir <out>
[--load-epoch E]`` loads unchanged — migration path for existing trained
prompts (reference save format: dassl torchtools.py:27-74).

Usage:
    python tools/import_torch_prompts.py path/to/model.pth.tar-20 \
        --trainer PromptSRC --output-dir output/imported [--best]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsvlm_tpu.engine.checkpoint import save_checkpoint
from fsvlm_tpu.trainers.import_torch import MODEL_NAMES, import_torch_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="reference model.pth.tar-<E> / LoRA best.pt file"
                   " (with --export: an fsvlm model.pkl-<E> file)")
    p.add_argument(
        "--export", metavar="OUT.pth.tar",
        help="reverse direction: convert an fsvlm model.pkl-* checkpoint to "
             "a reference-keyed torch file its load_model accepts",
    )
    p.add_argument(
        "--trainer", required=True, choices=sorted(MODEL_NAMES) + ["LoRA"]
    )
    p.add_argument("--output-dir", help="import destination (required unless --export)")
    p.add_argument(
        "--best",
        action="store_true",
        help="also write model-best.pkl (what --eval-only loads by default)",
    )
    p.add_argument("--backbone", default="ViT-B/16",
                   help="LoRA only: arch whose layer table sizes the stacks")
    p.add_argument("--dataset", default=None,
                   help="LoRA only: DATASET.NAME for the output layout "
                        "<out>/<dataset>/<backbone>/lora/best.pkl")
    args = p.parse_args()

    if args.export:
        from fsvlm_tpu.trainers.import_torch import export_torch_checkpoint

        if args.trainer == "LoRA":
            p.error("--export supports the prompt families, not LoRA")
        sd = export_torch_checkpoint(args.checkpoint, args.trainer, args.export)
        print(f"Exported {len(sd)} reference-keyed tensors -> {args.export}")
        return

    if not args.output_dir:
        p.error("--output-dir is required (unless --export is given)")

    if args.trainer == "LoRA":
        import pickle

        from fsvlm_tpu.trainers.import_torch import import_lora_checkpoint

        if not args.dataset:
            p.error("--dataset is required for --trainer LoRA")
        payload = import_lora_checkpoint(args.checkpoint, args.backbone)
        save_dir = os.path.join(
            args.output_dir, args.dataset, args.backbone.replace("/", "-"), "lora"
        )
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, "best.pkl")
        with open(out, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"Imported LoRA factors ({payload['metadata']}) -> {out}")
        return

    params, epoch, val_result = import_torch_checkpoint(args.checkpoint, args.trainer)
    leaves = {k: getattr(v, "shape", ()) for k, v in params.items()}
    print(f"Imported {args.trainer} prompt leaves: {leaves} (epoch {epoch})")

    save_dir = os.path.join(args.output_dir, MODEL_NAMES[args.trainer])
    state = {
        "state_dict": params,
        # fsvlm checkpoints store epoch as completed-count (same convention
        # as the reference: torchtools.py saves epoch+1 via trainer.py)
        "epoch": epoch,
        "optimizer": None,
        "val_result": val_result,
    }
    save_checkpoint(state, save_dir, is_best=args.best)
    print(f"Load with: --model-dir {args.output_dir} --load-epoch {epoch} --eval-only")


if __name__ == "__main__":
    main()

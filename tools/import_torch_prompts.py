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
    p.add_argument("checkpoint", help="reference model.pth.tar-<E> file")
    p.add_argument("--trainer", required=True, choices=sorted(MODEL_NAMES))
    p.add_argument("--output-dir", required=True)
    p.add_argument(
        "--best",
        action="store_true",
        help="also write model-best.pkl (what --eval-only loads by default)",
    )
    args = p.parse_args()

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

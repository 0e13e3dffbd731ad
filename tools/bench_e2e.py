#!/usr/bin/env python
"""End-to-end training-loop benchmark: input pipeline + fused device aug +
train step, through the real trainer (not an isolated step).

BENCH_ARCH=test-tiny works on CPU; on TPU run with the default ViT-B/16.
Prints one JSON line {metric, value, unit}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCH = os.environ.get("BENCH_ARCH", "ViT-B/16")
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", "3"))
SHOTS = int(os.environ.get("BENCH_SHOTS", "16"))
# BENCH_TRAINER: any CLIP-path trainer (CoOp / CoCoOp / MaPLe / PromptSRC);
# BENCH_CLASSES widens the synthetic label space (CoCoOp cost is
# B x n_cls text forwards, so 8 classes would flatter it)
TRAINER = os.environ.get("BENCH_TRAINER", "PromptSRC")
N_CLASSES = int(os.environ.get("BENCH_CLASSES", "0"))


def main():
    import jax
    from fsvlm_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from fsvlm_tpu.config import get_cfg_default
    from fsvlm_tpu.engine import build_trainer
    import fsvlm_tpu.trainers  # noqa: F401

    img = 224 if ARCH.startswith(("ViT", "RN")) else 32
    cfg = get_cfg_default()
    cfg.SEED = 0
    cfg.VERBOSE = False
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = SHOTS
    cfg.INPUT.SIZE = (img, img)
    cfg.INPUT.TRANSFORMS = ["random_resized_crop", "random_flip", "normalize"]
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.MODEL.BACKBONE.NAME = ARCH
    cfg.MODEL.BACKBONE.PRETRAINED = False
    if N_CLASSES > 0:
        from fsvlm_tpu.data.datasets.synthetic import Synthetic

        Synthetic.NUM_CLASSES = N_CLASSES
    cfg.MODEL.FROZEN_DTYPE = os.environ.get("BENCH_FROZEN_DTYPE", "fp32")
    cfg.TRAINER.NAME = TRAINER
    node = cfg.TRAINER[TRAINER.upper()]
    node.PREC = "bf16" if jax.default_backend() != "cpu" else "fp32"
    # BENCH_CACHED_TEACHER=1 measures the shipped fast-SCL config
    # (TRAINER.PROMPTSRC.CACHED_TEACHER: per-epoch teacher features)
    cfg.TRAINER.PROMPTSRC.CACHED_TEACHER = (
        os.environ.get("BENCH_CACHED_TEACHER", "0") == "1"
    )
    # BENCH_INT8_TEACHER=1 measures the W8A8 frozen-teacher config
    # (TRAINER.PROMPTSRC.INT8_TEACHER: int8 GEMMs for the zero-shot tower)
    cfg.TRAINER.PROMPTSRC.INT8_TEACHER = (
        os.environ.get("BENCH_INT8_TEACHER", "0") == "1"
    )
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = BATCH
    cfg.DATALOADER.TEST.BATCH_SIZE = BATCH
    cfg.DATALOADER.DEVICE_AUG = True
    cfg.DATALOADER.PRE_SIZE = max(img + 32, 96)
    cfg.OPTIM.MAX_EPOCH = EPOCHS + 1
    cfg.TEST.NO_TEST = True
    cfg.TRAIN.PRINT_FREQ = 10 ** 9
    # build each epoch's index schedule on device (permute a resident index
    # buffer with the epoch key): the fused epoch then ships ONE PRNG key
    # per epoch instead of a host-stacked schedule (BENCH_DEVICE_SCHEDULE=off
    # reproduces the round-2 host-schedule path)
    cfg.TRAIN.DEVICE_SCHEDULE = os.environ.get("BENCH_DEVICE_SCHEDULE", "on") != "off"
    cfg.TRAIN.REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
    # BENCH_EPOCH_FUSE=off: per-step dispatch.  The fused whole-epoch scan
    # is ONE device program; at CoCoOp-500 scale (250 steps x ~1s/step)
    # that single execution exceeds what the TPU worker survives (observed:
    # worker crash), so the giant-trainer lanes run per-step.
    cfg.TRAIN.EPOCH_FUSE = os.environ.get("BENCH_EPOCH_FUSE", "auto")
    # CoCoOp at ImageNet-base scale: BENCH_CLASS_CHUNK forces the
    # class-chunked text scan (0 = auto past BATCHED_TEXT_LIMIT)
    cfg.TRAINER.COCOOP.CLASS_CHUNK = int(
        os.environ.get("BENCH_CLASS_CHUNK", "0"))
    cfg.freeze()

    trainer = build_trainer(cfg)
    n_imgs = len(trainer.dm.dataset.train_x)

    # epoch 0: compile + cold decode
    trainer.epoch = 0
    t0 = time.time()
    trainer.run_epoch()
    print(f"# epoch0 (compile+decode): {time.time()-t0:.1f}s", file=sys.stderr)

    steps = len(trainer.train_loader_x)
    t0 = time.time()
    for e in range(1, EPOCHS + 1):
        trainer.epoch = e
        trainer.run_epoch()
    # force completion of the last dispatched step
    jax.tree.map(lambda x: x.block_until_ready(), trainer.params)
    dt = time.time() - t0
    imgs = steps * BATCH * EPOCHS
    print(
        json.dumps(
            {
                "metric": f"{TRAINER} {ARCH} end-to-end train loop (input+aug+step)"
                + (", cached teacher" if cfg.TRAINER.PROMPTSRC.CACHED_TEACHER else ""),
                "value": round(imgs / dt, 2),
                "unit": "images/sec/chip",
            }
        )
    )


if __name__ == "__main__":
    main()

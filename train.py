#!/usr/bin/env python
"""Experiment driver CLI.

Command-line surface parity with the reference (PromptSRC/train.py:221-440):

    python train.py --root $DATA --trainer PromptSRC \
        --dataset-config-file configs/datasets/caltech101.yaml \
        --config-file configs/trainers/PromptSRC/vit_b16_c2_ep20_batch4_4+4ctx.yaml \
        --output-dir output/... [--eval-only --model-dir ... --load-epoch N] [opts...]

Includes the fork's post-eval classification report and base/new accuracy
split keyed by per-dataset base-class counts (train.py:259-271,330-376), and
the SimCLR two-view loader override when SIMCLR_ALPHA > 0 (train.py:296-321).

Divergence: no hard exit() after training (train.py:379-381 fork quirk).
"""

import argparse
import os
import sys

import numpy as np

from fsvlm_tpu.config import get_cfg_default
from fsvlm_tpu.engine import build_trainer
from fsvlm_tpu.utils import collect_env_info, set_random_seed, setup_logger
import fsvlm_tpu.trainers  # noqa: F401  (populate TRAINER_REGISTRY)
import fsvlm_tpu.data  # noqa: F401  (populate DATASET_REGISTRY)

# per-dataset base-class counts for the base/new accuracy split when
# evaluating with SUBSAMPLE_CLASSES=all (reference train.py:259-271)
DATASET_NAME_TO_BASECOUNT = {
    "DescribableTextures": 24,
    "OxfordPets": 19,
    "OxfordFlowers": 51,
    "FGVCAircraft": 50,
    # documented divergence: the reference table says 51 (train.py:264),
    # but Caltech101 has 100 classes after the two ignored folders, so the
    # base half is ceil(100/2) = 50 — the reference's own base/new
    # subsample (SUBSAMPLE_CLASSES=base) trains on 50; 51 would misbucket
    # the first new class in the report
    "Caltech101": 50,
    "Food101": 51,
    "UCF101": 51,
    "StanfordCars": 98,
    "SUN397": 199,
    "EuroSAT": 5,
    "ImageNet": 500,
}


def reset_cfg(cfg, args):
    """Named CLI flags -> cfg (reference train.py:53-85)."""
    if args.root:
        cfg.DATASET.ROOT = args.root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.resume:
        cfg.RESUME = args.resume
    if args.seed is not None:
        cfg.SEED = args.seed
    if args.source_domains:
        cfg.DATASET.SOURCE_DOMAINS = args.source_domains
    if args.target_domains:
        cfg.DATASET.TARGET_DOMAINS = args.target_domains
    if args.transforms:
        cfg.INPUT.TRANSFORMS = args.transforms
    if args.trainer:
        cfg.TRAINER.NAME = args.trainer
    if args.backbone:
        cfg.MODEL.BACKBONE.NAME = args.backbone
    if args.head:
        cfg.MODEL.HEAD.NAME = args.head


def setup_cfg(args):
    cfg = get_cfg_default()
    if args.dataset_config_file:
        cfg.merge_from_file(args.dataset_config_file)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    reset_cfg(cfg, args)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # FSVLM_EXTRA_OPTS: space-separated KEY VALUE pairs appended after all
    # CLI opts — lets the stock scripts/ drivers (which take positional
    # dataset/seed args only, like the reference's) be re-pointed at other
    # batch sizes / backbones / offline mode without editing them, e.g.
    #   FSVLM_EXTRA_OPTS="MODEL.BACKBONE.PRETRAINED False" bash scripts/...
    extra = os.environ.get("FSVLM_EXTRA_OPTS", "").strip()
    if extra:
        import shlex

        cfg.merge_from_list(shlex.split(extra))
    cfg.freeze()
    return cfg


def print_args(args, cfg):
    print("***************")
    print("** Arguments **")
    print("***************")
    for key in sorted(vars(args)):
        print(f"{key}: {getattr(args, key)}")
    print("************")
    print("** Config **")
    print("************")
    print(cfg)


def report(y_true, y_pred, base_label_count):
    from sklearn.metrics import classification_report

    print("\n===========================")
    print("Classification Report")
    print("===========================")
    print(classification_report(y_true, y_pred, zero_division=0))

    if base_label_count > 0:
        y_true = np.asarray(y_true)
        y_pred = np.asarray(y_pred)
        base_mask = y_true < base_label_count
        new_mask = ~base_mask
        for name, mask in [("Base", base_mask), ("New ", new_mask)]:
            total = int(mask.sum())
            correct = int((y_pred[mask] == y_true[mask]).sum())
            acc = 100.0 * correct / total if total else 0.0
            print(f"{name} class accuracy: {acc:.2f}% ({correct}/{total})")


def maybe_override_simclr_loader(cfg, trainer):
    """Two-view SimCLR loader override (reference train.py:296-321)."""
    alphas = []
    for node_name in ("PROMPTSRC", "IVLP"):
        node = cfg.TRAINER.get(node_name)
        if node is not None:
            alphas.append(float(node.get("SIMCLR_ALPHA", 0.0)))
    loss_types = [
        str(cfg.TRAINER.get(n, {}).get("LOSS_TYPE", "")) for n in ("COOP", "PROMPTSRC")
    ]
    if not (any(a > 0 for a in alphas) or "simclr" in loss_types):
        return
    if cfg.DATALOADER.DEVICE_AUG:
        # the jitted step was compiled with the device-side crop/flip/
        # normalize baked in (engine/trainer.py _compile_steps), which
        # expects raw-uint8 batches — the SimCLR loader feeds transformed,
        # normalized float views, so the combination silently corrupts
        # pixels.  Fail loudly.
        raise ValueError(
            "SimCLR objectives require the host transform pipeline: unset "
            "DATALOADER.DEVICE_AUG (the two-view loader feeds normalized "
            "float views that the device-fused augment would re-normalize)"
        )
    from fsvlm_tpu.trainers.simclr_utils import make_simclr_loader

    print(">> SimCLR objective active => overriding train_loader_x with a two-view loader!")
    trainer.train_loader_x = make_simclr_loader(cfg, trainer.dm.dataset.train_x)


def main(args):
    # multi-host (DCN) slices: initialize the JAX distributed runtime when
    # launched under a multi-process TPU env (SURVEY.md §5.8 — the reference
    # has no multi-node path at all; here it falls out of the same SPMD step)
    if os.environ.get("FSVLM_MULTIHOST") == "1":
        import jax

        coord = os.environ.get("FSVLM_COORDINATOR")
        if coord:
            # manual rendezvous (CPU clusters / tests): FSVLM_COORDINATOR=
            # host:port, FSVLM_NUM_PROCESSES, FSVLM_PROCESS_ID; gloo backs
            # the collectives on CPU.  (Env check only — touching
            # jax.default_backend() here would initialize the backend
            # before the cluster is formed.)
            if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
                # push the env choice over the axon sitecustomize before the
                # backend initializes
                jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            jax.distributed.initialize(
                coord,
                num_processes=int(os.environ["FSVLM_NUM_PROCESSES"]),
                process_id=int(os.environ["FSVLM_PROCESS_ID"]),
                # rendezvous can be slow on a saturated host (concurrent
                # XLA compiles starve the coordinator thread); default is
                # 300s — allow an override and a generous floor
                initialization_timeout=int(
                    os.environ.get("FSVLM_INIT_TIMEOUT", "600")
                ),
            )
        else:
            jax.distributed.initialize()  # TPU pod: auto-detected

    # persistent XLA compile cache — first full-model TPU compile is minutes;
    # every later run with the same shapes is instant
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    cfg = setup_cfg(args)
    if cfg.SEED >= 0:
        print(f"Setting fixed seed: {cfg.SEED}")
        set_random_seed(cfg.SEED)
    setup_logger(cfg.OUTPUT_DIR)

    print_args(args, cfg)
    print("Collecting env info ...")
    print(f"** System info **\n{collect_env_info()}\n")

    base_label_count = DATASET_NAME_TO_BASECOUNT.get(cfg.DATASET.NAME, 0)
    if cfg.DATASET.SUBSAMPLE_CLASSES != "all":
        base_label_count = 0  # split report only meaningful on the full label set

    trainer = build_trainer(cfg)
    maybe_override_simclr_loader(cfg, trainer)

    if args.eval_only:
        trainer.load_model(args.model_dir, epoch=args.load_epoch)
        y_true, y_pred = trainer.test(return_pred=True)
        report(y_true, y_pred, base_label_count)
        return

    if not args.no_train:
        trainer.train()
        print(">>> Evaluating on the test set right after training...")
        y_true, y_pred = trainer.test(return_pred=True)
        report(y_true, y_pred, base_label_count)


def build_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="", help="path to dataset root")
    parser.add_argument("--output-dir", type=str, default="", help="output directory")
    parser.add_argument("--resume", type=str, default="", help="output directory of the run to resume (contains <model-name>/checkpoint)")
    parser.add_argument("--seed", type=int, default=-1, help="only positive value enables a fixed seed")
    parser.add_argument("--config-file", type=str, default="", help="path to trainer config file")
    parser.add_argument("--dataset-config-file", type=str, default="", help="path to dataset config file")
    parser.add_argument("--trainer", type=str, default="", help="name of trainer")
    parser.add_argument("--backbone", type=str, default="", help="name of CLIP backbone")
    parser.add_argument("--head", type=str, default="", help="name of head")
    parser.add_argument("--source-domains", type=str, nargs="+",
                        help="source domains for DA/DG")
    parser.add_argument("--target-domains", type=str, nargs="+",
                        help="target domains for DA/DG")
    parser.add_argument("--transforms", type=str, nargs="+", help="data augmentation methods")
    parser.add_argument("--eval-only", action="store_true", help="evaluation only")
    parser.add_argument("--model-dir", type=str, default="", help="load model for eval-only from this directory")
    parser.add_argument("--load-epoch", type=int, default=None, help="load model weights at this epoch for evaluation")
    parser.add_argument("--no-train", action="store_true", help="do not call trainer.train()")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="modify config options using the command-line")
    return parser


if __name__ == "__main__":
    main(build_argparser().parse_args())

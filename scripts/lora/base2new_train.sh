#!/bin/bash
# LoRA base-to-novel training on the base class half.
# usage: bash scripts/lora/base2new_train.sh <dataset> <seed> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; CFG=${3:-${CFG:-vit_b16_ep10_batch32}}; DATA=${4:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/base2new/train_base/${DATASET}/shots_16/LoRA/${CFG}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer LoRA \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/LoRA/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS 16 DATASET.SUBSAMPLE_CLASSES base

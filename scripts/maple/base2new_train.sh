#!/bin/bash
# MaPLe base-to-novel training on the base class half.
# usage: bash scripts/maple/base2new_train.sh <dataset> <seed> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; CFG=${3:-${CFG:-vit_b16_t1_d9_ep5_batch4_2ctx}}; DATA=${4:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/base2new/train_base/${DATASET}/shots_16/MaPLe/${CFG}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer MaPLe \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/MaPLe/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS 16 DATASET.SUBSAMPLE_CLASSES base

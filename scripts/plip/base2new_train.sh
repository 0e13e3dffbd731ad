#!/bin/bash
# PLIP base-to-novel training on the base class half.
# usage: bash scripts/plip/base2new_train.sh <dataset> <seed> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; CFG=${3:-${CFG:-vit_b16_c4_ep10_batch4}}; DATA=${4:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/base2new/train_base/${DATASET}/shots_16/PLIP/${CFG}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer PLIP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/PLIP/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS 16 DATASET.SUBSAMPLE_CLASSES base

#!/bin/bash
# Base-to-novel: train PromptSRC on the base half of the classes.
# Parity: reference scripts/promptsrc/base2new_train.sh
# usage: bash scripts/promptsrc/base2new_train.sh <dataset> <seed> [data_root]
cd "$(dirname "$0")/../.."

DATA=${3:-${DATA:-~/data}}
TRAINER=PromptSRC
DATASET=$1
SEED=$2

CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
SHOTS=16
SUB=base

DIR=${OUT_ROOT:-output}/base2new/train_${SUB}/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
if [ -d "$DIR" ]; then
    echo "Results already exist in ${DIR}. Resuming..."
fi

python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES ${SUB}

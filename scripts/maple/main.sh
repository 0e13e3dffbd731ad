#!/bin/bash
# MaPLe few-shot training (parity: reference scripts/maple/*.sh drivers).
# usage: bash scripts/maple/main.sh <dataset> <seed> <shots> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_t1_d9_ep5_batch4_2ctx}}; DATA=${5:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/${DATASET}/MaPLe/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer MaPLe \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/MaPLe/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

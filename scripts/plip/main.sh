#!/bin/bash
# PLIP few-shot training (parity: reference scripts/plip/*.sh drivers).
# usage: bash scripts/plip/main.sh <dataset> <seed> <shots> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_c4_ep10_batch4}}; DATA=${5:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/${DATASET}/PLIP/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer PLIP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/PLIP/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

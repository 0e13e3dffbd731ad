#!/bin/bash
# CoCoOp few-shot training (parity: reference scripts/cocoop/*.sh drivers).
# usage: bash scripts/cocoop/main.sh <dataset> <seed> <shots> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_c4_ep10_batch1_ctxv1}}; DATA=${5:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/${DATASET}/CoCoOp/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer CoCoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoCoOp/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

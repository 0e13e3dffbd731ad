#!/bin/bash
# LinearProbeCLIP few-shot training (parity: reference scripts/linear_probe/*.sh drivers).
# usage: bash scripts/linear_probe/main.sh <dataset> <seed> <shots> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_ep50}}; DATA=${5:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/${DATASET}/LinearProbeCLIP/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer LinearProbeCLIP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/LinearProbeCLIP/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

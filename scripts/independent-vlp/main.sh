#!/bin/bash
# IVLP few-shot training (parity: reference scripts/independent-vlp/*.sh drivers).
# usage: bash scripts/independent-vlp/main.sh <dataset> <seed> <shots> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_c2_ep5_batch4_2+2ctx}}; DATA=${5:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/${DATASET}/IVLP/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer IVLP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/IVLP/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

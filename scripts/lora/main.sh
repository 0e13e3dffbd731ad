#!/bin/bash
# LoRA few-shot training (parity: reference scripts/lora/*.sh drivers).
# usage: bash scripts/lora/main.sh <dataset> <seed> <shots> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_ep10_batch32}}; DATA=${5:-${DATA:-~/data}}
DIR=${OUT_ROOT:-output}/${DATASET}/LoRA/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer LoRA \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/LoRA/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

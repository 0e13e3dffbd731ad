#!/bin/bash
# Base-to-novel: evaluate a base-trained PromptSRC checkpoint on the novel half.
# Parity: reference scripts/promptsrc/base2new_test.sh
# usage: bash scripts/promptsrc/base2new_test.sh <dataset> <seed> [data_root]
cd "$(dirname "$0")/../.."

DATA=${3:-${DATA:-~/data}}
TRAINER=PromptSRC
DATASET=$1
SEED=$2

CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
SHOTS=16
LOADEP=${LOADEP:-20}
SUB=new

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
MODEL_DIR=${OUT_ROOT:-output}/base2new/train_base/${COMMON_DIR}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}

python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${DIR}" \
    --model-dir "${MODEL_DIR}" \
    --load-epoch ${LOADEP} \
    --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES ${SUB}

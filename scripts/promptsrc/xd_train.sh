#!/bin/bash
# Cross-dataset: train PromptSRC on ImageNet (all classes, 16 shots),
# then evaluate elsewhere with xd_test.sh.
# Parity: reference scripts/promptsrc/xd_train.sh
# usage: bash scripts/promptsrc/xd_train.sh <seed> [data_root]
cd "$(dirname "$0")/../.."

DATA=${2:-${DATA:-~/data}}
TRAINER=PromptSRC
SEED=$1
CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
SHOTS=16

DIR=${OUT_ROOT:-output}/imagenet/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED}
python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/imagenet.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS}

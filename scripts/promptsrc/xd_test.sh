#!/bin/bash
# Cross-dataset / domain-generalization evaluation of an ImageNet-trained
# PromptSRC checkpoint.  Parity: reference scripts/promptsrc/xd_test.sh
# usage: bash scripts/promptsrc/xd_test.sh <dataset> <seed> [data_root]
cd "$(dirname "$0")/../.."

DATA=${3:-${DATA:-~/data}}
TRAINER=PromptSRC
DATASET=$1
SEED=$2
CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
SHOTS=16
LOADEP=${LOADEP:-20}

DIR=${OUT_ROOT:-output}/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${DIR}" \
    --model-dir ${OUT_ROOT:-output}/imagenet/${TRAINER}/${CFG}_${SHOTS}shots/seed${SEED} \
    --load-epoch ${LOADEP} \
    --eval-only

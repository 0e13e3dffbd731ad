#!/bin/bash
# Zero-shot CLIP evaluation on a class subsample (base/new/all half) —
# the zero-shot rows of the base-to-novel tables.
# Parity: reference scripts/zsclip/zeroshot_sub.sh
# usage: bash scripts/zsclip/zeroshot_sub.sh <dataset> <sub> [seed] [shots] [data_root]
# env overrides: CFG, TRAINER (ZeroshotCLIP|ZeroshotCLIP2), BACKBONE
cd "$(dirname "$0")/../.."
DATASET=$1; SUB=$2; SEED=${3:-1}; SHOTS=${4:-16}; DATA=${5:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_ep50}
TRAINER=${TRAINER:-ZeroshotCLIP}
BACKBONE=${BACKBONE:-ViT-B/16}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoOp/${CFG}.yaml \
    --output-dir "${DIR}" --eval-only --no-train \
    MODEL.BACKBONE.NAME "${BACKBONE}" \
    DATASET.NUM_SHOTS ${SHOTS} DATASET.SUBSAMPLE_CLASSES ${SUB}

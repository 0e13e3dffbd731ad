#!/bin/bash
# Zero-shot CLIP evaluation (parity: scripts/zsclip/zeroshot.sh).
# usage: bash scripts/zsclip/zeroshot.sh <dataset> <backbone> [trainer] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; BACKBONE=${2:-ViT-B/16}; TRAINER=${3:-ZeroshotCLIP}; DATA=${4:-${DATA:-~/data}}
python train.py --root "${DATA}" --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoOp/vit_b16_ep50.yaml \
    --output-dir ${OUT_ROOT:-output}/${DATASET}/${TRAINER}/$(echo ${BACKBONE} | tr '/' '-') \
    --eval-only --no-train \
    MODEL.BACKBONE.NAME "${BACKBONE}"

#!/bin/bash
# Cross-dataset: train CoCoOp on ImageNet (all classes, 16 shots), then
# evaluate elsewhere with xd_test.sh.
# Parity: reference scripts/cocoop/xd_train*.sh
# usage: bash scripts/cocoop/xd_train.sh <seed> [data_root]
cd "$(dirname "$0")/../.."
SEED=$1; DATA=${2:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_c4_ep10_batch1_ctxv1}
SHOTS=16
DIR=${OUT_ROOT:-output}/imagenet/CoCoOp/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer CoCoOp \
    --dataset-config-file configs/datasets/imagenet.yaml \
    --config-file configs/trainers/CoCoOp/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

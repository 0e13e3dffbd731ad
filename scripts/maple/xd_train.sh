#!/bin/bash
# Cross-dataset: train MaPLe on ImageNet (all classes, 16 shots), then
# evaluate elsewhere with xd_test.sh.
# Parity: reference scripts/maple/xd_train*.sh
# usage: bash scripts/maple/xd_train.sh <seed> [data_root]
cd "$(dirname "$0")/../.."
SEED=$1; DATA=${2:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_c2_ep5_batch4_2ctx_cross_datasets}
SHOTS=16
DIR=${OUT_ROOT:-output}/imagenet/MaPLe/${CFG}_${SHOTS}shots/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer MaPLe \
    --dataset-config-file configs/datasets/imagenet.yaml \
    --config-file configs/trainers/MaPLe/${CFG}.yaml \
    --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS}

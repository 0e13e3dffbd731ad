#!/bin/bash
# Cross-dataset / domain-generalization evaluation of an ImageNet-trained
# MaPLe checkpoint.
# Parity: reference scripts/maple/xd_test*.sh
# usage: bash scripts/maple/xd_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; DATA=${3:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_c2_ep5_batch4_2ctx_cross_datasets}
LOADEP=${LOADEP:-2}
SHOTS=16
DIR=${OUT_ROOT:-output}/evaluation/MaPLe/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer MaPLe \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/MaPLe/${CFG}.yaml \
    --output-dir "${DIR}" \
    --model-dir ${OUT_ROOT:-output}/imagenet/MaPLe/${CFG}_${SHOTS}shots/seed${SEED} \
    --load-epoch ${LOADEP} --eval-only

#!/bin/bash
# Cross-dataset / domain-generalization evaluation of an ImageNet-trained
# CoCoOp checkpoint.
# Parity: reference scripts/cocoop/xd_test*.sh
# usage: bash scripts/cocoop/xd_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; DATA=${3:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_c4_ep10_batch1_ctxv1}
LOADEP=${LOADEP:-10}
SHOTS=16
DIR=${OUT_ROOT:-output}/evaluation/CoCoOp/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer CoCoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoCoOp/${CFG}.yaml \
    --output-dir "${DIR}" \
    --model-dir ${OUT_ROOT:-output}/imagenet/CoCoOp/${CFG}_${SHOTS}shots/seed${SEED} \
    --load-epoch ${LOADEP} --eval-only

#!/bin/bash
# Evaluate a linear probe trained by scripts/linear_probe/train.sh.
# Parity: reference scripts/linear_probe/test.sh.
# usage: bash scripts/linear_probe/test.sh <dataset> <backbone> <loss_type> \
#            <seed> [data_root]
# env: CFG, SHOTS, PER_CLASS_SHOTS, SUB (default all), TRAIN_SUB (default
#      all), LOADEP (default 50), OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; BACKBONE=$2; LOSS_TYPE=$3; SEED=$4
DATA=${5:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_ep50}; SHOTS=${SHOTS:-16}
PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
SUB=${SUB:-all}; TRAIN_SUB=${TRAIN_SUB:-all}; LOADEP=${LOADEP:-50}
BB_TAG=${BACKBONE//\//-}
COMMON_DIR=${DATASET}/shots_${SHOTS}/LinearProbeCLIP/${CFG}/${BB_TAG}_${LOSS_TYPE}/seed${SEED}
MODEL_DIR=${OUT_ROOT:-output}/base2new/train_${TRAIN_SUB}/${COMMON_DIR}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
echo "Evaluating model on '${SUB}' classes"
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer LinearProbeCLIP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/LinearProbeCLIP/${CFG}.yaml \
    --output-dir "${DIR}" --model-dir "${MODEL_DIR}" \
    --load-epoch ${LOADEP} --eval-only \
    MODEL.BACKBONE.NAME "${BACKBONE}" \
    TRAINER.LINEAR_PROBE.LOSS_TYPE ${LOSS_TYPE} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB}

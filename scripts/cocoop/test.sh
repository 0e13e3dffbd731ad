#!/bin/bash
# Evaluate a CoCoOp model trained by scripts/cocoop/train.sh.  Parity:
# reference scripts/cocoop/test.sh.
# usage: bash scripts/cocoop/test.sh <dataset> <seed> [cfg] [data_root]
# env: SHOTS, PER_CLASS_SHOTS, USE_FOCAL, SUB (default all),
#      TRAIN_SUB (default all), LOADEP (default 10), OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2
CFG=${3:-${CFG:-vit_b16_c4_ep10_batch1_ctxv1}}; DATA=${4:-${DATA:-~/data}}
SHOTS=${SHOTS:-16}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
SUB=${SUB:-all}; TRAIN_SUB=${TRAIN_SUB:-all}; LOADEP=${LOADEP:-10}
FOCAL=$([ "${USE_FOCAL:-0}" = 1 ] && echo True || echo False)
COMMON_DIR=${DATASET}/shots_${SHOTS}/CoCoOp/${CFG}/seed${SEED}
MODEL_DIR=${OUT_ROOT:-output}/base2new/train_${TRAIN_SUB}/${COMMON_DIR}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
echo "Evaluating model on '${SUB}' classes"
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer CoCoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoCoOp/${CFG}.yaml \
    --output-dir "${DIR}" --model-dir "${MODEL_DIR}" \
    --load-epoch ${LOADEP} --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    TRAINER.COCOOP.USE_FOCAL_LOSS ${FOCAL}

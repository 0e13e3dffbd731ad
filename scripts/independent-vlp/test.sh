#!/bin/bash
# Evaluate an IVLP model trained by scripts/independent-vlp/train.sh.
# Parity: reference scripts/independent-vlp/test.sh.
# usage: bash scripts/independent-vlp/test.sh <dataset> <seed> [cfg] [data_root]
# env: SHOTS, PER_CLASS_SHOTS, USE_FOCAL, SUB (default all),
#      TRAIN_SUB (default all), LOADEP (default 20), OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2
CFG=${3:-${CFG:-vit_b16_c2_ep20_batch4_4+4ctx_kd}}; DATA=${4:-${DATA:-~/data}}
SHOTS=${SHOTS:-16}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
SUB=${SUB:-all}; TRAIN_SUB=${TRAIN_SUB:-all}; LOADEP=${LOADEP:-20}
FOCAL=$([ "${USE_FOCAL:-0}" = 1 ] && echo True || echo False)
COMMON_DIR=${DATASET}/shots_${SHOTS}/IVLP/${CFG}/seed${SEED}
MODEL_DIR=${OUT_ROOT:-output}/base2new/train_${TRAIN_SUB}/${COMMON_DIR}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
echo "Evaluating model on '${SUB}' classes"
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer IVLP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/IVLP/${CFG}.yaml \
    --output-dir "${DIR}" --model-dir "${MODEL_DIR}" \
    --load-epoch ${LOADEP} --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    TRAINER.IVLP.USE_FOCAL_LOSS ${FOCAL}

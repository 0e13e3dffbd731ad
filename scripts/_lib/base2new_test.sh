#!/bin/bash
# Shared base-to-novel evaluation body.  Parity target: the per-trainer
# base2new_test*.sh family in the reference scripts/ tree (e.g.
# PromptSRC/scripts/cocoop/base2new_test.sh, maple/base2new_test_maple.sh).
# Callers set TRAINER, CFGDIR, CFG, LOADEP (+ optional TAG, EXTRA_OPTS,
# SHOTS, SUB, MODEL_DIR) and source this with <dataset> <seed> [data_root].
DATASET=$1
SEED=$2
DATA=${3:-${DATA:-~/data}}
SHOTS=${SHOTS:-16}
SUB=${SUB:-new}

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}${TAG}/seed${SEED}
MODEL_DIR=${MODEL_DIR:-${OUT_ROOT:-output}/base2new/train_base/${COMMON_DIR}}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}

python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer "${TRAINER}" \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${CFGDIR}/${CFG}.yaml \
    --output-dir "${DIR}" \
    --model-dir "${MODEL_DIR}" \
    --load-epoch "${LOADEP}" \
    --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES ${SUB} ${EXTRA_OPTS}

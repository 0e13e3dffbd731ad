#!/bin/bash
# CoCoOp imbalanced-protocol training (negative NUM_SHOTS + per-class shot
# list + WeightedClassSampler + optional focal loss).  Parity: reference
# scripts/cocoop/train.sh (its hardcoded constants are env overrides here).
# usage: bash scripts/cocoop/train.sh <dataset> <seed> [cfg] [data_root]
# env: SHOTS (negative flags the per-class list), PER_CLASS_SHOTS,
#      USE_FOCAL (0/1), SAMPLER, SUB (default all), OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2
CFG=${3:-${CFG:-vit_b16_c4_ep10_batch1_ctxv1}}; DATA=${4:-${DATA:-~/data}}
SHOTS=${SHOTS:-16}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
SAMPLER=${SAMPLER:-WeightedClassSampler}; SUB=${SUB:-all}
FOCAL=$([ "${USE_FOCAL:-0}" = 1 ] && echo True || echo False)
DIR=${OUT_ROOT:-output}/base2new/train_${SUB}/${DATASET}/shots_${SHOTS}/CoCoOp/${CFG}/seed${SEED}
echo "NUM_SHOTS=${SHOTS}, PER_CLASS_SHOTS=${PER_CLASS_SHOTS}, USE_FOCAL_LOSS=${FOCAL}"
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer CoCoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoCoOp/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    DATALOADER.TRAIN_X.SAMPLER ${SAMPLER} \
    TRAINER.COCOOP.USE_FOCAL_LOSS ${FOCAL}

#!/bin/bash
# MaPLe imbalanced-protocol training.  Parity: reference
# scripts/maple/train.sh (its hardcoded SHOTS=-121/per-class constants are
# env overrides here).
# usage: bash scripts/maple/train.sh <dataset> <seed> [cfg] [data_root]
# env: SHOTS, PER_CLASS_SHOTS, USE_FOCAL (0/1), SAMPLER, SUB (default all)
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2
CFG=${3:-${CFG:-vit_b16_c2_ep5_batch4_2ctx}}; DATA=${4:-${DATA:-~/data}}
SHOTS=${SHOTS:-16}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
SAMPLER=${SAMPLER:-WeightedClassSampler}; SUB=${SUB:-all}
FOCAL=$([ "${USE_FOCAL:-0}" = 1 ] && echo True || echo False)
DIR=${OUT_ROOT:-output}/base2new/train_${SUB}/${DATASET}/shots_${SHOTS}/MaPLe/${CFG}/seed${SEED}
[ -d "$DIR" ] && echo "Results already exist in ${DIR}. Resuming..."
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer MaPLe \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/MaPLe/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    DATALOADER.TRAIN_X.SAMPLER ${SAMPLER} \
    TRAINER.MAPLE.USE_FOCAL_LOSS ${FOCAL}

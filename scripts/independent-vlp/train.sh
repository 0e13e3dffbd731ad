#!/bin/bash
# IVLP imbalanced-protocol training.  Parity: reference
# scripts/independent-vlp/train.sh (incl. its TRAINER.PROMPTSRC.SIMCLR_ALPHA
# 0.0 override quirk; the hardcoded constants are env overrides here).
# usage: bash scripts/independent-vlp/train.sh <dataset> <seed> [cfg] [data_root]
# env: SHOTS, PER_CLASS_SHOTS, USE_FOCAL (0/1), SAMPLER, SUB, OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2
CFG=${3:-${CFG:-vit_b16_c2_ep20_batch4_4+4ctx_kd}}; DATA=${4:-${DATA:-~/data}}
SHOTS=${SHOTS:-16}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
SAMPLER=${SAMPLER:-WeightedClassSampler}; SUB=${SUB:-all}
FOCAL=$([ "${USE_FOCAL:-0}" = 1 ] && echo True || echo False)
DIR=${OUT_ROOT:-output}/base2new/train_${SUB}/${DATASET}/shots_${SHOTS}/IVLP/${CFG}/seed${SEED}
[ -d "$DIR" ] && echo "Results already exist in ${DIR}. Resuming..."
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer IVLP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/IVLP/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    DATALOADER.TRAIN_X.SAMPLER ${SAMPLER} \
    TRAINER.IVLP.USE_FOCAL_LOSS ${FOCAL} \
    TRAINER.PROMPTSRC.SIMCLR_ALPHA 0.0

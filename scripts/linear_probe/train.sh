#!/bin/bash
# Linear probe over frozen CLIP features, imbalanced protocol.  Parity:
# reference scripts/linear_probe/train.sh (same 5-positional interface; its
# hardcoded 50-head/50-tail shot list is the PER_CLASS_SHOTS env here).
# usage: bash scripts/linear_probe/train.sh <dataset> <backbone> <loss_type> \
#            <seed> [sampler] [data_root]
# env: CFG, SHOTS, PER_CLASS_SHOTS, SUB (default all), OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; BACKBONE=$2; LOSS_TYPE=$3; SEED=$4
SAMPLER=${5:-WeightedClassSampler}; DATA=${6:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_ep50}; SHOTS=${SHOTS:-16}
PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}; SUB=${SUB:-all}
BB_TAG=${BACKBONE//\//-}
DIR=${OUT_ROOT:-output}/base2new/train_${SUB}/${DATASET}/shots_${SHOTS}/LinearProbeCLIP/${CFG}/${BB_TAG}_${LOSS_TYPE}/seed${SEED}
[ -d "$DIR" ] && echo "Results already exist in ${DIR}. Resuming..."
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer LinearProbeCLIP \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/LinearProbeCLIP/${CFG}.yaml \
    --output-dir "${DIR}" \
    MODEL.BACKBONE.NAME "${BACKBONE}" \
    TRAINER.LINEAR_PROBE.LOSS_TYPE ${LOSS_TYPE} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB} \
    DATALOADER.TRAIN_X.SAMPLER ${SAMPLER}

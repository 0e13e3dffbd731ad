#!/bin/bash
# Shared imbalanced base-to-new protocol body.  Parity target: the
# reference's base2new_fewshot_{train,test}.sh family (e.g.
# PromptSRC/scripts/promptsrc/base2new_fewshot_train.sh): train on ALL
# classes with an imbalanced per-class shot list (NUM_SHOTS<0 sentinel +
# DATASET.PER_CLASS_SHOTS), then evaluate the same checkpoint on the base
# or new class half.  Unlike the reference, the shot list is an argument
# instead of an edit-the-script constant.
# Callers set MODE (train|test), TRAINER, CFGDIR, CFG, LOADEP (+ optional
# TAG, EXTRA_OPTS, SHOTS, SUB) and source this with
#   <dataset> <seed> <per_class_shots> [data_root]
# where <per_class_shots> looks like "[16,16,16,1,1,1]" (one entry per
# class of the full dataset, head classes first).
DATASET=$1
SEED=$2
PCS=${3:?per-class shot list, e.g. "[16,16,1,1]"}
DATA=${4:-${DATA:-~/data}}
SHOTS=${SHOTS:--2}

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}${TAG}/seed${SEED}
TRAIN_DIR=${OUT_ROOT:-output}/base2new/train_all/${COMMON_DIR}

if [ "${MODE}" = "train" ]; then
    SUBC=all
    DIR=${TRAIN_DIR}
    FLAGS=()
else
    SUBC=${SUB:-new}
    DIR=${OUT_ROOT:-output}/base2new/test_${SUBC}/${COMMON_DIR}
    FLAGS=(--model-dir "${TRAIN_DIR}" --load-epoch "${LOADEP}" --eval-only)
fi

python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer "${TRAINER}" \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${CFGDIR}/${CFG}.yaml \
    --output-dir "${DIR}" \
    "${FLAGS[@]}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PCS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUBC} ${EXTRA_OPTS}

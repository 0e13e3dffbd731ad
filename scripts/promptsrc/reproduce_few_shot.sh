#!/bin/bash
# Reproduce PromptSRC all-classes few-shot numbers from the published torch
# checkpoints (reference scripts/promptsrc/reproduce_few_shot.sh;
# WEIGHTSPATH layout <weightspath>/<K>shot/seed<S>/VLPromptLearner/
# model.pth.tar-<LOADEP>).
# usage: bash scripts/promptsrc/reproduce_few_shot.sh <dataset> <shots> <seed> <weightspath> [data_root]
cd "$(dirname "$0")/../.."

DATA=${5:-${DATA:-~/data}}
TRAINER=PromptSRC
DATASET=$1
SHOTS=$2
SEED=$3
WEIGHTSPATH=$4

CFG=${CFG:-vit_b16_c2_ep50_batch4_4+4ctx_few_shot}
LOADEP=${LOADEP:-50}

TORCH_CKPT=${WEIGHTSPATH}/${SHOTS}shot/seed${SEED}/VLPromptLearner/model.pth.tar-${LOADEP}
MODEL_DIR=${OUT_ROOT:-output}/few_shot/imported/${DATASET}/shots_${SHOTS}/${CFG}/seed${SEED}
DIR=${OUT_ROOT:-output}/few_shot/test/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}

python tools/import_torch_prompts.py "${TORCH_CKPT}" \
    --trainer ${TRAINER} --output-dir "${MODEL_DIR}" || exit 1

python train.py \
    --root "${DATA}" \
    --seed "${SEED}" \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir "${DIR}" \
    --model-dir "${MODEL_DIR}" \
    --load-epoch ${LOADEP} \
    --eval-only \
    DATASET.NUM_SHOTS ${SHOTS} \
    ${FSVLM_EXTRA_OPTS}

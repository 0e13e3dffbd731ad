#!/bin/bash
# Reproduce the PromptSRC base-to-novel numbers from the reference's
# PUBLISHED torch checkpoints: import the prompt weights, then evaluate on
# the base and novel halves exactly like the reference's
# reproduce_base2novel_setting.sh (same WEIGHTSPATH layout:
# <weightspath>/base/seed<S>/VLPromptLearner/model.pth.tar-<LOADEP>).
# Requires the OpenAI CLIP weights file on disk for the frozen towers
# (FSVLM_CLIP_WEIGHTS / ~/.cache/clip — see docs/MODELS.md).
# usage: bash scripts/promptsrc/reproduce_base2novel_setting.sh <dataset> <seed> <weightspath> [data_root]
cd "$(dirname "$0")/../.."

DATA=${4:-${DATA:-~/data}}
TRAINER=PromptSRC
DATASET=$1
SEED=$2
WEIGHTSPATH=$3

CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
SHOTS=16
LOADEP=${LOADEP:-20}

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
TORCH_CKPT=${WEIGHTSPATH}/base/seed${SEED}/VLPromptLearner/model.pth.tar-${LOADEP}
MODEL_DIR=${OUT_ROOT:-output}/base2new/imported/${COMMON_DIR}

python tools/import_torch_prompts.py "${TORCH_CKPT}" \
    --trainer ${TRAINER} --output-dir "${MODEL_DIR}" || exit 1

for SUB in base new; do
    DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
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
        DATASET.SUBSAMPLE_CLASSES ${SUB} \
        ${FSVLM_EXTRA_OPTS} || exit 1
done

#!/bin/bash
# Reproduce MaPLe cross-dataset/DG numbers from the published
# ImageNet-trained torch checkpoints (reference
# scripts/maple/reproduce_maple_xd.sh; WEIGHTSPATH layout
# <weightspath>/seed<S>/MultiModalPromptLearner/model.pth.tar-<LOADEP>).
# usage: bash scripts/maple/reproduce_maple_xd.sh <target_dataset> <seed> <weightspath> [data_root]
cd "$(dirname "$0")/../.."

DATA=${4:-${DATA:-~/data}}
TRAINER=MaPLe
DATASET=$1
SEED=$2
WEIGHTSPATH=$3

CFG=${CFG:-vit_b16_c2_ep5_batch4_2ctx_cross_datasets}
SHOTS=16
LOADEP=${LOADEP:-2}

TORCH_CKPT=${WEIGHTSPATH}/seed${SEED}/MultiModalPromptLearner/model.pth.tar-${LOADEP}
MODEL_DIR=${OUT_ROOT:-output}/xd/imported/${TRAINER}/${CFG}/seed${SEED}
DIR=${OUT_ROOT:-output}/evaluation/${TRAINER}/${CFG}_${SHOTS}shots/${DATASET}/seed${SEED}

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
